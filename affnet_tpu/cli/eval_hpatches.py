"""HPatches full-benchmark CLI: verification / matching / retrieval.

Beyond-parity harness (the reference ships only the HPatchesDM dataset
class, dataset.py:96-192): runs the three standard HPatches descriptor
tasks over a local ``hpatches-release`` tree.  Data-optional — this
environment has no network, so when the tree is absent the tool prints a
skip message and exits 0 (run_me.sh can always invoke it).

Usage:
    python -m affnet_tpu.cli.eval_hpatches --root datasets/hpatches-release \
        --descriptor TFeat [--weights my_hardnet.npz] [--max-seqs 20]

Prints one JSON object with per-task metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="datasets/hpatches-release")
    p.add_argument("--descriptor", default="TFeat",
                   choices=["TFeat", "HardNet", "SIFT", "pixels"])
    p.add_argument("--weights", default=None,
                   help=".npz params (e.g. a from-scratch-trained HardNet)")
    p.add_argument("--max-seqs", type=int, default=None)
    p.add_argument("--tasks", default="verification,matching,retrieval")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..hpatches import run_benchmark
    try:
        out = run_benchmark(args.root, descriptor=args.descriptor,
                            weights=args.weights, max_seqs=args.max_seqs,
                            tasks=tuple(args.tasks.split(",")))
    except FileNotFoundError as e:
        print(json.dumps({"skipped": True,
                          "reason": f"no HPatches data at {e}"}))
        return 0
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
