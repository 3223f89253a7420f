#!/usr/bin/env python
"""Average two or more training checkpoints into a "model soup" checkpoint.

Uniform parameter averaging of same-architecture checkpoints (Wortsman et
al., "Model soups") — nearby checkpoints on one training trajectory (or two
runs from one init) often average to a better point than either endpoint.
Used in round 5 to combine the short-horizon and long-horizon AffNet runs.

Pure numpy on purpose: no jax import, safe to run while a TPU job holds the
chip.  Usage:
    python scripts/average_ckpts.py out.npz ck_a.npz ck_b.npz [ck_c.npz ...]
"""

import sys

import numpy as np


def main(argv):
    if len(argv) < 3:
        raise SystemExit(__doc__)
    out, srcs = argv[1], argv[2:]
    datas = [dict(np.load(p)) for p in srcs]
    keys = set(datas[0])
    for p, d in zip(srcs[1:], datas[1:]):
        if set(d) != keys:
            raise SystemExit(f"key mismatch between {srcs[0]} and {p}")
    avg = {}
    for k in keys:
        if k == "__epoch__":
            avg[k] = datas[0][k]
            continue
        stack = np.stack([d[k].astype(np.float64) for d in datas])
        avg[k] = stack.mean(0).astype(datas[0][k].dtype)
    np.savez(out, **avg)
    print(f"averaged {len(srcs)} checkpoints -> {out} ({len(keys)} arrays)")


if __name__ == "__main__":
    main(sys.argv)
