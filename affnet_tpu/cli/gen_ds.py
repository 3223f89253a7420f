"""Download + cache the 6 Brown/PhotoTour datasets.

Reference: gen_ds.py:28-86 + run_me.sh:2-8 (mkdir dataset/6Brown, download
the six subsets, cache as tensors).  Our caches are .npz (patches uint8 +
labels), consumed by data.TotalDatasetsLoader.

Usage: python -m affnet_tpu.cli.gen_ds [--root dataset/6Brown]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", default="dataset/6Brown")
    parser.add_argument("--subsets", nargs="*", default=[
        "liberty", "notredame", "yosemite",
        "liberty_harris", "notredame_harris", "yosemite_harris"])
    args = parser.parse_args(argv)

    from ..data import cache_phototour
    os.makedirs(args.root, exist_ok=True)
    for name in args.subsets:
        try:
            path = cache_phototour(args.root, name, download=True)
            print(f"{name}: cached at {path}")
        except Exception as e:  # zero-egress environments
            print(f"{name}: FAILED ({e}); place the extracted dataset at "
                  f"{os.path.join(args.root, name)} and re-run")


if __name__ == "__main__":
    main()
