"""Classical Hessian-Affine baseline: handcrafted Baumberg iteration (16x).

Reference CLI: examples/hesaffnet/hesaffBaum.py:25-50 (top-k mode, th=None).

Usage: python -m affnet_tpu.cli.hesaffbaum img.png out.txt 2000
"""

from __future__ import annotations

import argparse

import numpy as np

from .hesaffnet import load_gray


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_image")
    parser.add_argument("output_fname")
    parser.add_argument("nfeats", type=int, nargs="?", default=2000)
    parser.add_argument("--iters", type=int, default=16)
    args = parser.parse_args(argv)

    from ..detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
    from ..laf import lafs_to_ells
    from ..models import AffineShapeEstimator
    from ..io_formats import write_ells

    img = load_gray(args.input_image)
    cfg = DetectorConfig(num_features=args.nfeats, border=5, mr_size=5.192,
                         num_baum_iters=args.iters, th=None)
    det = ScaleSpaceAffinePatchExtractor(
        cfg, shape_net=AffineShapeEstimator(patch_size=19))
    out = det(img)
    ells = np.asarray(lafs_to_ells(out["lafs"]))
    write_ells(args.output_fname, ells)
    print(f"{len(ells)} affine regions -> {args.output_fname}")


if __name__ == "__main__":
    main()
