"""Externally-detected keypoints -> AffNet shapes + OriNet orientations +
descriptors (the kornia-notebook workflow,
examples/SIFT-AffNet-HardNet-kornia-matching.ipynb cells 0-10).

Keypoint file: one ``x y size [angle_deg]`` row per keypoint (any detector:
OpenCV SIFT/DoG, ORB, your own).  Outputs a 7-column LAF file
``x y a11 a12 a21 a22 resp`` (resp = 0 placeholder) or .npy, plus optional
descriptors (.npy).

Usage:
  python -m affnet_tpu.cli.describe_keypoints img.png kpts.txt out_lafs.txt \
      [--descs out_descs.npy] [--descriptor SIFT|TFeat] [--mr-size 6.0] \
      [--no-shape] [--no-ori]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image")
    p.add_argument("keypoints", help="text file: x y size [angle] per row")
    p.add_argument("output", help=".txt (x y A flat) or .npy LAF output")
    p.add_argument("--descs", default=None, help=".npy descriptor output")
    p.add_argument("--descriptor", default="TFeat",
                   choices=["SIFT", "TFeat", "none"])
    p.add_argument("--mr-size", type=float, default=6.0)
    p.add_argument("--no-shape", action="store_true")
    p.add_argument("--no-ori", action="store_true")
    args = p.parse_args(argv)

    from .hesaffnet import load_gray
    from ..keypoints import describe_keypoints
    from ..models import AffNetFast, HardTFeatNet, OriNetFast32
    from ..models.convert import load_pretrained
    from ..models import SIFTNet

    img = load_gray(args.image)
    kp = np.loadtxt(args.keypoints, ndmin=2).astype(np.float32)
    x, y, size = kp[:, 0], kp[:, 1], kp[:, 2]
    angle = kp[:, 3] if kp.shape[1] > 3 else None

    params = {}
    shape_net = ori_net = desc_net = None
    if not args.no_shape:
        shape_net = AffNetFast
        params["aff"] = load_pretrained("AffNetFast")
    if not args.no_ori:
        ori_net = OriNetFast32
        params["ori"] = load_pretrained("OriNetFast")
    if args.descriptor == "TFeat":
        desc_net = HardTFeatNet
        params["desc"] = load_pretrained("HardTFeatNet")
    elif args.descriptor == "SIFT":
        desc_net = SIFTNet(patch_size=32)

    out = describe_keypoints(img, x, y, size, angle, params,
                             mr_size=args.mr_size, shape_net=shape_net,
                             ori_net=ori_net, desc_net=desc_net)
    lafs = out["lafs"]
    if args.output.endswith(".npy"):
        np.save(args.output, lafs)
    else:
        flat = np.concatenate([
            lafs[:, 0, 2:3], lafs[:, 1, 2:3],
            lafs[:, 0, 0:1], lafs[:, 0, 1:2],
            lafs[:, 1, 0:1], lafs[:, 1, 1:2],
            np.zeros((len(lafs), 1), np.float32)], axis=1)
        np.savetxt(args.output, flat, fmt="%10.5f")
    if args.descs and "descs" in out:
        np.save(args.descs, out["descs"])
    print(f"{len(lafs)} keypoints -> {args.output}"
          + (f" + {args.descs}" if args.descs else ""))


if __name__ == "__main__":
    main()
