"""Direct LAF-shape optimization demo (paper Fig. 2-3).

Mirrors examples/direct_shape_optimization/optimization_script.py:119-348:
detect LAFs on an image pair, pick GT-corresponding pairs under a known
homography, then optimize the 2x2 shape parts with Adam against a descriptor
loss, writing the loss/shape-difference histories (npz) and an animation of
the converging ellipses (mp4 when ffmpeg is available, else gif).

Two ways to get the second LAF set (the reference driver uses `shear`):
  --mode shear        LAFs2 = LAFs1 with a21 := 0.3 * a11 (the reference's
                      synthetic corruption, optimization_script.py:331-333)
  --mode detect-both  detect independently in both images, keep GT pairs

Usage:
  python -m affnet_tpu.cli.optimize_shapes \
      [img1 img2 H] [--descriptor TFeat] [--loss HardNegC] \
      [--steps 100] [--lr 2.0] [--out runs/shape_opt]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DEFAULT_GRAF = "/root/reference/test-graf"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("img1", nargs="?",
                        default=os.path.join(DEFAULT_GRAF, "img1.png"))
    parser.add_argument("img2", nargs="?", default=None,
                        help="default: img1 for --mode shear (the reference "
                             "driver runs on HPatches illumination pairs, "
                             "H ~ identity), graf img2 for detect-both")
    parser.add_argument("H", nargs="?", default=None,
                        help="homography file; default: identity for "
                             "--mode shear, H1to2p for detect-both")
    parser.add_argument("--mode", default="shear",
                        choices=["shear", "detect-both"])
    parser.add_argument("--nfeats", type=int, default=200,
                        help="detected features (reference: 200)")
    parser.add_argument("--descriptor", default="SIFT",
                        choices=["SIFT", "TFeat", "HardNet", "pixels"])
    parser.add_argument("--desc-weights", default=None,
                        help=".npz weights for HardNet (the reference's "
                             "HardNet++.pth is absent from the mount)")
    parser.add_argument("--loss", default="HardNegC",
                        choices=["HardNegC", "HardNet", "PosDist"])
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--lr", type=float, default=2.0,
                        help="Adam lr (reference: 2.0)")
    parser.add_argument("--dist-th", type=float, default=1.0,
                        help="GT center-distance gate (reference: 1)")
    parser.add_argument("--out", default="runs/shape_opt",
                        help="output prefix: <out>.npz, <out>.mp4|gif")
    parser.add_argument("--fps", type=int, default=24)
    args = parser.parse_args(argv)

    from ..detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
    from ..losses import (descriptor_dist, loss_hardnegc, loss_hardnet)
    from ..models.cnn import l2norm
    from ..models.convert import load_params_npz, load_pretrained
    from ..reproj import get_gt_correspondence_indexes
    from ..shape_opt import LAFShapeOptimizer, render_history, save_history
    from .hesaffnet import load_gray

    if args.img2 is None:
        args.img2 = (args.img1 if args.mode == "shear"
                     else os.path.join(DEFAULT_GRAF, "img2.png"))
    img1 = load_gray(args.img1)
    img2 = load_gray(args.img2)
    if args.H is not None:
        H = np.loadtxt(args.H).astype(np.float32)
    elif args.mode == "shear":
        H = np.eye(3, dtype=np.float32)
    else:
        H = np.loadtxt(os.path.join(DEFAULT_GRAF, "H1to2p")).astype(
            np.float32)

    # Detector config of the reference driver (optimization_script.py:291-
    # 292): mrSize 5.12, 200 features, border 32, no shape iteration.
    cfg = DetectorConfig(num_features=args.nfeats, border=32, mr_size=5.12,
                         num_baum_iters=0, th=None)
    det = ScaleSpaceAffinePatchExtractor(cfg)
    lafs1 = det(img1)["lafs"]
    if args.mode == "shear":
        lafs2 = lafs1.copy()
        lafs2[:, 1, 0] = 0.3 * lafs2[:, 0, 0]
    else:
        lafs2 = det(img2)["lafs"]
    _, idx2rows, idx1 = get_gt_correspondence_indexes(
        lafs1, lafs2, H, dist_threshold=args.dist_th)
    lafs1_m, lafs2_m = lafs1[idx1], lafs2[idx2rows]
    print(f"{len(lafs1)} detections -> {len(lafs1_m)} GT pairs "
          f"(dist <= {args.dist_th})")
    if len(lafs1_m) < 2:
        raise SystemExit("not enough GT pairs to optimize; raise --dist-th "
                         "or use --mode shear")

    if args.descriptor == "SIFT":
        from ..models.sift import sift_describe
        descriptor = lambda p: sift_describe(p, 32)            # noqa: E731
    elif args.descriptor == "TFeat":
        from ..models import HardTFeatNet
        w = (load_params_npz(args.desc_weights) if args.desc_weights
             else load_pretrained("HardTFeatNet"))
        descriptor = lambda p: HardTFeatNet(w, p)              # noqa: E731
    elif args.descriptor == "HardNet":
        from ..models import HardNet
        if not args.desc_weights:
            raise SystemExit("--descriptor HardNet needs --desc-weights "
                             "(HardNet++.pth is not in the mount)")
        w = load_params_npz(args.desc_weights)
        descriptor = lambda p: HardNet(w, p)                   # noqa: E731
    else:  # 'Pixels' (optimization_script.py:273): mean-centered L2-norm
        def descriptor(p):
            flat = p.reshape(p.shape[0], -1)
            return l2norm(flat - flat.mean(axis=1, keepdims=True))

    loss_fn = {"HardNegC": loss_hardnegc, "HardNet": loss_hardnet,
               "PosDist": descriptor_dist}[args.loss]

    opt = LAFShapeOptimizer(descriptor=descriptor, loss_fn=loss_fn,
                            lr=args.lr)
    hist = opt.optimize(lafs1_m, lafs2_m, img1, img2, n_iters=args.steps)
    print(f"loss {hist['loss'][0]:.4f} -> {hist['loss'][-1]:.4f}, "
          f"shape diff {hist['shape_diff'][0]:.4f} -> "
          f"{hist['shape_diff'][-1]:.4f} over {args.steps} steps")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_history(hist, args.out + ".npz")
    anim = render_history(hist, img1, args.out + ".mp4", fps=args.fps)
    print(f"history -> {args.out}.npz, animation -> {anim}")
    return hist


if __name__ == "__main__":
    main()
