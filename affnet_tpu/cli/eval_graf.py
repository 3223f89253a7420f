"""Two-view matching evaluation on the Oxford graffiti fixture.

Replicates the reference's per-epoch test(): detect -> describe -> SNN-0.8
match -> GT check under the homography (center distance <= 6 px) -> print
tentatives / true matches / inlier ratio
(train_AffNet_test_on_graffity.py:262-339).

The reference uses HardNet++ weights which are not shipped in this mount;
default descriptor here is the weight-free differentiable SIFT (a supported
reference descriptor option) — pass --descriptor HardNet --desc-weights X.npz
to use a trained HardNet.

Usage: python -m affnet_tpu.cli.eval_graf [--img2-idx 6] [--nfeats 3000]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DEFAULT_GRAF = "/root/reference/test-graf"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--graf-dir", default=DEFAULT_GRAF)
    parser.add_argument("--img2-idx", type=int, default=6)
    parser.add_argument("--all", action="store_true",
                        help="evaluate every pair 1-2 .. 1-6 and summarize")
    parser.add_argument("--nfeats", type=int, default=3000)
    parser.add_argument("--fast", action="store_true",
                        help="bf16 gather/CNN fast mode (f32 detection; "
                             "quality-neutral on graf, see README)")
    parser.add_argument("--descriptor", default="SIFT",
                        choices=["SIFT", "HardNet", "TFeat", "pixels"])
    parser.add_argument("--desc-weights", default=None)
    parser.add_argument("--shape", default="AffNetFast",
                        choices=["AffNetFast", "Baumberg", "none"])
    parser.add_argument("--shape-arch", default=None,
                        help="any AffNet variant from the registry (with "
                             "--shape-weights; overrides --shape)")
    parser.add_argument("--shape-weights", default=None,
                        help=".npz weights for the shape net (e.g. a "
                             "training checkpoint)")
    parser.add_argument("--do-ori", action="store_true")
    parser.add_argument("--ori-weights", default=None,
                        help="npz checkpoint for OriNetFast32 (default: the "
                             "shipped OriNet.pth conversion); used by the "
                             "OriNet trainer's per-epoch eval")
    parser.add_argument("--snn", type=float, default=0.8)
    parser.add_argument("--dist-th", type=float, default=6.0)
    parser.add_argument("--save-vis", default=None,
                        help="directory for LAF visualization PNGs")
    args = parser.parse_args(argv)

    if args.all:
        import sys
        base = [a for a in (argv if argv is not None else sys.argv[1:])
                if a != "--all" and not a.startswith("--img2-idx")]
        rows = []
        for i in range(2, 7):
            rows.append((i, *main(base + ["--img2-idx", str(i)])))
        print("\npair  tentatives  true  inl.ratio")
        for i, t, m, r in rows:
            print(f"1-{i}   {t:9d}  {m:4d}  {r:.4f}")
        return rows

    from ..detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
    from ..match import snn_match_host
    from ..models import (AffNetFast, AffineShapeEstimator, HardNet,
                          OriNetFast32, SIFTNet)
    from ..models.cnn import l2norm
    from ..models.convert import load_params_npz, load_pretrained
    from ..reproj import get_gt_correspondence_indexes
    from .hesaffnet import load_gray

    img1 = load_gray(os.path.join(args.graf_dir, "img1.png"))
    img2 = load_gray(os.path.join(args.graf_dir, f"img{args.img2_idx}.png"))
    H = np.loadtxt(os.path.join(args.graf_dir,
                                f"H1to{args.img2_idx}p")).astype(np.float32)

    params = {}
    if args.descriptor == "HardNet" and not args.desc_weights:
        # HardNet++.pth is absent from the reference mount; never silently
        # run random weights — use the shipped HardTFeat weights instead.
        print("note: no --desc-weights for HardNet (HardNet++.pth is not in "
              "the mount); using shipped HardTFeat weights instead")
        args.descriptor = "TFeat"
    if args.descriptor == "SIFT":
        desc_net = SIFTNet(patch_size=32)
    elif args.descriptor == "HardNet":
        desc_net = HardNet
        params["desc"] = load_params_npz(args.desc_weights)
    elif args.descriptor == "TFeat":
        from ..models import HardTFeatNet
        desc_net = HardTFeatNet
        params["desc"] = (load_params_npz(args.desc_weights)
                          if args.desc_weights
                          else load_pretrained("HardTFeatNet"))
    else:
        class PixDesc:
            def __call__(self, p, patches, **_):
                flat = patches.reshape(patches.shape[0], -1)
                return l2norm(flat - flat.mean(axis=1, keepdims=True))
        desc_net = PixDesc()

    shape_net, baum_iters = None, 0
    if args.shape_arch is not None:
        from ..models import REGISTRY
        shape_net = REGISTRY[args.shape_arch]
        params["aff"] = (load_params_npz(args.shape_weights)
                         if args.shape_weights
                         else load_pretrained(args.shape_arch))
        baum_iters = 1
    elif args.shape == "AffNetFast":
        shape_net = AffNetFast
        params["aff"] = (load_params_npz(args.shape_weights)
                         if args.shape_weights
                         else load_pretrained("AffNetFast"))
        baum_iters = 1
    elif args.shape == "Baumberg":
        shape_net = AffineShapeEstimator(19)
        baum_iters = 16

    ori_net = None
    if args.do_ori:
        ori_net = OriNetFast32
        if args.ori_weights:
            from ..models.convert import load_params_npz
            params["ori"] = load_params_npz(args.ori_weights)
        else:
            params["ori"] = load_pretrained("OriNetFast")

    cfg = DetectorConfig(num_features=args.nfeats, border=5, mr_size=5.192,
                         num_baum_iters=baum_iters, th=None, patch_size=32,
                         fast=args.fast)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=shape_net,
                                         ori_net=ori_net, desc_net=desc_net)

    out1 = det(img1, params=params, do_ori=args.do_ori, describe=True)
    out2 = det(img2, params=params, do_ori=args.do_ori, describe=True)

    t1, t2 = snn_match_host(out1["descs"], out2["descs"], args.snn)
    lafs1_t = out1["lafs"][t1]
    lafs2_t = out2["lafs"][t2]
    if len(t1) == 0:
        print("0 tentatives 0 true matches 0.0 inl.ratio")
        return 0, 0, 0.0
    md, in1, in2 = get_gt_correspondence_indexes(
        lafs1_t, lafs2_t, H, dist_threshold=args.dist_th)
    inl_ratio = float(len(in1)) / float(len(t1))
    print(f"Test on graf1-{args.img2_idx}, {len(t1)} tentatives "
          f"{len(in1)} true matches {inl_ratio:.4f} inl.ratio")
    if args.save_vis:
        from ..laf import visualize_lafs
        os.makedirs(args.save_vis, exist_ok=True)
        visualize_lafs(img1, lafs1_t[in1.astype(int)],
                       "g", save_to=os.path.join(args.save_vis, "inliers1.png"))
        visualize_lafs(img2, lafs2_t[in1.astype(int)],
                       "g", save_to=os.path.join(args.save_vis, "inliers2.png"))
    return len(t1), len(in1), inl_ratio


if __name__ == "__main__":
    main()
