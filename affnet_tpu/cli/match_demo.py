"""Two-image wide-baseline matching demo: detect -> describe -> SNN match ->
visualize correspondences.

Reference: examples/hesaffnet/'WBS demo.ipynb' (detect, describe, SNN-0.8
brute-force match, visualization) — as a CLI producing a side-by-side match
image.

Usage: python -m affnet_tpu.cli.match_demo img1.png img2.png out.png
"""

from __future__ import annotations

import argparse

import numpy as np

from .hesaffnet import load_gray


def draw_matches(img1, img2, pts1, pts2, out_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h1, w1 = img1.shape
    h2, w2 = img2.shape
    canvas = np.zeros((max(h1, h2), w1 + w2), np.float32)
    canvas[:h1, :w1] = img1
    canvas[:h2, w1:] = img2
    plt.figure(figsize=(14, 7))
    plt.imshow(canvas, cmap="gray")
    for (x1, y1), (x2, y2) in zip(pts1, pts2):
        plt.plot([x1, x2 + w1], [y1, y2], "-", linewidth=0.5)
    plt.plot(pts1[:, 0], pts1[:, 1], "r.", markersize=2)
    plt.plot(pts2[:, 0] + w1, pts2[:, 1], "r.", markersize=2)
    plt.axis("off")
    plt.savefig(out_path, bbox_inches="tight", dpi=150)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("image1")
    parser.add_argument("image2")
    parser.add_argument("output_image")
    parser.add_argument("--nfeats", type=int, default=2000)
    parser.add_argument("--snn", type=float, default=0.8)
    parser.add_argument("--do-ori", action="store_true")
    parser.add_argument("--descriptor", default="SIFT",
                        choices=["SIFT", "HardNet"])
    parser.add_argument("--desc-weights", default=None)
    args = parser.parse_args(argv)

    import jax
    from ..detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
    from ..match import snn_match_host
    from ..models import AffNetFast, HardNet, OriNetFast32, SIFTNet
    from ..models.convert import load_params_npz, load_pretrained

    params = {"aff": load_pretrained("AffNetFast")}
    if args.descriptor == "SIFT":
        desc_net = SIFTNet(patch_size=32)
    else:
        desc_net = HardNet
        params["desc"] = (load_params_npz(args.desc_weights)
                          if args.desc_weights
                          else HardNet.init(jax.random.PRNGKey(0)))
    ori_net = None
    if args.do_ori:
        ori_net = OriNetFast32
        params["ori"] = load_pretrained("OriNetFast")

    cfg = DetectorConfig(num_features=args.nfeats, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         ori_net=ori_net, desc_net=desc_net)
    img1 = load_gray(args.image1)
    img2 = load_gray(args.image2)
    out1 = det(img1, params=params, do_ori=args.do_ori, describe=True)
    out2 = det(img2, params=params, do_ori=args.do_ori, describe=True)
    t1, t2 = snn_match_host(out1["descs"], out2["descs"], args.snn)
    print(f"{len(t1)} tentative matches")
    pts1 = out1["lafs"][t1][:, :, 2]
    pts2 = out2["lafs"][t2][:, :, 2]
    draw_matches(img1, img2, pts1, pts2, args.output_image)
    print(f"match visualization -> {args.output_image}")


if __name__ == "__main__":
    main()
