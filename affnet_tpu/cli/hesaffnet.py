"""HesAffNet: image -> affine regions (Oxford .ells file) with AffNetFast.

Reference CLI: examples/hesaffnet/hesaffnet.py:27-60.  Same defaults:
mrSize 5.192, border 5, 1 AffNet shape iteration, th=-1 (threshold mode —
every NMS survivor is emitted; the nfeats argument selects top-k mode
instead when --topk is passed).

Usage: python -m affnet_tpu.cli.hesaffnet img.png out.txt [nfeats] [--topk]

Bulk mode (TPU addition): pass several comma-separated same-size images plus
--mesh N to shard them over an N-device mesh — one detector program per
image, data-parallel over chips:
       python -m affnet_tpu.cli.hesaffnet a.png,b.png,c.png out.txt --mesh 4
writes out_0.txt, out_1.txt, out_2.txt.
"""

from __future__ import annotations

import argparse

import numpy as np


def load_gray(fname: str) -> np.ndarray:
    """RGB mean-channel grayscale, like the reference (:35-36)."""
    from PIL import Image
    img = Image.open(fname).convert("RGB")
    return np.mean(np.asarray(img), axis=2).astype(np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_image")
    parser.add_argument("output_fname")
    parser.add_argument("nfeats", type=int, nargs="?", default=2000)
    parser.add_argument("--topk", action="store_true",
                        help="top-k mode (th=None) instead of the reference "
                             "CLI's th=-1 keep-all mode")
    parser.add_argument("--th", type=float, default=-1.0)
    parser.add_argument("--max-keypoints", type=int, default=16384,
                        help="static cap on survivors in threshold mode; a "
                             "warning is printed (with the true detected "
                             "count) if it binds and output is truncated to "
                             "the strongest keypoints")
    parser.add_argument("--do-ori", action="store_true")
    parser.add_argument("--fast", action="store_true",
                        help="bf16 gather/CNN fast mode (f32 detection; "
                             "quality-neutral on graf, see README)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="bulk mode: shard comma-separated input images "
                             "over an N-device mesh")
    args = parser.parse_args(argv)

    from ..detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
    from ..laf import lafs_to_ells_host
    from ..models import AffNetFast, OriNetFast32
    from ..models.convert import load_pretrained
    from ..io_formats import write_ells

    cfg = DetectorConfig(
        num_features=args.nfeats, border=5, mr_size=5.192, num_baum_iters=1,
        th=None if args.topk else args.th, max_keypoints=args.max_keypoints,
        fast=args.fast)
    params = {"aff": load_pretrained("AffNetFast")}
    ori_net = None
    if args.do_ori:
        ori_net = OriNetFast32
        params["ori"] = load_pretrained("OriNetFast")
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         ori_net=ori_net)

    paths = args.input_image.split(",")
    if args.mesh and len(paths) > 1:
        import os
        import jax.numpy as jnp
        from ..parallel import make_mesh, make_sharded_image_pipeline
        loaded = [load_gray(p) for p in paths]
        shapes = {im.shape for im in loaded}
        if len(shapes) > 1:
            raise SystemExit(
                "--mesh bulk mode shards one XLA program over same-shape "
                f"images, but the inputs have {len(shapes)} distinct sizes "
                f"{sorted(shapes)}; resize them to a common size or run "
                "per-shape groups")
        imgs = np.stack(loaded)
        mesh = make_mesh(args.mesh)
        n = mesh.devices.size
        pad = (-len(imgs)) % n
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        fn = make_sharded_image_pipeline(det, imgs.shape[1], imgs.shape[2],
                                         mesh, do_ori=args.do_ori,
                                         describe=False)
        out = fn(params, jnp.asarray(imgs))
        base, ext = os.path.splitext(args.output_fname)
        for i in range(len(paths)):
            valid = np.asarray(out["valid"][i])
            ells = np.asarray(lafs_to_ells_host(
                np.asarray(out["lafs"][i])[valid]))
            fname = f"{base}_{i}{ext}"
            write_ells(fname, ells)
            print(f"{len(ells)} affine regions -> {fname}")
        return

    img = load_gray(paths[0])
    out = det(img, params=params, do_ori=args.do_ori)
    ells = np.asarray(lafs_to_ells_host(out["lafs"]))
    write_ells(args.output_fname, ells)
    print(f"{len(ells)} affine regions -> {args.output_fname}")


if __name__ == "__main__":
    main()
