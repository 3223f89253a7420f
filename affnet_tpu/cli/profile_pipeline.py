"""Per-stage pipeline profiling on device.

Replaces the reference's ad-hoc time.time() prints
(SparseImgRepresenter.py:163-164,196,201; extract_geom_and_desc_upisup.py:
37-45) with fenced stage timings (pyramid, detection, full pipeline) and an
optional jax.profiler trace.

Usage: python -m affnet_tpu.cli.profile_pipeline [img.png] [--nfeats 2000]
       [--trace /tmp/xprof]
"""

from __future__ import annotations

import argparse

import numpy as np

from .hesaffnet import load_gray


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_image", nargs="?",
                        default="/root/reference/test-graf/img1.png")
    parser.add_argument("--nfeats", type=int, default=2000)
    parser.add_argument("--resize", type=str, default=None,
                        help="WxH, e.g. 1920x1080")
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--trace", default=None,
                        help="directory for a jax.profiler trace")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
    from ..models import AffNetFast, HardNet
    from ..models.convert import load_pretrained
    from ..ops.scalespace import build_flat_pyramid, make_plan
    from ..utils import StageTimer, fence, profiler_trace

    img = load_gray(args.input_image)
    if args.resize:
        from PIL import Image
        w, h = map(int, args.resize.split("x"))
        img = np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32)
    h, w = img.shape
    x = jnp.asarray(img)

    cfg = DetectorConfig(num_features=args.nfeats, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": HardNet.init(jax.random.PRNGKey(0))}
    plan = make_plan(h, w, cfg.n_levels, cfg.init_sigma, cfg.border)

    pyr_fn = jax.jit(lambda im: build_flat_pyramid(im, plan)[1].sum())
    det_fn = jax.jit(lambda im: det._multiscale_detect(im, plan)["resp"].sum())
    full_fn, _ = det.get_jitted(h, w, do_ori=False, describe=True)

    # Warmup (compilation).
    fence(pyr_fn(x))
    fence(det_fn(x))
    fence(full_fn(params, x))

    timer = StageTimer()
    for _ in range(args.runs):
        with timer.stage("pyramid"):
            fence(pyr_fn(x))
        with timer.stage("pyramid+detect+topk"):
            fence(det_fn(x))
        with timer.stage("full (detect+shape+patches+HardNet)"):
            out = full_fn(params, x)
            np.asarray(out["descs"])
    print(f"image {w}x{h}, {args.nfeats} features, {args.runs} runs:")
    print(timer.report())

    if args.trace:
        with profiler_trace(args.trace):
            out = full_fn(params, x)
            np.asarray(out["descs"])
        print(f"profiler trace -> {args.trace}")


if __name__ == "__main__":
    main()
