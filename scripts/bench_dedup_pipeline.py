"""In-pipeline A/B of the shared-window DMA dedup (VERDICT r4 weak #1).

Runs the bench.py pipeline (12 distinct 1080p images, 2000 feats, fast
mode) with ops.patches.DEDUP_WINDOWS set by --dedup {0,1} and reports the
in-jit device time per image (20-iteration fori_loop) plus the pipelined
wall clock.  With --dedup 1 the spatial sort is active in the detector
(detector._sort_spatial) and EVERY Pallas sampler site — including the
single-buffered 448x512 desc bucket (ADVICE r4: never compile-tested with
dedup) — takes the dedup chain-select path, so a clean compile+run here
also closes the VMEM-fit question.

Run both arms:
  python scripts/bench_dedup_pipeline.py --dedup 0
  python scripts/bench_dedup_pipeline.py --dedup 1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REF = "/root/reference"
NFEATS = 2000
H, W = 1080, 1920


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dedup", type=int, required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    import affnet_tpu  # noqa: F401
    from affnet_tpu.ops import patches as patches_mod
    patches_mod.DEDUP_WINDOWS = bool(args.dedup)

    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained

    paths = [f"{REF}/test-graf/img{i}.png" for i in range(1, 7)]
    paths += [f"{REF}/examples/hesaffnet/img/{n}.png"
              for n in ("fox1", "fox2", "cat", "kpi1", "kpi2")]
    paths += [f"{REF}/imgs/graf16HesAff.jpg"]
    imgs = []
    for p in paths:
        im = Image.open(p).convert("RGB").resize((W, H), Image.BILINEAR)
        imgs.append(jnp.asarray(
            np.mean(np.asarray(im), axis=2).astype(np.float32)))
    cfg = DetectorConfig(num_features=NFEATS, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32, fast=True,
                         desc_dtype="float16")
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardTFeatNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": load_pretrained("HardTFeatNet")}
    fn, _plan = det.get_jitted(H, W, do_ori=False, describe=True)

    # Correctness probe: LAF set must be unchanged by the sort+restore.
    out = fn(params, imgs[0])
    lafs0 = np.asarray(out["lafs"])
    print(f"dedup={args.dedup}: lafs[0,:,2]={lafs0[0, :, 2]}, "
          f"n={len(lafs0)}", flush=True)

    @jax.jit
    def loop20(p, x):
        def it(i, acc):
            o = fn(p, x + 1e-6 * i)
            return (acc + o["descs"].astype(jnp.float32).sum()
                    + o["lafs"].sum())
        return jax.lax.fori_loop(0, 20, it, 0.0)

    np.asarray(loop20(params, imgs[0]))
    td = []
    for _ in range(3):
        t2 = time.perf_counter()
        np.asarray(loop20(params, imgs[0]))
        td.append(time.perf_counter() - t2)
    device_ms = min(td) / 20 * 1000

    n_disp = 3 * len(imgs)
    outs = [fn(params, imgs[i % len(imgs)]) for i in range(n_disp)]
    for o in outs:
        o["descs"].copy_to_host_async(); o["lafs"].copy_to_host_async()
    _ = [(np.asarray(o["descs"]), np.asarray(o["lafs"])) for o in outs]
    t0 = time.perf_counter()
    outs = [fn(params, imgs[i % len(imgs)]) for i in range(n_disp)]
    for o in outs:
        o["descs"].copy_to_host_async(); o["lafs"].copy_to_host_async()
    _ = [(np.asarray(o["descs"]), np.asarray(o["lafs"])) for o in outs]
    wall_ms = (time.perf_counter() - t0) / n_disp * 1000

    print(f"DEDUP={args.dedup}: device {device_ms:.2f} ms/img, "
          f"pipelined {wall_ms:.1f} ms/img -> {NFEATS/wall_ms*1000:.0f} kps",
          flush=True)


if __name__ == "__main__":
    main()
