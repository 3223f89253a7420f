#!/usr/bin/env python
"""Benchmark: full HesAffNet+descriptor pipeline throughput on one TPU chip.

Headline metric (BASELINE.md): keypoints/sec at 2000 regions per 1080p image
through detect (top-k 2000) -> 1x AffNet shape iteration -> descriptor-patch
extraction (PS=32) -> HardTFeat 128-D descriptor, end-to-end on device, with
REAL shipped weights for both nets (no random-weight stand-ins).

The headline is the production BULK-extraction shape: TWELVE DISTINCT 1080p
images (graf img1..6 + fox1/fox2/cat/kpi1/kpi2 + graf16HesAff — every input
differs, nothing can be cached) in ONE dispatch (lax.map of the pipeline),
repeated for three rounds with all device->host copies issued async.
Descriptors travel as f16: the axon tunnel fetches at ~53 MB/s with ~27 ms
latency, so extraction is FETCH-bound on f32 descriptors; f16 halves the
payload at a measured max descriptor error of 6.1e-5 vs f32 — 16x under the
1e-3 reference-parity gate (scripts/bench_fetch_bw.py; LAFs stay f32).

Also reported: per-dispatch pipelined throughput (one image per dispatch,
fetches overlapped), the single-image blocking wall-clock (``latency_ms``),
and the in-jit device-only time per image (``device_ms``, a 20-iteration
fori_loop amortizing the tunnel round trip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is the speedup over the CPU-PyTorch reference pipeline measured
on this machine (scripts in git history): median 16.89 s per image for the
identical configuration (AffNet.pth weights, HardNet descriptor, test-graf
img1 resized to 1920x1080, torch 2.13 CPU) => 118.4 keypoints/sec.
"""

import json
import time

import numpy as np

REF_CPU_SECONDS_PER_IMAGE = 16.89
NFEATS = 2000
H, W = 1080, 1920
WARMUP = 2
ROUNDS = 3          # full passes over the distinct-image set


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained

    paths = [f"/root/reference/test-graf/img{i}.png" for i in range(1, 7)]
    paths += [f"/root/reference/examples/hesaffnet/img/{n}.png"
              for n in ("fox1", "fox2", "cat", "kpi1", "kpi2")]
    paths += ["/root/reference/imgs/graf16HesAff.jpg"]
    imgs = []
    for p in paths:
        im = Image.open(p).convert("RGB").resize((W, H), Image.BILINEAR)
        imgs.append(jnp.asarray(
            np.mean(np.asarray(im), axis=2).astype(np.float32)))

    # fast=True: bf16 patch-gather matmuls + bf16 CNN conv inputs with f32
    # accumulation; detection/selection stay f32 so the keypoint set is
    # identical.  desc_dtype=float16 is transport-only (see module doc).
    cfg = DetectorConfig(num_features=NFEATS, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32, fast=True,
                         desc_dtype="float16")
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardTFeatNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": load_pretrained("HardTFeatNet")}
    fn, _plan = det.get_jitted(H, W, do_ori=False, describe=True)
    stack = jnp.stack(imgs)
    n_disp = ROUNDS * len(imgs)

    # --- headline: bulk extraction, 12 distinct images per dispatch ---
    @jax.jit
    def fn_batch(p, xs):
        o = jax.lax.map(lambda x: fn(p, x), xs)
        # Select the bulk-extraction outputs; the unused patch tensor is
        # dead-code-eliminated out of the map body.
        return {"descs": o["descs"], "lafs": o["lafs"]}

    # NB: through the axon tunnel block_until_ready can return before remote
    # execution finishes; a device->host fetch is the only honest fence.
    ob = fn_batch(params, stack)
    np.asarray(ob["descs"]); np.asarray(ob["lafs"])
    t_batched = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        obs = [fn_batch(params, stack) for _ in range(ROUNDS)]
        for o in obs:
            o["descs"].copy_to_host_async()
            o["lafs"].copy_to_host_async()
        fetched_b = [(np.asarray(o["descs"]), np.asarray(o["lafs"]))
                     for o in obs]
        t_batched = min(t_batched, (time.perf_counter() - t0) / n_disp)

    # --- per-dispatch pipelined path (one image per dispatch) ---
    for _ in range(WARMUP):
        out = fn(params, imgs[0])
        jax.device_get((out["descs"], out["lafs"]))
    t0 = time.perf_counter()
    outs = [fn(params, imgs[i % len(imgs)]) for i in range(n_disp)]
    for o in outs:
        o["descs"].copy_to_host_async()
        o["lafs"].copy_to_host_async()
    fetched = [(np.asarray(o["descs"]), np.asarray(o["lafs"]))
               for o in outs]
    t_per_dispatch = (time.perf_counter() - t0) / n_disp

    t = min(t_per_dispatch, t_batched)

    lat = []
    for i in range(5):
        t1 = time.perf_counter()
        out = fn(params, imgs[i % len(imgs)])
        jax.device_get((out["descs"], out["lafs"]))
        lat.append(time.perf_counter() - t1)
    latency = float(np.median(lat))

    # Device-only per-image time: 20 pipeline iterations inside one jit
    # (varying the input each iteration so nothing is hoisted).
    @jax.jit
    def loop20(p, x):
        def it(i, acc):
            o = fn(p, x + 1e-6 * i)   # nested jit inlines into the loop
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

    kps_per_sec = NFEATS / t
    baseline_kps = NFEATS / REF_CPU_SECONDS_PER_IMAGE
    result = {
        "metric": "hesaffnet_hardnet_keypoints_per_sec_1080p",
        "value": round(kps_per_sec, 1),
        "unit": "keypoints/sec",
        "vs_baseline": round(kps_per_sec / baseline_kps, 2),
        "latency_ms": round(latency * 1000, 1),
        "device_ms": round(device_ms, 1),
        "per_dispatch_kps": round(NFEATS / t_per_dispatch, 1),
        "batched_kps": round(NFEATS / t_batched, 1),
        "distinct_images": len(imgs),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
