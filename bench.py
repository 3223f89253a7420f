#!/usr/bin/env python
"""Benchmark: full HesAffNet+descriptor pipeline throughput on one TPU chip.

Headline metric (BASELINE.md): keypoints/sec at 2000 regions per 1080p image
through detect (top-k 2000) -> 1x AffNet shape iteration -> descriptor-patch
extraction (PS=32) -> HardTFeat 128-D descriptor, end-to-end on device, with
REAL shipped weights for both nets (no random-weight stand-ins).

Throughput is measured PIPELINED OVER TWELVE DISTINCT 1080p images (graf
img1..img6 + the reference's example images: fox1/fox2/cat/kpi1/kpi2 +
imgs/graf16HesAff): all dispatches are issued before the device->host
fetches, as a
production extractor overlaps host round trips (~27 ms each through the axon
tunnel) with device compute — and no image's work can be cached or elided
because every input differs.  The JSON also reports the single-image
blocking wall-clock (dispatch + device + fetch) as ``latency_ms`` and the
in-jit device-only time per image as ``device_ms`` (a 20-iteration
fori_loop, amortizing the tunnel round trip).

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
    # identical.  Quality-validated on graf (see README).
    cfg = DetectorConfig(num_features=NFEATS, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32, fast=True)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardTFeatNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": load_pretrained("HardTFeatNet")}
    fn, _plan = det.get_jitted(H, W, do_ori=False, describe=True)

    # NB: through the axon tunnel block_until_ready can return before remote
    # execution finishes; a device->host fetch is the only honest fence.
    for _ in range(WARMUP):
        out = fn(params, imgs[0])
        jax.device_get((out["descs"], out["lafs"]))

    n_disp = ROUNDS * len(imgs)
    t0 = time.perf_counter()
    outs = [fn(params, imgs[i % len(imgs)]) for i in range(n_disp)]
    # Start all device->host copies before consuming any: sequential
    # device_get calls each pay the full ~27 ms tunnel round trip, which
    # dominated the pipelined number once device compute dropped under
    # 12 ms/image (a production extractor overlaps the fetches too).
    for o in outs:
        o["descs"].copy_to_host_async()
        o["lafs"].copy_to_host_async()
    fetched = [(np.asarray(o["descs"]), np.asarray(o["lafs"]))
               for o in outs]
    t_per_dispatch = (time.perf_counter() - t0) / n_disp

    # Batched variant: all twelve distinct images in ONE dispatch (lax.map of
    # the same pipeline), so the ~27 ms tunnel round trips amortize over the
    # batch — the per-dispatch path is RPC-bound, not device-bound (device
    # compute is ~12-21 ms/image vs ~55 ms/image wall).  This is the
    # production bulk-extraction shape: k images in, k LAF+desc sets out.
    stack = jnp.stack(imgs)

    @jax.jit
    def fn_batch(p, xs):
        return jax.lax.map(lambda x: fn(p, x), xs)

    ob = fn_batch(params, stack)
    jax.device_get((ob["descs"], ob["lafs"]))
    t0 = time.perf_counter()
    obs = [fn_batch(params, stack) for _ in range(ROUNDS)]
    for o in obs:
        o["descs"].copy_to_host_async()
        o["lafs"].copy_to_host_async()
    fetched_b = [(np.asarray(o["descs"]), np.asarray(o["lafs"]))
                 for o in obs]
    t_batched = (time.perf_counter() - t0) / n_disp
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
            return acc + o["descs"].sum() + o["lafs"].sum()
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
