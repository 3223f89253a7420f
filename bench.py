#!/usr/bin/env python
"""Benchmark: full HesAffNet+descriptor pipeline throughput on one TPU chip.

Headline metric (BASELINE.md): keypoints/sec at 2000 regions per 1080p image
through detect (top-k 2000) -> 1x AffNet shape iteration -> descriptor-patch
extraction (PS=32) -> HardTFeat 128-D descriptor, end-to-end on device, with
REAL shipped weights for both nets (no random-weight stand-ins).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over the CPU-PyTorch reference pipeline measured
on this machine (scripts in git history): median 16.89 s per image for the
identical configuration (AffNet.pth weights, HardNet, test-graf img1 resized
to 1920x1080, torch 2.13 CPU) => 118.4 keypoints/sec.
"""

import json
import time

import numpy as np

REF_CPU_SECONDS_PER_IMAGE = 16.89
NFEATS = 2000
H, W = 1080, 1920
WARMUP = 2
RUNS = 5


def main():
    import jax.numpy as jnp
    from PIL import Image

    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained

    img = Image.open("/root/reference/test-graf/img1.png").convert("RGB")
    img = img.resize((W, H), Image.BILINEAR)
    img = np.mean(np.asarray(img), axis=2).astype(np.float32)

    # fast=True: bf16 patch-gather matmuls + bf16 CNN conv inputs with f32
    # accumulation; detection/selection stay f32 so the keypoint set is
    # identical.  Quality-validated on graf1-3 (AffNet+OriNet+SIFT, 2000
    # feats): 828 tentatives / 624 true / 0.7536 inl.ratio vs 829/625/0.7539
    # in full f32 — within one match.
    cfg = DetectorConfig(num_features=NFEATS, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32, fast=True)
    # Real shipped weights end-to-end: AffNet.pth shape net + HardTFeat.pth
    # descriptor (the reference's HardNet++.pth is absent from the mount;
    # HardTFeatNet is its shipped 128-D descriptor with committed weights).
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardTFeatNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": load_pretrained("HardTFeatNet")}
    fn, _plan = det.get_jitted(H, W, do_ori=False, describe=True)
    x = jnp.asarray(img)

    # NB: through the axon tunnel block_until_ready can return before remote
    # execution finishes; a device->host fetch is the only honest fence, so
    # every image's descriptors + LAFs are read back (that readback is part
    # of a real pipeline anyway).  Throughput is measured PIPELINED: all
    # runs are dispatched before the fetches, as a production extractor
    # would overlap host round trips (~27 ms each through this tunnel) with
    # device compute.  The per-image wall-clock for a single blocking
    # detect+fetch is reported alongside in 'latency_ms'.
    import jax

    for _ in range(WARMUP):
        out = fn(params, x)
        jax.device_get((out["descs"], out["lafs"]))

    t0 = time.perf_counter()
    outs = [fn(params, x) for _ in range(RUNS)]
    fetched = [jax.device_get((o["descs"], o["lafs"])) for o in outs]
    t = (time.perf_counter() - t0) / RUNS

    lat = []
    for i in range(RUNS):
        t1 = time.perf_counter()
        out = fn(params, x)
        jax.device_get((out["descs"], out["lafs"]))
        lat.append(time.perf_counter() - t1)
    latency = float(np.median(lat))
    kps_per_sec = NFEATS / t
    baseline_kps = NFEATS / REF_CPU_SECONDS_PER_IMAGE
    result = {
        "metric": "hesaffnet_hardnet_keypoints_per_sec_1080p",
        "value": round(kps_per_sec, 1),
        "unit": "keypoints/sec",
        "vs_baseline": round(kps_per_sec / baseline_kps, 2),
        "latency_ms": round(latency * 1000, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
