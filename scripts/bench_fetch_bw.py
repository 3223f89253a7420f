"""Honest tunnel fetch-bandwidth measurement + fp16-descriptor A/B.

bench_batched_probe.py's constant-array probe was invalid (XLA keeps
constants host-side; 0 ms fetches).  Here the arrays are computed from a
host-uploaded random input so the fetch must move real device bytes.

Then A/B the full 12-image lax.map pipeline with f32 vs f16 descriptor
outputs: if extraction is fetch-bound at ~35 MB/s, halving the descriptor
payload should cut ~15 ms/img of wall time.

Run: python scripts/bench_fetch_bw.py
"""

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
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import affnet_tpu  # noqa: F401
    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained

    # --- fetch bandwidth with computed (device-resident) arrays ---
    seed = jnp.asarray(np.random.rand(1024).astype(np.float32))

    for mb in (0.25, 1, 4, 16):
        n = int(mb * 1024 * 1024 / 4)

        @jax.jit
        def make(s, n=n):
            return jnp.tile(s, n // 1024) * 1.000001

        a = make(seed)
        np.asarray(a)
        best = 1e9
        for _ in range(3):
            a = make(seed * np.float32(np.random.rand() + 0.5))
            np.asarray(a.ravel()[:1])   # fence compute, then time pure fetch
            t0 = time.perf_counter()
            np.asarray(a)
            best = min(best, time.perf_counter() - t0)
        print(f"fetch {mb:5.2f} MB: {best*1000:7.1f} ms "
              f"({mb/best:.1f} MB/s)", flush=True)

    # --- pipeline A/B: f32 vs f16 descriptor fetch ---
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
                         num_baum_iters=1, th=None, patch_size=32, fast=True)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast,
                                         desc_net=HardTFeatNet)
    params = {"aff": load_pretrained("AffNetFast"),
              "desc": load_pretrained("HardTFeatNet")}
    fn, _plan = det.get_jitted(H, W, do_ori=False, describe=True)
    stack = jnp.stack(imgs)

    def run_loop(map_fn, rounds=3):
        ob = map_fn(params, stack)
        np.asarray(ob["descs"]); np.asarray(ob["lafs"])
        t0 = time.perf_counter()
        obs = [map_fn(params, stack) for _ in range(rounds)]
        for o in obs:
            o["descs"].copy_to_host_async()
            o["lafs"].copy_to_host_async()
        f = [(np.asarray(o["descs"]), np.asarray(o["lafs"])) for o in obs]
        dt = (time.perf_counter() - t0) / (rounds * 12)
        return dt, f

    @jax.jit
    def map_f32(p, xs):
        o = jax.lax.map(lambda x: fn(p, x), xs)
        return {"descs": o["descs"], "lafs": o["lafs"]}

    @jax.jit
    def map_f16(p, xs):
        o = jax.lax.map(lambda x: fn(p, x), xs)
        return {"descs": o["descs"].astype(jnp.float16), "lafs": o["lafs"]}

    for name, m in (("f32", map_f32), ("f16", map_f16)):
        dts = []
        for _ in range(3):
            dt, f = run_loop(m)
            dts.append(dt)
        dt = min(dts)
        print(f"lax.map12 descs={name}: {dt*1000:6.1f} ms/img -> "
              f"{NFEATS/dt:7.0f} kps", flush=True)
        if name == "f16":
            d16 = f[0][0].astype(np.float32)

    # descriptor quantization error of the f16 fetch
    o32 = map_f32(params, stack)
    d32 = np.asarray(o32["descs"])
    err = np.abs(d32 - d16).max()
    print(f"max |desc_f32 - desc_f16| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
