"""Attribute the bulk one-dispatch throughput anomaly (VERDICT r4 weak #2):
bench.py's lax.map 12-image variant ran at 33k kps vs 66k pipelined, while
device compute is ~11.1 ms/image (expected ~150k kps).

Probes, each isolating one candidate cost:
  1. tunnel fetch bandwidth (device->host np.asarray of 1..64 MB)
  2. device time of the lax.map program itself (sum-only output, one fetch)
  3. device time of the same body in a fori_loop (bench.py's device_ms)
  4. lax.map with full outputs, fetch timed separately from dispatch
  5. dispatch-issue cost of fn_batch with donated/resident inputs

Run on the real chip:  python scripts/bench_batched_probe.py
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


def t_ms(f, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import affnet_tpu  # noqa: F401
    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained

    # --- probe 1: raw fetch bandwidth through the tunnel ---
    for mb in (1, 4, 16, 64):
        n = mb * 1024 * 1024 // 4
        a = jnp.ones((n,), jnp.float32) + 0.0
        np.asarray(a)  # warm
        dt = t_ms(lambda: np.asarray(a))
        print(f"fetch {mb:3d} MB: {dt:7.1f} ms  ({mb / dt * 1000:.1f} MB/s)",
              flush=True)

    # --- build the pipeline exactly as bench.py does ---
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

    # --- probe 3: fori_loop device time (bench.py device_ms) ---
    @jax.jit
    def loop12(p, x):
        def it(i, acc):
            o = fn(p, x + 1e-6 * i)
            return acc + o["descs"].sum() + o["lafs"].sum()
        return jax.lax.fori_loop(0, 12, it, 0.0)

    np.asarray(loop12(params, imgs[0]))
    dt = t_ms(lambda: np.asarray(loop12(params, imgs[0])))
    print(f"fori_loop x12 (same img), sum-only: {dt:7.1f} ms "
          f"= {dt/12:.1f} ms/img", flush=True)

    # --- probe 2: lax.map device time, sum-only output ---
    @jax.jit
    def map_sum(p, xs):
        o = jax.lax.map(lambda x: fn(p, x), xs)
        return o["descs"].sum() + o["lafs"].sum()

    np.asarray(map_sum(params, stack))
    dt = t_ms(lambda: np.asarray(map_sum(params, stack)))
    print(f"lax.map x12 (distinct), sum-only:   {dt:7.1f} ms "
          f"= {dt/12:.1f} ms/img", flush=True)

    # --- probe 4: lax.map full outputs; dispatch vs fetch split ---
    @jax.jit
    def map_full(p, xs):
        return jax.lax.map(lambda x: fn(p, x), xs)

    ob = map_full(params, stack)
    np.asarray(ob["descs"]); np.asarray(ob["lafs"])
    desc_mb = ob["descs"].size * ob["descs"].dtype.itemsize / 1e6
    print(f"batched outputs: descs {desc_mb:.1f} MB "
          f"{ob['descs'].dtype}", flush=True)

    t0 = time.perf_counter()
    ob = map_full(params, stack)
    # sum fetch: a scalar fence on a separate tiny program would need its
    # own dispatch; fetch one element of lafs as the cheapest honest fence
    _ = np.asarray(ob["lafs"].ravel()[0])
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = np.asarray(ob["descs"]); l = np.asarray(ob["lafs"])
    t_fetch = time.perf_counter() - t0
    print(f"map_full: dispatch+fence {t_disp*1000:.1f} ms, "
          f"bulk fetch {t_fetch*1000:.1f} ms", flush=True)

    # --- probe 5: three back-to-back full map dispatches, async fetches
    # (exactly bench.py's timed loop) ---
    t0 = time.perf_counter()
    obs = [map_full(params, stack) for _ in range(3)]
    for o in obs:
        o["descs"].copy_to_host_async()
        o["lafs"].copy_to_host_async()
    fetched = [(np.asarray(o["descs"]), np.asarray(o["lafs"])) for o in obs]
    dt = (time.perf_counter() - t0) * 1000
    print(f"bench.py batched loop (3x12): {dt:.1f} ms total = "
          f"{dt/36:.1f} ms/img -> {NFEATS/(dt/36/1000):.0f} kps", flush=True)


if __name__ == "__main__":
    main()
