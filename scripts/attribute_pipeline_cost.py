#!/usr/bin/env python
"""Attribute post-detection pipeline cost: time each stage in isolation with
an in-jit fori_loop (10 iters) so the axon dispatch overhead amortizes.
Inputs are perturbed per iteration to defeat CSE/hoisting."""

import time

import numpy as np


def timed(name, fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out)          # honest fence
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000/10:.2f} ms/iter  ({dt*1000:.1f} ms incl "
          "dispatch for 10 iters)")


def main():
    import jax
    import jax.numpy as jnp

    from affnet_tpu.models import AffNetFast, HardTFeatNet
    from affnet_tpu.models.convert import load_pretrained
    from affnet_tpu.ops import pallas_patches as pp
    from affnet_tpu.ops.patches import (PALLAS_SITES,
                                        extract_patches_from_flat_pyramid)

    rng = np.random.RandomState(0)
    buf = jnp.asarray(rng.uniform(0, 255, (10800, 1920)).astype(np.float32))
    offs = jnp.asarray(np.array([0, 1080, 2160], np.int32))
    hs = jnp.asarray(np.array([1080, 1080, 1080], np.int32))
    ws = jnp.asarray(np.array([1920, 1920, 1920], np.int32))

    def mk_lafs(n, smax):
        ang = rng.uniform(0, 2 * np.pi, n)
        c, s = np.cos(ang), np.sin(ang)
        A = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], 1) \
            * rng.uniform(0.005, smax, n)[:, None, None]
        t = rng.uniform(0.1, 0.9, (n, 2, 1))
        return jnp.asarray(np.concatenate([A, t], 2).astype(np.float32))

    lafs2k = mk_lafs(2000, 0.05)
    lafs3k = mk_lafs(3000, 0.02)
    lvl2k = jnp.asarray(rng.randint(0, 3, 2000).astype(np.int32))
    lvl3k = jnp.asarray(rng.randint(0, 3, 3000).astype(np.int32))

    def loop10(body):
        @jax.jit
        def f(lafs):
            def it(i, acc):
                out = body(lafs * (1.0 + 1e-7 * i))
                return acc + out.sum()
            return jax.lax.fori_loop(0, 10, it, 0.0)
        return f

    # Stage: desc-site pallas gather (2000 x 32x32)
    timed("pallas desc gather x10", loop10(
        lambda l: pp.extract_patches_window_matmul(
            buf, l, lvl2k, offs, hs, ws, ps=32, **PALLAS_SITES["desc"])),
        lafs2k)
    # without fallback
    cfgnf = dict(PALLAS_SITES["desc"]); cfgnf["fallback_slots"] = 0
    timed("pallas desc gather nofallback x10", loop10(
        lambda l: pp.extract_patches_window_matmul(
            buf, l, lvl2k, offs, hs, ws, ps=32, **cfgnf)), lafs2k)
    # Stage: shape-site pallas gather (3000 x 19x19)
    timed("pallas shape gather x10", loop10(
        lambda l: pp.extract_patches_window_matmul(
            buf, l, lvl3k, offs, hs, ws, ps=19, **PALLAS_SITES["shape"])),
        lafs3k)
    # Stage: XLA gather for reference (2000 x 32x32)
    timed("xla desc gather x10", loop10(
        lambda l: extract_patches_from_flat_pyramid(
            buf, l, lvl2k, offs, hs, ws, ps=32)), lafs2k)

    # Stage: AffNet CNN on 3000 19x19 patches
    aff = load_pretrained("AffNetFast")
    pat19 = jnp.asarray(rng.rand(3000, 19, 19).astype(np.float32))

    @jax.jit
    def aff10(p):
        def it(i, acc):
            return acc + AffNetFast(aff, p * (1 + 1e-7 * i)).sum()
        return jax.lax.fori_loop(0, 10, it, 0.0)
    timed("AffNet CNN 3000x19x19 x10", aff10, pat19)

    # Stage: HardTFeat on 2000 32x32 patches
    desc = load_pretrained("HardTFeatNet")
    pat32 = jnp.asarray(rng.rand(2000, 32, 32).astype(np.float32))

    @jax.jit
    def d10(p):
        def it(i, acc):
            return acc + HardTFeatNet(desc, p * (1 + 1e-7 * i)).sum()
        return jax.lax.fori_loop(0, 10, it, 0.0)
    timed("HardTFeat 2000x32x32 x10", d10, pat32)


if __name__ == "__main__":
    main()
