#!/usr/bin/env python
"""Microbench: Pallas gather-as-matmul patch sampler vs the XLA flat-gather
path, on a synthetic 1080p-scale pyramid buffer (real TPU)."""

import time

import numpy as np


def main():
    import jax.numpy as jnp

    from affnet_tpu.ops.patches import extract_patches_from_flat_pyramid
    from affnet_tpu.ops import pallas_patches as pp

    rng = np.random.RandomState(0)
    buf = jnp.asarray(rng.uniform(0, 255, (10800, 1920)).astype(np.float32))
    offs = jnp.asarray(np.array([0, 1080, 2160], np.int32))
    hs = jnp.asarray(np.array([1080, 1080, 1080], np.int32))
    ws = jnp.asarray(np.array([1920, 1920, 1920], np.int32))
    n = 2000
    ang = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(ang), np.sin(ang)
    A = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], 1) \
        * rng.uniform(0.01, 0.05, n)[:, None, None]
    t = rng.uniform(0.1, 0.9, (n, 2, 1))
    lafs = jnp.asarray(np.concatenate([A, t], 2).astype(np.float32))
    lvl = jnp.asarray(rng.randint(0, 3, n).astype(np.int32))

    t0 = time.time()
    r = np.asarray(extract_patches_from_flat_pyramid(
        buf, lafs, lvl, offs, hs, ws, ps=32))
    print("xla compile+run1", round(time.time() - t0, 3))
    for _ in range(2):
        t0 = time.time()
        r = np.asarray(extract_patches_from_flat_pyramid(
            buf, lafs, lvl, offs, hs, ws, ps=32))
        print("xla run", round(time.time() - t0, 4))

    def pal():
        return pp.extract_patches_window_matmul(
            buf, lafs, lvl, offs, hs, ws, ps=32, window_rows=256,
            window_cols=384, patches_per_step=8, fallback_slots=192)

    t0 = time.time()
    g = np.asarray(pal())
    print("pallas desc-cfg compile+run1", round(time.time() - t0, 3))
    for _ in range(3):
        t0 = time.time()
        g = np.asarray(pal())
        print("pallas desc-cfg run", round(time.time() - t0, 4))
    print("maxdiff", float(np.abs(r - g).max()),
          "rel", float((np.abs(r - g) / (np.abs(r) + 1)).max()))

    def pal19():
        return pp.extract_patches_window_matmul(
            buf, lafs, lvl, offs, hs, ws, ps=19, window_rows=96,
            window_cols=256, patches_per_step=8, fallback_slots=32)

    t0 = time.time()
    np.asarray(pal19())
    print("pallas shape-cfg compile+run1", round(time.time() - t0, 3))
    t0 = time.time()
    np.asarray(pal19())
    print("pallas shape-cfg run", round(time.time() - t0, 4))


if __name__ == "__main__":
    main()
