"""A/B the shared-window DMA dedup (pallas_patches dedup_windows) on TPU.

The sampler's measured floor is per-patch DMA issue (~0.95 us at the shape
site).  Real detections cluster: a corner fires at several adjacent scales,
so consecutive (origin-sorted) patches often share the same quantized
(QR=8, QC=128) window origin and one DMA can serve the run.  This benches
the site configs (scripts/bench_sampler_sweep.py shapes) over keypoint sets
with a controlled cluster fraction, in three orderings:

  scatter  — uniform positions (worst case: dup rate ~0)
  cluster  — clustered positions, response-like (random) order
  sorted   — clustered positions, origin-sorted (what a spatial sort of the
             candidate set would feed the kernel)

Run: python scripts/bench_dedup.py [--site shape|ori|desc_b1] [--cluster 0.6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

import affnet_tpu  # noqa: F401
from affnet_tpu.ops.pallas_patches import (QC, QR,
                                           extract_patches_window_matmul)
from affnet_tpu.utils import fence

ITERS = 20

SITES = {
    "shape": dict(n=3000, ps=32, ext=(3.0, 17.0),
                  window_rows=64, window_cols=256, patches_per_step=16),
    "ori": dict(n=2000, ps=32, ext=(8.0, 43.0),
                window_rows=96, window_cols=256, patches_per_step=16),
    "desc_b1": dict(n=1104, ps=32, ext=(8.0, 43.0),
                    window_rows=96, window_cols=256, patches_per_step=16),
    # The single-buffered big-window desc tail (ops/patches.py DESC_BUCKETS
    # [-1]) — ADVICE r4: the dedup chain-select keeps an extra (RW, CW)
    # temporary live per unrolled q step, so this VMEM-tight config needs
    # its own compile proof before enabling dedup site-wide (the full
    # in-pipeline A/B in bench_dedup_pipeline.py also covers it).
    "desc_big": dict(n=200, ps=32, ext=(60.0, 200.0),
                     window_rows=448, window_cols=512, patches_per_step=8,
                     n_buffers=1, chunk_samples=256),
}

H, W = 1080, 1920


def make_inputs(site, cluster_frac, order, seed=0):
    rng = np.random.RandomState(seed)
    buf = rng.rand(H, W).astype(np.float32)
    n = site["n"]
    elo, ehi = site["ext"]
    eu = rng.uniform(elo, ehi, n).astype(np.float32)
    ev = rng.uniform(elo, ehi, n).astype(np.float32)
    m = float(min(H, W))
    nc = int(n * cluster_frac) if order != "scatter" else 0
    # Clustered keypoints: ~n/4 corner sites, 3-6 detections each within a
    # couple of pixels (multi-scale stack), like the measured graf corner
    # multiplicity.
    xs = np.empty(n, np.float64)
    ys = np.empty(n, np.float64)
    if nc:
        n_sites = max(1, nc // 4)
        cx = rng.uniform(0.05, 0.95, n_sites)
        cy = rng.uniform(0.05, 0.95, n_sites)
        pick = rng.randint(0, n_sites, nc)
        xs[:nc] = cx[pick] + rng.randn(nc) * 2.0 / W
        ys[:nc] = cy[pick] + rng.randn(nc) * 2.0 / H
    xs[nc:] = rng.uniform(0.05, 0.95, n - nc)
    ys[nc:] = rng.uniform(0.05, 0.95, n - nc)
    perm = rng.permutation(n)
    xs, ys, eu, ev = xs[perm], ys[perm], eu[perm], ev[perm]

    lafs = np.zeros((n, 2, 3), np.float32)
    lafs[:, 0, 0] = eu / m
    lafs[:, 1, 1] = ev / m
    lafs[:, 0, 1] = 0.15 * ev / m * rng.randn(n)
    lafs[:, 1, 0] = 0.15 * eu / m * rng.randn(n)
    lafs[:, 0, 2] = np.clip(xs, 0.02, 0.98)
    lafs[:, 1, 2] = np.clip(ys, 0.02, 0.98)

    # Quantized window origins (mirror of the wrapper math, align=False:
    # u0 = w*tx - 0.5, u_lo = u0 - eu_abs).
    eua = (np.abs(m * lafs[:, 0, 0]) + np.abs(m * lafs[:, 0, 1]))
    eva = (np.abs(m * lafs[:, 1, 0]) + np.abs(m * lafs[:, 1, 1]))
    c0 = (np.floor(W * lafs[:, 0, 2] - 0.5 - eua).astype(np.int64) // QC) * QC
    r0 = (np.floor(H * lafs[:, 1, 2] - 0.5 - eva).astype(np.int64) // QR) * QR
    if order == "sorted":
        o = np.lexsort((c0, r0))
        lafs, r0, c0 = lafs[o], r0[o], c0[o]
    p = site["patches_per_step"]
    same = (r0[1:] == r0[:-1]) & (c0[1:] == c0[:-1])
    same[np.nonzero(np.arange(1, n) % p == 0)] = False
    dup_rate = float(same.mean())

    lvl = np.zeros((n,), np.int32)
    offs = np.array([0], np.int32)
    hs = np.array([H], np.int32)
    ws = np.array([W], np.int32)
    return (jnp.asarray(buf), jnp.asarray(lafs), jnp.asarray(lvl),
            jnp.asarray(offs), jnp.asarray(hs), jnp.asarray(ws), dup_rate)


def bench(site_name, site, order, cluster_frac, dedup):
    buf, lafs, lvl, offs, hs, ws, dup_rate = make_inputs(
        site, cluster_frac, order)
    kw = dict(ps=site["ps"], align_corners=False,
              window_rows=site["window_rows"],
              window_cols=site["window_cols"],
              patches_per_step=site["patches_per_step"],
              mxu_dtype=jnp.bfloat16, fallback_slots=64,
              return_miss_overflow=True, dedup_windows=dedup)
    for opt in ("n_buffers", "chunk_samples"):
        if opt in site:
            kw[opt] = site[opt]

    def run(b):
        p, ovf = extract_patches_window_matmul(b, lafs, lvl, offs, hs, ws,
                                               **kw)
        return p.sum(), ovf

    @jax.jit
    def loop(b):
        def body(i, acc):
            s, _ = run(b * (1.0 + 1e-12 * i.astype(jnp.float32)))
            return acc + s
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    _, ovf = run(buf)
    fence(loop(buf))
    t0 = time.time()
    fence(loop(buf))
    ms = (time.time() - t0) * 1e3 / ITERS
    print(json.dumps({"site": site_name, "order": order, "dedup": dedup,
                      "dup_rate": round(dup_rate, 3), "ms": round(ms, 3),
                      "us_per_patch": round(ms * 1e3 / site["n"], 3),
                      "overflow": int(ovf)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default="shape")
    ap.add_argument("--cluster", type=float, default=0.6)
    args = ap.parse_args()
    site = SITES[args.site]
    for order in ("scatter", "cluster", "sorted"):
        for dedup in (False, True):
            try:
                bench(args.site, site, order, args.cluster, dedup)
            except Exception as e:  # keep sweeping past a bad config
                print(json.dumps({"site": args.site, "order": order,
                                  "dedup": dedup,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
