"""Sweep the Pallas patch-sampler config knobs on the real TPU.

The r4 trace attribution (scripts/trace_pipeline.py) shows the sampler is
now 61% of device time: shape site 6.9 ms (3000 patches, 2.3 us/patch),
desc buckets 2.5/2.1/1.3 ms.  This sweeps the wrapper knobs at the REAL
pipeline shapes (1080p pyramid buffer, pipeline-like LAF extent
distributions) to locate the per-patch cost floor before kernel surgery:

  patches_per_step   8 -> 16 -> 32 (per-step overhead amortization)
  n_buffers          2 (double-buffered DMA) vs 1
  fold_masks         window-masking on/off
  chunk_samples      1024 (one chunk) vs 512
  window_cols        site default vs +-128

Run: python scripts/bench_sampler_sweep.py [--site shape|desc_b1|desc_b3]
"""

import argparse
import itertools
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
from affnet_tpu.ops.pallas_patches import extract_patches_window_matmul
from affnet_tpu.utils import fence

ITERS = 20

# (site label, n patches, ps, half-extent range px, base window config)
SITES = {
    "shape": dict(n=3000, ps=32, ext=(3.0, 17.0),
                  window_rows=48, window_cols=256, patches_per_step=8),
    "ori": dict(n=2000, ps=32, ext=(8.0, 43.0),
                window_rows=96, window_cols=256, patches_per_step=8),
    "desc_b1": dict(n=1104, ps=32, ext=(8.0, 43.0),
                    window_rows=96, window_cols=256, patches_per_step=8),
    "desc_b2": dict(n=696, ps=32, ext=(44.0, 110.0),
                    window_rows=224, window_cols=384, patches_per_step=8),
    "desc_b3": dict(n=200, ps=32, ext=(110.0, 200.0),
                    window_rows=448, window_cols=512, patches_per_step=8,
                    n_buffers=1),
}


def make_inputs(site, seed=0):
    """1080p-ish flat level buffer + LAFs with site-like extents, uniformly
    scattered (worst case for window sharing; the real distribution clusters
    on corners)."""
    rng = np.random.RandomState(seed)
    h, w = 1080, 1920
    buf = rng.rand(h, w).astype(np.float32)
    n = site["n"]
    elo, ehi = site["ext"]
    # extent eu ~ m*|A| * gmax with gmax~1: draw target half-extents then
    # build diagonal A with a small off-diagonal tilt.
    eu = rng.uniform(elo, ehi, n).astype(np.float32)
    ev = rng.uniform(elo, ehi, n).astype(np.float32)
    m = float(min(h, w))
    lafs = np.zeros((n, 2, 3), np.float32)
    lafs[:, 0, 0] = eu / m
    lafs[:, 1, 1] = ev / m
    lafs[:, 0, 1] = 0.15 * ev / m * rng.randn(n)
    lafs[:, 1, 0] = 0.15 * eu / m * rng.randn(n)
    lafs[:, 0, 2] = rng.uniform(0.05, 0.95, n)   # x/w
    lafs[:, 1, 2] = rng.uniform(0.05, 0.95, n)   # y/h
    lvl = np.zeros((n,), np.int32)
    offs = np.array([0], np.int32)
    hs = np.array([h], np.int32)
    ws = np.array([w], np.int32)
    return (jnp.asarray(buf), jnp.asarray(lafs), jnp.asarray(lvl),
            jnp.asarray(offs), jnp.asarray(hs), jnp.asarray(ws))


def bench(site_name, site, overrides):
    buf, lafs, lvl, offs, hs, ws = make_inputs(site)
    kw = dict(ps=site["ps"], align_corners=False,
              window_rows=site["window_rows"],
              window_cols=site["window_cols"],
              patches_per_step=site["patches_per_step"],
              n_buffers=site.get("n_buffers", 2),
              mxu_dtype=jnp.bfloat16, fallback_slots=64,
              return_miss_overflow=True)
    kw.update(overrides)

    def run(b):
        p, ovf = extract_patches_window_matmul(b, lafs, lvl, offs, hs, ws,
                                               **kw)
        return p.sum(), ovf

    # In-jit loop: single dispatch for ITERS kernel runs (the tunnel's
    # ~25 ms round trip and its scheduling variance otherwise dominate).
    @jax.jit
    def loop(b):
        def body(i, acc):
            s, _ = run(b * (1.0 + 1e-12 * i.astype(jnp.float32)))
            return acc + s
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    _, ovf = run(buf)           # overflow probe (also warms the cache)
    fence(loop(buf))            # compile
    t0 = time.time()
    fence(loop(buf))
    ms = (time.time() - t0) * 1e3 / ITERS
    label = ",".join(f"{k}={v}" for k, v in overrides.items()) or "base"
    print(json.dumps({"site": site_name, "cfg": label,
                      "ms": round(ms, 3),
                      "us_per_patch": round(ms * 1e3 / site["n"], 3),
                      "overflow": int(ovf)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default="shape")
    args = ap.parse_args()
    site = SITES[args.site]

    rw = site["window_rows"]
    sweeps = [
        {},
        {"patches_per_step": 16},
        {"window_rows": rw + 16},
        {"window_rows": rw + 16, "patches_per_step": 16},
        {"window_rows": rw + 32, "patches_per_step": 16},
        {"window_rows": rw - 16, "patches_per_step": 16},
        {"window_rows": -(-rw // 64) * 64, "patches_per_step": 16},
        {"window_rows": -(-rw // 64) * 64, "patches_per_step": 16,
         "chunk_samples": 512},
    ]
    for ov in sweeps:
        try:
            bench(args.site, site, ov)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"site": args.site, "cfg": str(ov),
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
