"""Pallas TPU bilinear patch sampler: gather-as-matmul over windowed DMA.

Replaces the scattered 4x ``jnp.take`` bilinear gather
(ops/patches.py:_bilinear_window_sample_vec) for the pyramid patch-extraction
hot path (reference: LAF.py:364-390).  The XLA gather costs ~6.6 ns per
corner fetch regardless of locality (measured; see CLAUDE.md) and dominated
~45% of the pipeline.  This kernel exploits the spatial coherence of a patch:

  1. The pyramid buffer is laid out in overlapping COLUMN TILES (tile_w at
     tile_stride = 2*QC), stacked vertically, so each patch's window is ONE
     contiguous HBM band fetched by a double-buffered DMA (origins are
     element-granular, quantized to the (8, 128) VMEM tile).  Earlier
     variants measured: kr x kc BlockSpec blocks — DMA-issue-bound at
     ~0.5 us/issue; strided (RW-segment) windows — ~70 ns/segment; full-
     width row bands — 4-7x the needed bytes.
  2. Bilinear sampling becomes dense MXU math instead of scattered loads:
     for sample s at (u_s, v_s),

        patch[s] = sum_{r,c} R[s,r] * C[s,c] * win[r,c]

     with R[s,r] = max(0, 1 - |r - v_s|) (tent = exact bilinear row
     weight), C likewise over columns; the level-bound masks ("out-of-bounds
     corners contribute zero", torch grid_sample padding_mode='zeros') are
     folded into the window once per patch.  Computed as one
     (S, RW) @ (RW, CW) matmul + a (S, CW) weighted row-reduce, f32
     accumulation (bf16 operands in fast mode).

Patches whose sample extent exceeds the static window are recomputed
exactly by the XLA gather path on a small fixed-size compacted batch and
scattered back — the whole recompute hides behind lax.cond(n_miss > 0), and
capacity overflows are COUNTED and surfaced (no silent truncation).  The
descriptor site additionally buckets extent-sorted patches into three
window classes (ops/patches.py DESC_BUCKETS); a custom-VJP batched variant
(:func:`extract_patches_batched_pallas`) serves the training warps.

Equivalence with the XLA path is exact up to f32 rounding of the bilinear
fractions (the kernel computes them in window-local coordinates, the XLA
path in absolute image coordinates); tested in interpret mode
(tests/test_pallas_patches.py) plus the detector golden tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .patches import _bilinear_window_sample_vec

Array = jax.Array

# Window-origin quantization: one VMEM tile (f32) — keeps the strided DMA
# aligned without meaningfully shrinking the usable window.
QR = 8
QC = 128

# Run the kernel through the interpreter (tests on the CPU backend set this
# via conftest, like ops/pallas_detect.INTERPRET).
INTERPRET = False

META_W = 10  # per-patch parameter row width (9 used, padded even)

# Patches per pallas_call: the scalar-prefetch tables live in SMEM (~1 MB),
# so large LAF sets (threshold mode caps at 16384) are processed in groups.
MAX_PATCHES_PER_CALL = 4096


def _grid_coeff(ps: int, align_corners: bool) -> Tuple[float, float]:
    """lin(t) = a*t + b of the affine_grid base coordinates (patches._base_grid)."""
    if align_corners:
        return 2.0 / (ps - 1), -1.0
    return 2.0 / ps, 1.0 / ps - 1.0


def _chunking(ps: int, chunk_samples: int) -> Tuple[int, int, int]:
    """(chunk, n_chunks, padded sample count): samples are processed in
    chunks of <= chunk_samples to bound VMEM transients (the tent matrices
    are (chunk, RW/CW)), and the output is padded to whole chunks so every
    store is a full aligned slice.  One full-size chunk (the default) is
    fastest — the chunk fori_loop costs ~1.5 us per iteration, which at
    8 patches x 4 chunks x 250 grid steps dominated the kernel — so only
    chunk when the window is large enough to threaten VMEM."""
    s = ps * ps
    sc = min(-(-s // 8) * 8, chunk_samples)
    n_chunks = -(-s // sc)
    return sc, n_chunks, sc * n_chunks


def _sampler_kernel(blk_ref, meta_ref, buf_ref, out_ref, win_ref, sem_ref,
                    *, ps: int, p: int, rw: int, cw: int, fetch_cols: int,
                    n_steps: int, chunk_samples: int, ga: float, gb: float,
                    mxu_dtype, fold_masks: bool = True, dedup: bool = False):
    """Grid step = P patches.  blk/meta are scalar-prefetch (SMEM) tables:
    per-patch window origins (element-granular) and sampling parameters.
    buf_ref stays in HBM; windows are copied into the (2, P, RW, fetch_cols)
    VMEM scratch with double-buffered DMAs — windows for step i+1 are in
    flight while step i computes.

    ``buf_ref`` is the COLUMN-TILED pyramid buffer (see the wrapper): every
    window is one CONTIGUOUS band of ``fetch_cols``-wide rows — strided row
    segments cost ~70 ns each and full-width (1920-col) bands were 4-7x the
    needed bytes (both measured; the tiled layout made the shape/desc
    gathers DMA-minimal).  The (RW, CW) compute window is sliced out of VMEM
    at the 128-aligned per-patch tile-local column origin."""
    i = pl.program_id(0)
    sc, n_chunks, _ = _chunking(ps, chunk_samples)
    nbuf = win_ref.shape[0]
    bw = 3 if dedup else 2  # per-patch blk row: (r0, c0[, dup])

    def dma(step, slot, q):
        # Origins are quantized to the (QR, QC) tile by the wrapper; the
        # multiple_of hints let Mosaic slice the tiled HBM memref.
        r0 = pl.multiple_of(blk_ref[(step * p + q) * bw], QR)
        src = buf_ref.at[pl.ds(r0, rw), :]
        return pltpu.make_async_copy(src, win_ref.at[slot, q],
                                     sem_ref.at[slot, q])

    def is_dup(step, q):
        # dup=1: this patch's quantized window origin equals patch q-1's of
        # the SAME grid step (the wrapper forces dup=0 at q == 0), so its
        # window bytes are already being fetched by the run head — skip the
        # DMA and chain-select the previous patch's raw window below.
        return blk_ref[(step * p + q) * bw + 2] == 1

    def start_dma(step, slot, q):
        if dedup and q > 0:
            @pl.when(jnp.logical_not(is_dup(step, q)))
            def _():
                dma(step, slot, q).start()
        else:
            dma(step, slot, q).start()

    if nbuf == 1:
        # Single-buffered (big-window bucket: the window pair would not fit
        # VMEM): DMAs issue at the top of the step, no cross-step overlap.
        for q in range(p):
            start_dma(i, 0, q)
        slot = 0
    else:
        @pl.when(i == 0)
        def _():
            for q in range(p):
                start_dma(0, 0, q)

        @pl.when(i + 1 < n_steps)
        def _():
            for q in range(p):
                start_dma(i + 1, (i + 1) % 2, q)

        slot = i % 2

    # Static per-sample base-grid ids, SAMPLES IN LANES: tents are built
    # transposed — (rw, sc) / (cw, sc) — so the gather matmul contracts over
    # the window's LONG axis (cw >= 256 at every site).  The original
    # orientation contracted over rw (48-96), underfilling the 128-deep MXU
    # systolic dimension: the shape site measured 1.5 us/patch of pure
    # matmul at K=48 vs 0.6 us at K=256 (same FLOPs).
    # (Mosaic iota is integer-only; cast to f32 afterwards.)
    sid_j = jax.lax.broadcasted_iota(jnp.int32, (1, sc), 1)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (rw, sc), 0) \
        .astype(jnp.float32)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (cw, sc), 0) \
        .astype(jnp.float32)

    prev_raw = None
    for q in range(p):
        if dedup and q > 0:
            @pl.when(jnp.logical_not(is_dup(i, q)))
            def _(q=q):
                dma(i, slot, q).wait()
        else:
            dma(i, slot, q).wait()
        if fetch_cols > cw:
            c0 = pl.multiple_of(blk_ref[(i * p + q) * bw + 1], QC)
            window = win_ref[slot, q, :, pl.ds(c0, cw)]  # (RW, CW)
        else:
            window = win_ref[slot, q]                    # (RW, CW)
        if dedup:
            # Chain-select: a dup patch's own scratch slot is stale (its DMA
            # never issued) — take the previous patch's raw window instead.
            # Identical quantized origin ⇒ identical buffer bytes, whatever
            # the level; masks/meta below stay per-patch.  The select is one
            # (RW, CW) VPU pass, noise next to the tent matmul.
            if q > 0:
                window = jnp.where(is_dup(i, q), prev_raw, window)
            prev_raw = window

        base = (i * p + q) * META_W
        b11 = meta_ref[base + 0]
        b12 = meta_ref[base + 1]
        b21 = meta_ref[base + 2]
        b22 = meta_ref[base + 3]
        u0 = meta_ref[base + 4]
        v0 = meta_ref[base + 5]
        xhi = meta_ref[base + 6]
        ylo = meta_ref[base + 7]
        yhi = meta_ref[base + 8]

        if fold_masks:
            # Fold the level-bound masks into the window ONCE per patch (the
            # product distributes: zeroing window rows/cols == zeroing tent
            # entries) — per-sample tent masking cost 2x the VPU work of the
            # whole tent construction at desc-window sizes.
            wrow = jax.lax.broadcasted_iota(jnp.int32, (rw, cw), 0) \
                .astype(jnp.float32)
            wcol = jax.lax.broadcasted_iota(jnp.int32, (rw, cw), 1) \
                .astype(jnp.float32)
            ok = (wrow >= ylo) & (wrow <= yhi) & (wcol <= xhi)
            window = jnp.where(ok, window, 0.0).astype(mxu_dtype)
        else:
            window = window.astype(mxu_dtype)

        def chunk_body(ck, _):
            # fori_loop (not unrolled) so the chunk transients are a single
            # reused buffer set — unrolling all P*n_chunks bodies spills VMEM.
            sid = sid_j + ck * sc                        # (1, chunk)
            i_f = (sid // ps).astype(jnp.float32)
            j_f = (sid % ps).astype(jnp.float32)
            gx = ga * j_f + gb                           # (1, chunk)
            gy = ga * i_f + gb
            u = b11 * gx + b12 * gy + u0                 # window-local cols
            v = b21 * gx + b22 * gy + v0                 # window-local rows

            rw_t = jnp.maximum(0.0, 1.0 - jnp.abs(r_ids - v))   # (rw, chunk)
            cw_t = jnp.maximum(0.0, 1.0 - jnp.abs(c_ids - u))   # (cw, chunk)
            if not fold_masks:
                rw_t = jnp.where((r_ids >= ylo) & (r_ids <= yhi), rw_t, 0.0)
                cw_t = jnp.where(c_ids <= xhi, cw_t, 0.0)

            # mxu_dtype=bf16 runs the column-gather matmul at 4x MXU rate
            # with f32 accumulation (fast mode: ~1 grey-level patch error).
            # bf16 operands need precision=DEFAULT (Mosaic rejects HIGHEST
            # for them); f32 operands get HIGHEST — at DEFAULT the MXU
            # truncates f32 operands to bf16 anyway (measured ~0.9
            # grey-level error, tests/test_tpu_smoke.py), which would make
            # the non-fast "parity" mode no more accurate than fast mode.
            prec = (jax.lax.Precision.DEFAULT if mxu_dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            # (rw, cw) @ (cw, chunk): K = cw keeps the systolic depth full;
            # the row-tent reduction runs on the VPU over sublanes.
            w2 = jnp.dot(window, cw_t.astype(mxu_dtype),
                         preferred_element_type=jnp.float32,
                         precision=prec)                 # (rw, chunk)
            out_ref[q, pl.ds(ck * sc, sc)] = jnp.sum(rw_t * w2, axis=0)
            return 0

        if n_chunks == 1:
            chunk_body(0, 0)
        else:
            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def extract_patches_window_matmul(buf2d: Array, lafs: Array,
                                  level_idx: Array, row_offsets: Array,
                                  heights: Array, widths: Array,
                                  interpret: bool | None = None, **kw):
    """Non-jitted entry: resolves the module INTERPRET flag OUTSIDE the jit
    cache (``interpret`` is a static cache key, so resolving the global at
    trace time silently pinned the first value seen — tests toggle it)."""
    if interpret is None:
        interpret = INTERPRET
    return _window_matmul_jit(buf2d, lafs, level_idx, row_offsets, heights,
                              widths, interpret=interpret, **kw)


@functools.partial(jax.jit, static_argnames=(
    "ps", "align_corners", "window_rows", "window_cols", "patches_per_step",
    "fallback_slots", "chunk_samples", "mxu_dtype", "interpret", "n_buffers",
    "return_miss_overflow", "fold_masks", "dedup_windows"))
def _window_matmul_jit(buf2d: Array, lafs: Array,
                                  level_idx: Array, row_offsets: Array,
                                  heights: Array, widths: Array,
                                  ps: int = 32, align_corners: bool = False,
                                  window_rows: int = 160,
                                  window_cols: int = 256,
                                  patches_per_step: int = 8,
                                  fallback_slots: int = 32,
                                  chunk_samples: int = 1024,
                                  mxu_dtype=jnp.float32,
                                  interpret: bool = False,
                                  n_buffers: int = 2,
                                  return_miss_overflow: bool = False,
                                  fold_masks: bool = True,
                                  dedup_windows: bool = False):
    """Drop-in replacement for patches.extract_patches_from_flat_pyramid.

    With ``return_miss_overflow`` returns ``(patches, n_overflow)`` where
    ``n_overflow`` counts window misses beyond the ``fallback_slots``
    capacity — those patches keep the (truncated) kernel output, so a
    nonzero count must be surfaced to the caller (no silent corruption)."""
    n = lafs.shape[0]
    # The output block is (p, ps*ps); Mosaic requires the sublane dimension
    # to be a multiple of 8.
    p = -(-patches_per_step // 8) * 8
    if mxu_dtype != jnp.bfloat16:
        # f32 windows/tents double every compute transient; p=16 at the
        # ori site blew the 16 MB scoped-VMEM stack (measured: 16.83 MB),
        # and the big-window desc bucket (448 rows) went 240 KB over even
        # at p=8 after the contraction swap.  The fast path (bf16) keeps
        # the larger step / chunk.
        p = min(p, 8)
        if window_rows >= 256:
            chunk_samples = min(chunk_samples, 128)
    dt = jnp.float32

    # Pad the buffer to whole origin quanta so every window is in bounds
    # after clamping (OOB reads are undefined — NaN in interpret mode — and
    # 0 * NaN != 0 in the tent masks).
    rows_pad = -(-buf2d.shape[0] // QR) * QR
    # Column-tile layout: overlapping tiles of tile_w columns at
    # tile_stride, stacked vertically, so any QC-aligned window of cw
    # columns lies inside ONE tile and its DMA is a single contiguous band.
    # tile_w = tile_stride * m with tile_w >= cw + QC guarantees the
    # tile-local origin c0p (QC-aligned, <= tile_w - cw after edge clipping)
    # keeps the window inside the tile.
    tile_stride = 2 * QC
    cols_raw = -(-buf2d.shape[1] // QC) * QC
    cw = min(window_cols, cols_raw)
    tile_w = tile_stride * (-(-(cw + QC) // tile_stride))
    if cols_raw >= tile_w:
        cols_pad = -(-cols_raw // tile_stride) * tile_stride
        n_tiles = (cols_pad - tile_w) // tile_stride + 1
    else:
        cols_pad = cols_raw
        n_tiles = 1
        tile_w = cols_pad
        cw = min(cw, tile_w)
    rw = min(window_rows, rows_pad)
    fetch_cols = tile_w
    if (rows_pad, cols_pad) != buf2d.shape:
        buf2d = jnp.pad(buf2d, ((0, rows_pad - buf2d.shape[0]),
                                (0, cols_pad - buf2d.shape[1])))
    if n_tiles > 1:
        buf_tiled = jnp.concatenate(
            [buf2d[:, t * tile_stride:t * tile_stride + tile_w]
             for t in range(n_tiles)], axis=0)
    else:
        buf_tiled = buf2d

    h_l = heights[level_idx].astype(dt)
    w_l = widths[level_idx].astype(dt)
    roff = row_offsets[level_idx].astype(dt)
    m = jnp.minimum(h_l, w_l)
    A = lafs[:, :2, :2].astype(dt)
    tx = lafs[:, 0, 2].astype(dt)
    ty = lafs[:, 1, 2].astype(dt)

    if align_corners:
        su = (w_l - 1.0) / w_l
        sv = (h_l - 1.0) / h_l
        cu = jnp.zeros_like(su)
    else:
        su = jnp.ones_like(w_l)
        sv = jnp.ones_like(h_l)
        cu = jnp.full_like(su, -0.5)
    b11 = m * A[:, 0, 0] * su
    b12 = m * A[:, 0, 1] * su
    b21 = m * A[:, 1, 0] * sv
    b22 = m * A[:, 1, 1] * sv
    u0 = w_l * tx * su + cu                  # level coords
    v0 = h_l * ty * sv + cu + roff           # buffer-absolute rows

    ga, gb = _grid_coeff(ps, align_corners)
    gmax = max(abs(ga * (ps - 1) + gb), abs(gb))
    eu = (jnp.abs(b11) + jnp.abs(b12)) * gmax
    ev = (jnp.abs(b21) + jnp.abs(b22)) * gmax
    u_lo, u_hi = u0 - eu, u0 + eu
    v_lo, v_hi = v0 - ev, v0 + ev

    safe = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    # Element-granular window origins, quantized to the VMEM tile and
    # clamped in-bounds.  floor(u_lo) is the leftmost corner column that can
    # carry weight; -1 leaves slack for the quantization floor.
    c0 = jnp.clip((jnp.floor(safe(u_lo)).astype(jnp.int32) // QC) * QC,
                  0, cols_pad - cw)
    r0 = jnp.clip((jnp.floor(safe(v_lo)).astype(jnp.int32) // QR) * QR,
                  0, rows_pad - rw)
    # Map origins into the column-tiled buffer: tile index, tile-local
    # column (stays QC-aligned: stride is 2*QC), vertical tile offset.
    tile_idx = jnp.clip(c0 // tile_stride, 0, n_tiles - 1)
    c0_local = c0 - tile_idx * tile_stride
    r0_tiled = tile_idx * rows_pad + r0

    # Coverage check on the corner pixels that can carry nonzero weight.
    need_xhi = jnp.minimum(w_l - 1.0, jnp.floor(safe(u_hi)) + 1.0)
    need_yhi = jnp.minimum(roff + h_l - 1.0, jnp.floor(safe(v_hi)) + 1.0)
    fits = ((need_xhi <= c0.astype(dt) + (cw - 1))
            & (need_yhi <= r0.astype(dt) + (rw - 1))
            & jnp.isfinite(u_lo) & jnp.isfinite(v_lo))

    meta = jnp.zeros((n, META_W), dt)
    meta = meta.at[:, 0].set(safe(b11))
    meta = meta.at[:, 1].set(safe(b12))
    meta = meta.at[:, 2].set(safe(b21))
    meta = meta.at[:, 3].set(safe(b22))
    meta = meta.at[:, 4].set(safe(u0) - c0.astype(dt))
    meta = meta.at[:, 5].set(safe(v0) - r0.astype(dt))
    meta = meta.at[:, 6].set(w_l - 1.0 - c0.astype(dt))         # xhi
    meta = meta.at[:, 7].set(roff - r0.astype(dt))              # ylo
    meta = meta.at[:, 8].set(roff + h_l - 1.0 - r0.astype(dt))  # yhi

    n_pad = -(-n // p) * p
    if n_pad != n:
        meta = jnp.pad(meta, ((0, n_pad - n), (0, 0)))
        c0_local = jnp.pad(c0_local, (0, n_pad - n))
        r0_tiled = jnp.pad(r0_tiled, (0, n_pad - n))
    # Scalar-prefetch operands must be 1-D: 2-D SMEM arrays are lane-padded
    # to 128 columns (a (2000, 2) table would occupy 1 MB of the 1 MB SMEM).
    if dedup_windows:
        # Shared-window DMA dedup: a patch whose quantized window origin
        # equals its predecessor's (same grid step) reuses the predecessor's
        # fetched window inside the kernel instead of issuing its own DMA —
        # the per-patch DMA-issue floor (~0.95 us, CLAUDE.md) is the sampler
        # bottleneck, and keypoints cluster (multi-scale detections at one
        # corner share the quantized origin).  Only ADJACENT equal origins
        # dedup; origin-aware input ordering maximizes the hit rate.
        same = ((r0_tiled[1:] == r0_tiled[:-1])
                & (c0_local[1:] == c0_local[:-1]))
        dup = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), same.astype(jnp.int32)])
        # A grid step's first patch always issues (runs cannot cross steps:
        # the chain-select state resets every step).
        dup = jnp.where(jnp.arange(n_pad) % p == 0, 0, dup)
        blk = jnp.stack([r0_tiled, c0_local, dup], axis=1).reshape(-1)
        bw = 3
    else:
        blk = jnp.stack([r0_tiled, c0_local], axis=1).reshape(-1)
        bw = 2
    meta = meta.reshape(-1)                          # (n_pad*META_W,)

    _, _, s_pad = _chunking(ps, chunk_samples)
    group = min(n_pad, -(-MAX_PATCHES_PER_CALL // p) * p)
    flats = []
    for g0 in range(0, n_pad, group):
        ng = min(group, n_pad - g0)
        n_steps = ng // p
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # blk (window origins) + meta (params)
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # buf in HBM
            out_specs=pl.BlockSpec((p, s_pad), lambda i, blk_ref, meta_ref:
                                   (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_buffers, p, rw, fetch_cols), dt),
                pltpu.SemaphoreType.DMA((n_buffers, p)),
            ],
        )
        kernel = functools.partial(
            _sampler_kernel, ps=ps, p=p, rw=rw, cw=cw, fetch_cols=fetch_cols,
            n_steps=n_steps, chunk_samples=chunk_samples, ga=ga, gb=gb,
            mxu_dtype=mxu_dtype, fold_masks=fold_masks, dedup=dedup_windows)
        flats.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ng, s_pad), dt),
            interpret=interpret,
        )(blk[g0 * bw:(g0 + ng) * bw], meta[g0 * META_W:(g0 + ng) * META_W],
          buf_tiled))
    flat = jnp.concatenate(flats)[:n, :ps * ps] if len(flats) > 1 \
        else flats[0][:n, :ps * ps]

    patches = flat.reshape(n, ps, ps)

    # Exact XLA recompute of the (rare) patches whose extent exceeds the
    # window, scattered back over the kernel output.  Unused slots default to
    # patch 0, whose recompute is identical — the scatter is then a no-op.
    # The whole recompute hides behind lax.cond: with well-sized windows
    # misses are ~0 and the always-on fallback gathers were the single
    # biggest cost of the desc site (4x 1.4 ms at 192 slots, measured).
    k = min(fallback_slots, n)
    n_miss = (~fits).sum().astype(jnp.int32)
    n_overflow = jnp.maximum(0, n_miss - k)
    if k > 0:
        miss = ~fits
        rank = jnp.cumsum(miss.astype(jnp.int32)) - 1
        slot = jnp.where(miss & (rank < k), rank, k)
        idx_k = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]

        def recompute():
            gx_t, gy_t = _patch_grid(ps, align_corners, dt)
            lv = level_idx[idx_k]
            hh = heights[lv].astype(dt)[:, None, None]
            ww = widths[lv].astype(dt)[:, None, None]
            mm = jnp.minimum(hh, ww)
            Ak = lafs[idx_k].astype(dt)
            xs = mm * (Ak[:, None, None, 0, 0] * gx_t
                       + Ak[:, None, None, 0, 1] * gy_t) \
                + ww * Ak[:, None, None, 0, 2]
            ys = mm * (Ak[:, None, None, 1, 0] * gx_t
                       + Ak[:, None, None, 1, 1] * gy_t) \
                + hh * Ak[:, None, None, 1, 2]
            if align_corners:
                u = xs * (ww - 1.0) / ww
                v = ys * (hh - 1.0) / hh
            else:
                u = xs - 0.5
                v = ys - 0.5
            ro = jnp.broadcast_to(row_offsets[lv][:, None, None], u.shape)
            hi = jnp.broadcast_to(heights[lv][:, None, None], u.shape)
            wi = jnp.broadcast_to(widths[lv][:, None, None], u.shape)
            return _bilinear_window_sample_vec(
                buf2d, ro.reshape(-1), hi.reshape(-1), wi.reshape(-1),
                u.reshape(-1), v.reshape(-1)).reshape(k, ps, ps)

        # The cond produces only the K fallback rows — an identity branch
        # over the full (N, S) patch tensor made XLA copy it (~1.4 ms at
        # zero misses, measured); the k-row scatter below is a no-op when
        # the passthrough branch returns the kernel's own values.
        vals = jax.lax.cond(n_miss > 0, recompute,
                            lambda: jnp.take(patches, idx_k, axis=0))
        patches = patches.at[idx_k].set(vals)
    if return_miss_overflow:
        return patches, n_overflow
    return patches


def sample_extents(lafs: Array, level_idx: Array, heights: Array,
                   widths: Array, ps: int, align_corners: bool):
    """Half-extents (eu cols, ev rows, in level pixels) of each patch's
    bilinear sample spread — the same quantities the kernel's coverage check
    uses.  NaN/inf LAFs map to +inf so they sort into the last bucket."""
    dt = jnp.float32
    h_l = heights[level_idx].astype(dt)
    w_l = widths[level_idx].astype(dt)
    m = jnp.minimum(h_l, w_l)
    A = lafs[:, :2, :2].astype(dt)
    if align_corners:
        su = (w_l - 1.0) / w_l
        sv = (h_l - 1.0) / h_l
    else:
        su = jnp.ones_like(w_l)
        sv = jnp.ones_like(h_l)
    ga, gb = _grid_coeff(ps, align_corners)
    gmax = max(abs(ga * (ps - 1) + gb), abs(gb))
    eu = (jnp.abs(m * A[:, 0, 0] * su) + jnp.abs(m * A[:, 0, 1] * su)) * gmax
    ev = (jnp.abs(m * A[:, 1, 0] * sv) + jnp.abs(m * A[:, 1, 1] * sv)) * gmax
    big = jnp.float32(jnp.inf)
    bad = ~(jnp.isfinite(eu) & jnp.isfinite(ev))
    return jnp.where(bad, big, eu), jnp.where(bad, big, ev)


def window_origin_keys(lafs: Array, level_idx: Array, row_offsets: Array,
                       heights: Array, widths: Array, ps: int,
                       align_corners: bool):
    """Quantized window-origin sort keys (qr, qc): the (QR, QC)-quantized
    row/column cell the sampler's window DMA would start at (same math as
    the wrapper, unclamped).  Patches adjacent in (qr, qc) order land on
    EQUAL quantized origins when they view the same image region, which is
    what the shared-window DMA dedup (``dedup_windows``) needs to skip
    their DMAs.  NaN/inf LAFs map to large keys (sort last, never dedup)."""
    dt = jnp.float32
    h_l = heights[level_idx].astype(dt)
    w_l = widths[level_idx].astype(dt)
    roff = row_offsets[level_idx].astype(dt)
    m = jnp.minimum(h_l, w_l)
    A = lafs[:, :2, :2].astype(dt)
    if align_corners:
        su = (w_l - 1.0) / w_l
        sv = (h_l - 1.0) / h_l
        cu = jnp.zeros_like(su)
    else:
        su = jnp.ones_like(w_l)
        sv = jnp.ones_like(h_l)
        cu = jnp.full_like(su, -0.5)
    ga, gb = _grid_coeff(ps, align_corners)
    gmax = max(abs(ga * (ps - 1) + gb), abs(gb))
    eu = (jnp.abs(m * A[:, 0, 0] * su) + jnp.abs(m * A[:, 0, 1] * su)) * gmax
    ev = (jnp.abs(m * A[:, 1, 0] * sv) + jnp.abs(m * A[:, 1, 1] * sv)) * gmax
    u_lo = w_l * lafs[:, 0, 2].astype(dt) * su + cu - eu
    v_lo = h_l * lafs[:, 1, 2].astype(dt) * sv + cu + roff - ev
    big = jnp.float32(2 ** 20)
    u_lo = jnp.where(jnp.isfinite(u_lo), u_lo, big)
    v_lo = jnp.where(jnp.isfinite(v_lo), v_lo, big)
    qr = jnp.clip(jnp.floor(v_lo).astype(jnp.int32) // QR, 0, 2 ** 17 - 1)
    qc = jnp.clip(jnp.floor(u_lo).astype(jnp.int32) // QC, 0, 2 ** 10 - 1)
    return qr, qc


def origin_sort_key(lafs: Array, level_idx: Array, row_offsets: Array,
                    heights: Array, widths: Array, ps: int,
                    align_corners: bool) -> Array:
    """Single int32 lexicographic (qr, qc) key for window-origin sorting."""
    qr, qc = window_origin_keys(lafs, level_idx, row_offsets, heights,
                                widths, ps, align_corners)
    return qr * (2 ** 10) + qc


def bucket_sizes(n: int, fracs) -> list:
    """Static per-bucket patch counts for ``extract_patches_bucketed``:
    fraction-of-n slices rounded down to multiples of 8, remainder to the
    last (None-frac) bucket.  Shared with detector._sort_for_describe so an
    in-bucket secondary sort sees the exact slice boundaries."""
    sizes = []
    used = 0
    for i, f in enumerate(fracs):
        if i == len(fracs) - 1:
            sizes.append(n - used)
        else:
            s = min(max(0, int(n * f) // 8 * 8), n - used)
            sizes.append(s)
            used += s
    return sizes


def extract_patches_bucketed(buf2d: Array, lafs: Array, level_idx: Array,
                             row_offsets: Array, heights: Array,
                             widths: Array, ps: int, align_corners: bool,
                             buckets, fallback_slots: int,
                             mxu_dtype=jnp.float32,
                             interpret: bool | None = None,
                             dedup_windows: bool = False):
    """Multi-window extraction for EXTENT-SORTED inputs: slice the (sorted)
    LAF list into static-capacity buckets, each sampled with a window sized
    for its extent class (the dense tent matmuls and window DMAs scale with
    the window, and the p95 window is ~5x the median — measured desc-site
    extents at 1080p: p50 87 px, p95 243, max 403).

    Correct for ANY input order (a patch that exceeds its bucket's window is
    recomputed exactly by the fallback), but only extent-ascending order
    puts patches in cost-optimal buckets.  Returns (patches, n_overflow):
    n_overflow counts fallback-capacity overflows (truncated patches) summed
    over buckets — callers must surface nonzero counts."""
    n = lafs.shape[0]
    sizes = bucket_sizes(n, [b[0] for b in buckets])
    outs, overflows = [], []
    start = 0
    for (frac, cfg), size in zip(buckets, sizes):
        if size <= 0:
            continue
        sl = slice(start, start + size)
        cfg = dict(cfg)
        slots = min(size, cfg.pop("fallback_slots", fallback_slots))
        res, ovf = extract_patches_window_matmul(
            buf2d, lafs[sl], level_idx[sl], row_offsets, heights, widths,
            ps=ps, align_corners=align_corners,
            fallback_slots=slots, mxu_dtype=mxu_dtype,
            interpret=interpret, return_miss_overflow=True,
            dedup_windows=dedup_windows, **cfg)
        outs.append(res)
        overflows.append(ovf)
        start += size
    patches = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return patches, sum(overflows[1:], overflows[0])


def _patch_grid(ps: int, align_corners: bool, dtype):
    if align_corners:
        lin = jnp.linspace(-1.0, 1.0, ps, dtype=dtype)
    else:
        lin = (2.0 * jnp.arange(ps, dtype=dtype) + 1.0) / ps - 1.0
    return jnp.tile(lin[None, :], (ps, 1)), jnp.tile(lin[:, None], (1, ps))


# ---------------------------------------------------------------------------
# Differentiable batched sampler (training warps / shape optimization)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _batched_sample_diff(buf2d, lafs, ps, align_corners, n, hw):
    """Forward = Pallas gather-as-matmul on the stacked (N*H, W) buffer;
    backward = VJP of the XLA flat-gather formulation (the two forwards are
    equal up to f32 rounding — tests/test_pallas_patches.py — so the
    cotangents are the exact gradients of the same sampling function).
    The image gradient is the XLA scatter-add the training path already
    paid; the LAF gradient is a small per-patch reduction."""
    h, w = hw
    row_off, heights, widths = _batched_tables(n, h, w)
    # fallback_slots = n: the training rewarp transform is a raw network
    # output with unbounded extent, so EVERY window miss must take the exact
    # recompute — truncated samples in the gradient NaN'd training (r3).
    # At training scales (n <= 1-2k, ps = 32-64) the zero-miss passthrough
    # copy is a few MB — noise next to the step.
    return extract_patches_window_matmul(
        buf2d, lafs, jnp.arange(n, dtype=jnp.int32), row_off, heights,
        widths, ps=ps, align_corners=align_corners,
        window_rows=-(-int(1.75 * h) // 8) * 8, window_cols=2 * QC,
        patches_per_step=8, fallback_slots=n)


@functools.lru_cache(maxsize=None)
def _batched_tables_np(n, h, w):
    return (np.arange(n, dtype=np.int32) * h,
            np.full(n, h, np.int32), np.full(n, w, np.int32))


def _batched_tables(n, h, w):
    ro, hs, ws = _batched_tables_np(n, h, w)
    return jnp.asarray(ro), jnp.asarray(hs), jnp.asarray(ws)


def _batched_sample_fwd(buf2d, lafs, ps, align_corners, n, hw):
    return (_batched_sample_diff(buf2d, lafs, ps, align_corners, n, hw),
            (buf2d, lafs))


def _batched_sample_bwd(ps, align_corners, n, hw, res, g):
    from .patches import extract_patches_from_flat_pyramid
    buf2d, lafs = res
    h, w = hw
    row_off, heights, widths = _batched_tables(n, h, w)
    _, vjp = jax.vjp(
        lambda b, l: extract_patches_from_flat_pyramid(
            b, l, jnp.arange(n, dtype=jnp.int32), row_off, heights, widths,
            ps=ps, align_corners=align_corners),
        buf2d, lafs)
    return vjp(g)


_batched_sample_diff.defvjp(_batched_sample_fwd, _batched_sample_bwd)


def extract_patches_batched_pallas(imgs: Array, lafs: Array, ps: int = 32,
                                   align_corners: bool = False) -> Array:
    """Differentiable drop-in for patches.extract_patches_batched: Pallas
    forward (each LAF samples its own stacked image) with a custom VJP.
    Used by the training-time warps (augmentation.py) and shape_opt, which
    previously paid the ~6.6 ns/corner XLA gather forward."""
    n, h, w = imgs.shape
    buf2d = imgs.reshape(n * h, w)
    return _batched_sample_diff(buf2d, lafs, ps, align_corners, n, (h, w))


def make_pyramid_sampler_diff(row_offsets, heights, widths, ps: int,
                              align_corners: bool):
    """Differentiable pyramid sampler factory (shape optimization: the LAFs
    are the optimization variable and the level assignment depends on them,
    so the level index is an argument, carried as f32 with a zero cotangent
    — level choice is a discrete a.e.-constant function, gradient 0, which
    matches the XLA path where the int index gets no gradient).

    Forward = Pallas gather-as-matmul; backward = VJP of the XLA
    formulation wrt (buffer, lafs).  The level tables are closed over
    (host-constant arrays)."""
    from .patches import extract_patches_from_flat_pyramid

    def _fwd_compute(buf2d, lafs, lvl_f):
        lvl = lvl_f.astype(jnp.int32)
        n = lafs.shape[0]
        return extract_patches_window_matmul(
            buf2d, lafs, lvl, row_offsets, heights, widths, ps=ps,
            align_corners=align_corners, window_rows=256, window_cols=384,
            patches_per_step=8, fallback_slots=max(16, n // 16))

    @jax.custom_vjp
    def sample(buf2d, lafs, lvl_f):
        return _fwd_compute(buf2d, lafs, lvl_f)

    def fwd(buf2d, lafs, lvl_f):
        return _fwd_compute(buf2d, lafs, lvl_f), (buf2d, lafs, lvl_f)

    def bwd(res, g):
        buf2d, lafs, lvl_f = res
        lvl = lvl_f.astype(jnp.int32)
        _, vjp = jax.vjp(
            lambda b, l: extract_patches_from_flat_pyramid(
                b, l, lvl, row_offsets, heights, widths, ps=ps,
                align_corners=align_corners),
            buf2d, lafs)
        db, dl = vjp(g)
        return db, dl, jnp.zeros_like(lvl_f)

    sample.defvjp(fwd, bwd)
    return sample
