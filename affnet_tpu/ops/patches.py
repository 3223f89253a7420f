"""Affine patch extraction: batched bilinear gather from images or from the
row-padded pyramid buffer.

TPU-first replacement for the reference's F.affine_grid + chunked
F.grid_sample path (LAF.py:313-372) and for the per-(octave,level)
scatter/gather loop extract_patches_from_pyramid_with_inv_index
(LAF.py:376-404): every LAF carries a flat level id and all patches are
sampled by ONE vectorized gather from a row-padded 2-D buffer holding every
pyramid level.  Each bilinear sample fetches its 2x2 support as a single
lax.gather window — 4x fewer (and contiguous) gathers than per-corner
scalar gathers, which dominates the pipeline cost otherwise.

Sampling semantics replicate torch grid_sample / affine_grid exactly, in both
conventions:
  - ``align_corners=False`` (default; what the reference produces when run
    under modern torch): base grid at pixel centers (2j+1)/PS - 1, sample
    position u = p - 0.5
  - ``align_corners=True`` (original torch-0.4 behavior): base grid
    linspace(-1, 1, PS), u = p * (size-1) / size
where p = A_norm * min(h, w) @ (gx, gy) + (tx * w, ty * h) is the reference's
pixel-coordinate chain (generate_patch_grid_from_normalized_LAFs,
LAF.py:313-324, followed by grid_sample's unnormalization).  Out-of-bounds
bilinear corners contribute zero (padding_mode='zeros').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _base_grid(ps: int, align_corners: bool, dtype=jnp.float32):
    """(gx, gy) each (PS, PS): affine_grid base coordinates in [-1, 1]."""
    if align_corners:
        lin = jnp.linspace(-1.0, 1.0, ps, dtype=dtype)
    else:
        lin = (2.0 * jnp.arange(ps, dtype=dtype) + 1.0) / ps - 1.0
    gx = jnp.tile(lin[None, :], (ps, 1))
    gy = jnp.tile(lin[:, None], (1, ps))
    return gx, gy


def _bilinear_window_sample(buf2d: Array, row_off, h, w,
                            u: Array, v: Array) -> Array:
    """Bilinear sample of the level living at rows [row_off, row_off + h) of
    the row-padded buffer, at float coords (u, v) (any shape), zeros padding.

    Four flat jnp.take gathers (one per bilinear corner).  NB a (2,2)-window
    lax.gather sounds cheaper but lowers to a serialized dynamic-slice loop
    on TPU (~50x slower, measured); flat takes vectorize."""
    shape = u.shape
    out = _bilinear_window_sample_vec(
        buf2d,
        jnp.broadcast_to(jnp.asarray(row_off, jnp.int32), shape).reshape(-1),
        jnp.broadcast_to(jnp.asarray(h, jnp.int32), shape).reshape(-1),
        jnp.broadcast_to(jnp.asarray(w, jnp.int32), shape).reshape(-1),
        u.reshape(-1), v.reshape(-1))
    return out.reshape(shape)


def _laf_sample_coords(laf: Array, h, w, gx: Array, gy: Array,
                       align_corners: bool):
    """Pixel-space sample coordinates (u, v) for one normalized LAF on an
    (h, w) image (h, w may be traced scalars)."""
    h = jnp.asarray(h, laf.dtype)
    w = jnp.asarray(w, laf.dtype)
    m = jnp.minimum(h, w)
    xs = m * (laf[0, 0] * gx + laf[0, 1] * gy) + w * laf[0, 2]
    ys = m * (laf[1, 0] * gx + laf[1, 1] * gy) + h * laf[1, 2]
    if align_corners:
        u = xs * (w - 1.0) / w
        v = ys * (h - 1.0) / h
    else:
        u = xs - 0.5
        v = ys - 0.5
    return u, v


@partial(jax.jit, static_argnames=("ps", "align_corners"))
def extract_patches_from_flat_pyramid(buf2d: Array, lafs: Array,
                                      level_idx: Array, row_offsets: Array,
                                      heights: Array, widths: Array,
                                      ps: int = 32,
                                      align_corners: bool = False) -> Array:
    """Extract (N, PS, PS) patches; LAF i samples pyramid level
    ``level_idx[i]`` (flat index into the row-offset/height/width tables of
    the row-padded buffer).

    Replaces extract_patches_from_pyramid_with_inv_index (LAF.py:376-390) +
    get_inverted_pyr_index (LAF.py:392-404) with a single vectorized gather."""
    gx, gy = _base_grid(ps, align_corners, lafs.dtype)
    n = lafs.shape[0]
    h = heights[level_idx].astype(lafs.dtype)[:, None, None]
    w = widths[level_idx].astype(lafs.dtype)[:, None, None]
    m = jnp.minimum(h, w)
    A = lafs[:, :, :2]
    xs = m * (A[:, None, None, 0, 0] * gx + A[:, None, None, 0, 1] * gy) \
        + w * lafs[:, None, None, 0, 2]
    ys = m * (A[:, None, None, 1, 0] * gx + A[:, None, None, 1, 1] * gy) \
        + h * lafs[:, None, None, 1, 2]
    if align_corners:
        u = xs * (w - 1.0) / w
        v = ys * (h - 1.0) / h
    else:
        u = xs - 0.5
        v = ys - 0.5
    # Per-sample level geometry, broadcast to (N, PS, PS).
    hi = jnp.broadcast_to(heights[level_idx][:, None, None], u.shape)
    wi = jnp.broadcast_to(widths[level_idx][:, None, None], u.shape)
    ro = jnp.broadcast_to(row_offsets[level_idx][:, None, None], u.shape)
    flat = _bilinear_window_sample_vec(buf2d, ro.reshape(-1),
                                       hi.reshape(-1), wi.reshape(-1),
                                       u.reshape(-1), v.reshape(-1))
    return flat.reshape(n, ps, ps)


def _bilinear_window_sample_vec(buf2d: Array, row_off: Array, h: Array,
                                w: Array, u: Array, v: Array) -> Array:
    """Bilinear sampling with PER-SAMPLE level geometry (row_off, h, w are
    int vectors aligned with u, v); four flat gathers into the row-padded
    buffer (pitch = buffer width)."""
    pitch = buf2d.shape[1]
    flat = buf2d.reshape(-1)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xc, yc, wgt):
        inb = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1))
        xcc = jnp.clip(xc, 0, w - 1)
        ycc = jnp.clip(yc, 0, h - 1)
        vals = jnp.take(flat, (row_off + ycc) * pitch + xcc, mode="clip")
        return vals * wgt * inb.astype(buf2d.dtype)

    return (corner(x0i, y0i, (1 - fx) * (1 - fy))
            + corner(x0i + 1, y0i, fx * (1 - fy))
            + corner(x0i, y0i + 1, (1 - fx) * fy)
            + corner(x0i + 1, y0i + 1, fx * fy))


@partial(jax.jit, static_argnames=("ps", "align_corners"))
def extract_patches(img: Array, lafs: Array, ps: int = 32,
                    align_corners: bool = False) -> Array:
    """Extract (N, PS, PS) patches from a single (H, W) image with normalized
    LAFs.  Equivalent to extract_patches (LAF.py:364-372) without the memory
    chunking (unnecessary on TPU: the whole batch is one gather)."""
    h, w = img.shape
    gx, gy = _base_grid(ps, align_corners, lafs.dtype)

    def one(laf):
        u, v = _laf_sample_coords(laf, h, w, gx, gy, align_corners)
        return _bilinear_window_sample(img, 0, h, w, u, v)

    return jax.vmap(one)(lafs)


def extract_patches_batched(imgs: Array, lafs: Array, ps: int = 32,
                            align_corners: bool = False) -> Array:
    """Per-sample extraction: imgs (N, H, W), lafs (N, 2, 3) -> (N, PS, PS).
    Used by the training augmentation path (train_AffNet_test_on_graffity.py:
    176-188) where each LAF warps its own source patch.

    With USE_PALLAS_BATCHED (default ON since r4) the forward runs the
    Pallas gather-as-matmul sampler through its custom VJP (backward = VJP
    of the XLA formulation below, so gradients are exact for the same
    sampling function).  Safe for the training rewarp — whose transform is
    a raw network output with unbounded extent — because the batched
    sampler sizes its fallback at FULL capacity (every window miss takes
    the exact recompute; the r3 NaN came from misses beyond an n//32
    fallback feeding truncated samples into the gradient) and the rewarp
    now samples the fused center crop (halved extents; augmentation.py)."""
    if USE_PALLAS_BATCHED:
        from .pallas_patches import extract_patches_batched_pallas
        return extract_patches_batched_pallas(imgs, lafs, ps=ps,
                                              align_corners=align_corners)
    return _extract_patches_batched_xla(imgs, lafs, ps=ps,
                                        align_corners=align_corners)


@partial(jax.jit, static_argnames=("ps", "align_corners"))
def _extract_patches_batched_xla(imgs: Array, lafs: Array, ps: int = 32,
                                 align_corners: bool = False) -> Array:
    n, h, w = imgs.shape
    gx, gy = _base_grid(ps, align_corners, lafs.dtype)
    buf2d = imgs.reshape(n * h, w)
    row_off = (jnp.arange(n, dtype=jnp.int32) * h)[:, None, None]
    u, v = jax.vmap(lambda laf: _laf_sample_coords(laf, h, w, gx, gy,
                                                   align_corners))(lafs)
    ro = jnp.broadcast_to(row_off, u.shape).reshape(-1)
    hv = jnp.full_like(ro, h)
    wv = jnp.full_like(ro, w)
    flat = _bilinear_window_sample_vec(buf2d, ro, hv, wv,
                                       u.reshape(-1), v.reshape(-1))
    return flat.reshape(n, ps, ps)


# Per-site window config for the Pallas gather-as-matmul sampler
# (ops/pallas_patches.py), sized from measured sample-extent distributions on
# the 1080p/2000-feature bench pipeline (scripts/measure_patch_extents.py):
# shape-site extents <= 35 px, orientation <= 87 px; descriptor extents span
# p50 87 / p95 243 / max 403 px, so the desc site carries extent BUCKETS
# (capacity fraction -> window class) used when the caller supplies
# extent-sorted LAFs — the tent matmuls and window DMAs scale with the
# window, and one p100-sized window for every patch cost ~5x the bucketed
# mix.  Window misses are recomputed exactly by the XLA fallback;
# ``fallback_slots`` scales with the patch count (a fixed 192 was sized on
# one bench image and could silently truncate on bigger CLI runs).
PALLAS_SITES = {
    # r4 in-jit sweep (scripts/bench_sampler_sweep.py) after the
    # contraction swap: shape window_rows 48 -> 64 measured 1.56 -> 0.95
    # us/patch (rw=48 is an anomalous slow point for the (rw, chunk)
    # reduction — 64 AND 96 both beat it), patches_per_step 8 -> 16 a
    # further ~5-20% on every site.
    "shape": dict(window_rows=64, window_cols=256, patches_per_step=16),
    "ori": dict(window_rows=96, window_cols=256, patches_per_step=16),
    "desc": dict(window_rows=256, window_cols=384, patches_per_step=8),
}

DESC_BUCKETS = (
    (0.55, dict(window_rows=96, window_cols=256, patches_per_step=16,
                fallback_slots=16)),
    (0.35, dict(window_rows=240, window_cols=384, patches_per_step=16,
                fallback_slots=16)),
    # Big-window tail: single-buffered (the window pair would exceed VMEM)
    # and sample-chunked (full-size tent transients + an 11 MB window
    # scratch thrashed VMEM, measured 33 us/patch -> ~3 us).
    (None, dict(window_rows=448, window_cols=512, patches_per_step=8,
                n_buffers=1, chunk_samples=256, fallback_slots=64)),
)


def _fallback_slots(n: int) -> int:
    # Scales with the patch count (ADVICE r2: a fixed 192 sized on one
    # bench image could silently truncate); kept modest because the
    # passthrough gather + scatter of the slots runs even at zero misses.
    return min(n, max(32, n // 64))

# Differentiable batched sampler switch (training warps); see
# extract_patches_batched.
USE_PALLAS_BATCHED = True

# Master switch for the Pallas sampler on the pyramid path.  Tests on the
# CPU backend turn this off globally (interpret-mode one-hot matmuls at
# 1080p are prohibitively slow) and exercise the kernel directly instead.
USE_PALLAS = True

# Shared-window DMA dedup in the Pallas sampler (pallas_patches.py): adjacent
# patches with equal quantized window origins share one DMA.  Hit rate
# depends on input adjacency (multi-scale detections of one corner); the
# flag is a site-wide A/B switch (scripts/bench_dedup.py).
DEDUP_WINDOWS = False

# Sites the dedup applies to when DEDUP_WINDOWS is on.  "desc" is EXCLUDED
# by default: the single-buffered 448x512 tail bucket's dedup chain-select
# overflows the 16 MB scoped-vmem stack by 96 KB (measured r5, exactly the
# ADVICE r4 prediction), and desc patches are extent-sorted — same-corner
# multi-scale duplicates land in different buckets anyway.
DEDUP_SITES = ("shape", "ori")


def extract_patches_pyramid(buf2d: Array, lafs: Array, level_idx: Array,
                            row_offsets: Array, heights: Array,
                            widths: Array, ps: int = 32,
                            align_corners: bool = False,
                            site: str = "desc",
                            mxu_dtype=None,
                            assume_extent_sorted: bool = False,
                            return_miss_overflow: bool = False,
                            fallback_slots=None):
    """Pyramid patch extraction: Pallas gather-as-matmul kernel when enabled,
    else the XLA flat-gather path (both numerically equivalent; see
    tests/test_pallas_patches.py).  ``mxu_dtype=jnp.bfloat16`` selects the
    fast-mode sampler (4x MXU rate, ~1 grey-level patch error).

    ``assume_extent_sorted``: the caller passes LAFs sorted by ascending
    sample extent, enabling the bucketed multi-window path for sites that
    define buckets (currently "desc").  Results stay correct for any order
    (misfits fall back to the exact XLA recompute) but only sorted input
    gets the bucketed speed.

    ``return_miss_overflow``: also return the count of fallback-capacity
    overflows (patches left with truncated samples); callers should warn
    when it is nonzero.

    ``fallback_slots``: override the default miss-capacity sizing; callers
    with unbounded extent distributions (external keypoints, single-level
    images) should pass n so a window miss can never truncate."""
    n = lafs.shape[0]
    slots = _fallback_slots(n) if fallback_slots is None else min(n, int(fallback_slots))
    if USE_PALLAS:
        from .pallas_patches import (extract_patches_bucketed,
                                     extract_patches_window_matmul)
        kw = {} if mxu_dtype is None else {"mxu_dtype": mxu_dtype}
        dedup = DEDUP_WINDOWS and site in DEDUP_SITES
        if assume_extent_sorted and site == "desc":
            patches, ovf = extract_patches_bucketed(
                buf2d, lafs, level_idx, row_offsets, heights, widths,
                ps=ps, align_corners=align_corners, buckets=DESC_BUCKETS,
                fallback_slots=slots, dedup_windows=dedup, **kw)
        else:
            patches, ovf = extract_patches_window_matmul(
                buf2d, lafs, level_idx, row_offsets, heights, widths,
                ps=ps, align_corners=align_corners,
                fallback_slots=slots, dedup_windows=dedup,
                return_miss_overflow=True, **PALLAS_SITES[site], **kw)
        if return_miss_overflow:
            return patches, ovf
        return patches
    patches = extract_patches_from_flat_pyramid(
        buf2d, lafs, level_idx, row_offsets, heights, widths,
        ps=ps, align_corners=align_corners)
    if return_miss_overflow:
        return patches, jnp.zeros((), jnp.int32)
    return patches


def select_levels_for_lafs(dlafs: Array, sigma_pixdist_table: Array,
                           ps: int) -> Array:
    """Choose the flat pyramid level whose effective blur (sigma * pix_dist)
    is closest to scale/PS for each *denormalized* LAF.

    On-device argmin replacing the host scipy.cdist round-trip in
    get_pyramid_and_level_index_for_LAFs (LAF.py:453-472)."""
    A = dlafs[..., :2, :2]
    scales = jnp.sqrt(jnp.abs(A[..., 0, 0] * A[..., 1, 1]
                              - A[..., 0, 1] * A[..., 1, 0]) + 1e-12)
    needed = scales / float(ps)
    d = jnp.abs(sigma_pixdist_table[None, :] - needed[:, None])
    return jnp.argmin(d, axis=1).astype(jnp.int32)
