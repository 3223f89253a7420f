"""Affine patch extraction: batched bilinear gather from images or from the
flat pyramid buffer.

TPU-first replacement for the reference's F.affine_grid + chunked
F.grid_sample path (LAF.py:313-372) and for the per-(octave,level)
scatter/gather loop extract_patches_from_pyramid_with_inv_index
(LAF.py:376-404): instead of Python loops over ragged levels, every LAF
carries a flat level id and all patches are sampled by ONE vectorized gather
from a single 1-D HBM buffer holding every pyramid level.

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
from typing import Tuple

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


def _bilinear_gather_flat(buf: Array, off, h, w, u: Array, v: Array) -> Array:
    """Bilinear sample buf[off : off + h*w] viewed as (h, w) at float coords
    (u, v) with zeros padding.  u, v: (PS, PS); h, w, off: scalars (traced)."""
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, wgt):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        vals = jnp.take(buf, off + yc * w + xc, mode="clip")
        return vals * wgt * inb.astype(buf.dtype)

    return (corner(x0i, y0i, (1 - fx) * (1 - fy))
            + corner(x0i + 1, y0i, fx * (1 - fy))
            + corner(x0i, y0i + 1, (1 - fx) * fy)
            + corner(x0i + 1, y0i + 1, fx * fy))


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
def extract_patches_from_flat_pyramid(buf: Array, lafs: Array,
                                      level_idx: Array, offsets: Array,
                                      heights: Array, widths: Array,
                                      ps: int = 32,
                                      align_corners: bool = False) -> Array:
    """Extract (N, PS, PS) patches; LAF i samples pyramid level
    ``level_idx[i]`` (flat index into the offset/height/width tables).

    Replaces extract_patches_from_pyramid_with_inv_index (LAF.py:376-390) +
    get_inverted_pyr_index (LAF.py:392-404) with a single vectorized gather."""
    gx, gy = _base_grid(ps, align_corners, lafs.dtype)

    def one(laf, lvl):
        off = offsets[lvl]
        h = heights[lvl]
        w = widths[lvl]
        u, v = _laf_sample_coords(laf, h, w, gx, gy, align_corners)
        return _bilinear_gather_flat(buf, off, h, w, u, v)

    return jax.vmap(one)(lafs, level_idx)


@partial(jax.jit, static_argnames=("ps", "align_corners"))
def extract_patches(img: Array, lafs: Array, ps: int = 32,
                    align_corners: bool = False) -> Array:
    """Extract (N, PS, PS) patches from a single (H, W) image with normalized
    LAFs.  Equivalent to extract_patches (LAF.py:364-372) without the memory
    chunking (unnecessary on TPU: the whole batch is one gather)."""
    h, w = img.shape
    buf = img.reshape(-1)
    gx, gy = _base_grid(ps, align_corners, lafs.dtype)

    def one(laf):
        u, v = _laf_sample_coords(laf, h, w, gx, gy, align_corners)
        return _bilinear_gather_flat(buf, 0, h, w, u, v)

    return jax.vmap(one)(lafs)


@partial(jax.jit, static_argnames=("ps", "align_corners"))
def extract_patches_batched(imgs: Array, lafs: Array, ps: int = 32,
                            align_corners: bool = False) -> Array:
    """Per-sample extraction: imgs (N, H, W), lafs (N, 2, 3) -> (N, PS, PS).
    Used by the training augmentation path (train_AffNet_test_on_graffity.py:
    176-188) where each LAF warps its own source patch."""
    n, h, w = imgs.shape
    gx, gy = _base_grid(ps, align_corners, lafs.dtype)

    def one(img, laf):
        u, v = _laf_sample_coords(laf, h, w, gx, gy, align_corners)
        return _bilinear_gather_flat(img.reshape(-1), 0, h, w, u, v)

    return jax.vmap(one)(imgs, lafs)


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
