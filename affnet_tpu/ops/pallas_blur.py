"""Pallas TPU separable Gaussian blur — the pyramid construction hot path.

The XLA shifted-slice formulation (ops/scalespace.gaussian_blur) is
semantically right but compiles into fusions that run ~50-100x off memory
bandwidth at 1080p (measured round 3: 5.0 ms for the initial blur and
1.4-1.7 ms per level blur; the whole pyramid should stream at HBM rate).
This kernel does one level blur in a single pass over row tiles:

  - grid over row tiles; each kernel instance sees (prev, cur, next) tiles
    of a host-side replicate-padded buffer (the pallas_detect tile pattern),
    so vertical taps are static sublane slices with exact replicate
    semantics — the input level is read from HBM, so its replicate rows are
    true replicas (no chained-boundary approximation).
  - horizontal taps are pltpu.roll lane shifts with static edge fixups
    (columns before/after the image take the replicated edge column),
    matching GaussianBlur's replicate padding (Utils.py:150-166).

Numerics: same 1-D taps (scalespace.gauss_kernel_1d), same horizontal-then-
vertical order, same accumulation order over taps as the XLA path — equal up
to fp reassociation inside XLA fusions (tested at 1e-5).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

INTERPRET = False

TILE_H = 128


def _col_ids(rows: int, w: int):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)


def _shift(x: Array, off: int) -> Array:
    """out[:, j] = x[:, j + off] with replicate at the image edges.
    (pltpu.roll requires non-negative shifts: j+off == j-(w-off) circularly.)"""
    w = x.shape[1]
    if off == 0:
        return x
    col = _col_ids(x.shape[0], w)
    if off < 0:                       # take from the left; fix left edge
        rolled = pltpu.roll(x, -off, 1)
        edge = jnp.broadcast_to(x[:, 0:1], x.shape)
        return jnp.where(col < -off, edge, rolled)
    rolled = pltpu.roll(x, w - off, 1)
    edge = jnp.broadcast_to(x[:, w - 1:w], x.shape)
    return jnp.where(col >= w - off, edge, rolled)


def _blur_kernel(prev_ref, cur_ref, next_ref, out_ref, *, taps, tile_h: int):
    """taps: static tuple of 1-D kernel weights (odd length, pad = len//2).
    Band rows [tile_h - pad, 2*tile_h + pad) feed the horizontal pass; the
    vertical pass reduces them to the tile's rows with static slices."""
    pad = len(taps) // 2
    band = jnp.concatenate([prev_ref[:], cur_ref[:], next_ref[:]], axis=0)
    seg = band[tile_h - pad:2 * tile_h + pad]      # (tile_h + 2*pad, W)
    h = taps[0] * _shift(seg, -pad)
    for t in range(1, len(taps)):
        h = h + taps[t] * _shift(seg, t - pad)
    v = taps[0] * h[0:tile_h]
    for t in range(1, len(taps)):
        v = v + taps[t] * h[t:t + tile_h]
    out_ref[:] = v


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def _blur_call(img: Array, taps, interpret: bool) -> Array:
    h, w = img.shape
    tile_h = TILE_H
    n_tiles = pl.cdiv(h, tile_h)
    pad_h = n_tiles * tile_h
    # One replicate tile above; pad below to pad_h + tile_h with the last
    # row so halo blocks always exist (pallas_detect padding pattern).
    padded = jnp.concatenate([
        jnp.broadcast_to(img[0:1, :], (tile_h, w)),
        img,
        jnp.broadcast_to(img[-1:, :], (pad_h + tile_h - h, w)),
    ], axis=0)
    out = pl.pallas_call(
        functools.partial(_blur_kernel, taps=taps, tile_h=tile_h),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_h, w), img.dtype),
        interpret=interpret,
    )(padded, padded, padded)
    return out[:h]


def gaussian_blur_pallas(img: Array, sigma: float, py2: bool = False,
                         interpret: bool | None = None) -> Array:
    """Drop-in replacement for scalespace.gaussian_blur on (H, W) images."""
    from .scalespace import gauss_kernel_1d
    if interpret is None:
        interpret = INTERPRET
    k = gauss_kernel_1d(sigma, py2=py2)
    # Vertical tap rows must stay inside the 3-tile band (pad <= TILE_H) and
    # horizontal taps inside the row width (pltpu.roll shifts must be
    # non-negative: w - off < 0 when the radius exceeds the image width).
    if (len(k) // 2 > TILE_H or len(k) // 2 >= img.shape[1]
            or img.shape[0] < 2 or img.shape[1] < 2):
        from .scalespace import gaussian_blur_xla
        return gaussian_blur_xla(img, sigma, py2=py2)
    return _blur_call(img, tuple(float(t) for t in k), interpret)


# ---------------------------------------------------------------------------
# Stride-2 downsample without lane-strided slicing
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sel_np(w: int) -> np.ndarray:
    """Host-built one-hot (w, ceil(w/2)) column-selection matrix; embedding
    it as an HLO constant matters — an .at[].set() scatter inside jit is NOT
    constant-folded and cost ~1 ms per call at 1080p (measured)."""
    w2 = (w + 1) // 2
    sel = np.zeros((w, w2), np.float32)
    sel[2 * np.arange(w2), np.arange(w2)] = 1.0
    return sel


@functools.partial(jax.jit, static_argnames=())
def downsample2_matmul(img: Array) -> Array:
    """Stride-2 point sampling (== avg_pool2d(k=1, s=2),
    HandCraftedModules.py:47) as a one-hot column-selection matmul.

    Lane-strided XLA slicing (x[:, 0::2]) costs ~2.7 ns/element on TPU (like
    a gather; 1.3 ms at 1080p).  A one-hot f32 matmul streams at MXU rate
    and is EXACT under the package-wide float32 matmul precision (each
    output is 1.0 * x with the multiword f32 emulation accumulating in f32).
    Rows use a plain stride-2 sublane slice (cheap)."""
    h, w = img.shape
    rows = img[::2, :]
    return jnp.dot(rows, jnp.asarray(_sel_np(w), img.dtype))
