"""Fused per-octave detection stencil (Pallas TPU kernel).

Computes, for every center level of one octave, in a single pass over row
tiles of the level images:
  - det-of-Hessian responses (replicate-padded 3-tap stencils) * sigma^4,
    threshold-clamped                      (HandCraftedModules.py:58-78)
  - 3x3x3 scale-space NMS of the center level  (:208-220,248)
  - soft-argmax (sigma, y, x) refinement maps   (:266-290, with the
    reference's biased [-0.5, 0.5, 1.5] offset grid)

Mechanism: the grid runs over row tiles; every level image is passed three
times with shifted index maps (previous/current/next tile of a host-side
replicate-padded buffer) so each kernel instance assembles a (3*TH, W) band
and computes the interior TH rows with the +-2 halo it needs — no manual
DMA, XLA pipelines the tile streams.  Horizontal neighbor access uses
pltpu.roll with edge fixups (Mosaic cannot concatenate unaligned widths
along the lane dimension).

The octave-dedup masking and border zeroing stay outside (elementwise).
Numerics match the unfused ops (ops/hessian.py + ops/nms.py) up to fp
reassociation with IDENTICAL NMS survivor sets; equivalence is tested in
interpret mode on CPU (tests/test_pallas.py) and the detector golden tests
cover end-to-end behavior.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NMS_EPS = 1e-5

# Compiled Pallas requires a TPU; set True to run the kernel through the
# interpreter (tests on the CPU backend set this via conftest).
INTERPRET = False


def _col_ids(rows: int, w: int):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)


def _shift_right(x: Array, fill):
    """out[:, j] = x[:, j-1]; column 0 <- fill (scalar) or x[:, 0] when
    fill is None (replicate)."""
    rolled = pltpu.roll(x, 1, 1)
    col = _col_ids(x.shape[0], x.shape[1])
    edge = x if fill is None else jnp.full_like(x, fill)
    return jnp.where(col == 0, edge, rolled)


def _shift_left(x: Array, fill):
    """out[:, j] = x[:, j+1]; last column <- fill or replicate.
    (pltpu.roll requires non-negative shifts: w-1 == -1 circularly.)"""
    rolled = pltpu.roll(x, x.shape[1] - 1, 1)
    col = _col_ids(x.shape[0], x.shape[1])
    edge = x if fill is None else jnp.full_like(x, fill)
    return jnp.where(col == x.shape[1] - 1, edge, rolled)


def _hessian_rows(band: Array, sigma: float, th: float, out_rows: int,
                  first_row: int) -> Array:
    """det-Hessian response for rows [first_row, first_row + out_rows) of a
    band whose rows already include the +-1 halo; x-direction uses replicate
    padding.  first_row/out_rows static.  Returns (out_rows, W)."""
    seg = band[first_row - 1:first_row - 1 + out_rows + 2]
    left = _shift_right(seg, None)           # x[j-1], replicate edge
    right = _shift_left(seg, None)           # x[j+1], replicate edge
    c = seg[1:-1]
    gxx = left[1:-1] - 2.0 * c + right[1:-1]
    gyy = seg[:-2] - 2.0 * c + seg[2:]
    gx = 0.5 * (left - right)                # 0.5 * (x[j-1] - x[j+1])
    gxy = 0.5 * (gx[:-2] - gx[2:])
    resp = jnp.abs(gxx * gyy - gxy * gxy) * (sigma ** 4)
    return jnp.maximum(resp - th, 0.0)


def _detect_octave_kernel(*refs, n_levels: int, sigmas: Sequence[float],
                          th: float, tile_h: int, height: int):
    """refs = [lvl0_prev, lvl0_cur, lvl0_next, lvl1_prev, ...] inputs, then
    outputs [nmsed_l, sc_l, y_l, x_l for each center level l]."""
    L = n_levels + 2
    ins = refs[:3 * L]
    outs = refs[3 * L:]
    i = pl.program_id(0)
    w = ins[0].shape[1]

    # The host replicate-pads one tile above and below the image, so each
    # band is exactly rows [i*tile_h - tile_h, i*tile_h + 2*tile_h) with
    # correct replicate halos; band rows [tile_h, 2*tile_h) are the tile's
    # real rows.
    bands = [jnp.concatenate([ins[3 * l][:], ins[3 * l + 1][:],
                              ins[3 * l + 2][:]], axis=0)
             for l in range(L)]

    # Responses for the tile rows +-1 halo: rows [tile_h-1, 2*tile_h+1).
    resp = [_hessian_rows(bands[l], sigmas[l], th, tile_h + 2, tile_h - 1)
            for l in range(L)]
    # Rows beyond the image carry replicate garbage; zero them so NMS and
    # the soft-argmax denominators see zero response there (matching the
    # unfused zero/ -inf padding semantics: responses are >= 0, so a zero
    # neighbor never changes a max that already includes the pixel itself).
    rrow = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, w), 0) \
        + i * tile_h - 1
    valid = (rrow >= 0) & (rrow <= height - 1)
    resp = [jnp.where(valid, r, 0.0) for r in resp]

    for lc in range(1, L - 1):
        low, cur, high = resp[lc - 1], resp[lc], resp[lc + 1]
        m = jnp.maximum(jnp.maximum(low, cur), high)
        # 3x3 max over the (tile_h+2)-row band -> interior tile_h rows.
        mp_rows = jnp.maximum(jnp.maximum(m[:-2], m[1:-1]), m[2:])
        mp = jnp.maximum(jnp.maximum(_shift_right(mp_rows, -jnp.inf),
                                     mp_rows),
                         _shift_left(mp_rows, -jnp.inf))
        cc = cur[1:-1]
        nmsed = ((cc - mp + NMS_EPS) > 0).astype(cc.dtype) * cc

        # Soft-argmax accumulators over the 3x3x3 cube (zero spatial pad).
        def shifts(mm):
            rows = [mm[:-2], mm[1:-1], mm[2:]]
            s = jnp.zeros((tile_h, w), mm.dtype)
            sy = jnp.zeros((tile_h, w), mm.dtype)
            sx = jnp.zeros((tile_h, w), mm.dtype)
            for di, r in enumerate(rows):
                c0 = _shift_right(r, 0.0)    # resp at column j-1
                c2 = _shift_left(r, 0.0)     # resp at column j+1
                rsum = c0 + r + c2
                s += rsum
                sy += (di - 0.5) * rsum
                sx += (-0.5 * c0 + 0.5 * r + 1.5 * c2)
            return s, sy, sx

        den = jnp.zeros((tile_h, w), cc.dtype)
        num_z = jnp.zeros((tile_h, w), cc.dtype)
        num_y = jnp.zeros((tile_h, w), cc.dtype)
        num_x = jnp.zeros((tile_h, w), cc.dtype)
        for off, mm in zip(sigmas[lc - 1:lc + 2], (low, cur, high)):
            s, sy, sx = shifts(mm)
            den += s
            num_z += off * s
            num_y += sy
            num_x += sx
        den = den + 1e-8
        tile_row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0) \
            + i * tile_h
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1)
        min_size = float(min(height, w))
        o = 4 * (lc - 1)
        outs[o][:] = nmsed
        outs[o + 1][:] = (num_z / den) / min_size
        outs[o + 2][:] = (num_y / den + tile_row.astype(cc.dtype)) \
            / float(height)
        outs[o + 3][:] = (num_x / den + col.astype(cc.dtype)) / float(w)


def detect_octave_fused(levels: List[Array], sigmas: Sequence[float],
                        th: float, tile_h: int = 32,
                        interpret: bool = None):
    """Run the fused detection stencil on one octave's level images.

    levels: list of (H, W) images (len == n_levels + 2).
    Returns per center level: (nmsed_pre_octmap, sc, y, x) maps — the caller
    applies the border mask and octave-dedup sequence (ops/nms.py).
    """
    if interpret is None:
        interpret = INTERPRET
    L = len(levels)
    n_levels = L - 2
    h, w = levels[0].shape
    n_tiles = pl.cdiv(h, tile_h)
    pad_h = n_tiles * tile_h

    # Replicate-pad one tile above (row 0) and pad below to pad_h + tile_h
    # with the last row, so halo blocks always exist with replicate
    # semantics (the kernel masks below-image responses to zero anyway).
    padded = [jnp.concatenate([
        jnp.broadcast_to(lvl[0:1, :], (tile_h, w)),
        lvl,
        jnp.broadcast_to(lvl[-1:, :], (pad_h + tile_h - h, w)),
    ], axis=0) for lvl in levels]

    in_specs = []
    inputs = []
    for lvl in padded:
        for shift in (0, 1, 2):
            in_specs.append(pl.BlockSpec(
                (tile_h, w),
                functools.partial(lambda i, s: (i + s, 0), s=shift),
                memory_space=pltpu.VMEM))
            inputs.append(lvl)

    out_specs = []
    out_shapes = []
    for _ in range(n_levels):
        for _ in range(4):
            out_specs.append(pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((pad_h, w),
                                                   levels[0].dtype))

    kernel = functools.partial(_detect_octave_kernel, n_levels=n_levels,
                               sigmas=tuple(float(s) for s in sigmas),
                               th=float(th), tile_h=tile_h, height=h)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)

    results = []
    for lc in range(n_levels):
        group = tuple(o[:h] for o in outs[4 * lc:4 * lc + 4])
        results.append(group)
    return results
