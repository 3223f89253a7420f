"""Pallas TPU per-row top-m extraction — the first stage of the exact
two-stage global top-k (ops/nms.py:_two_stage_topk).

The detection top-k selects k ~ 2000-16384 keypoints out of the ~8M-element
concatenated NMS response vector (1080p).  Both full-sort ``lax.top_k``
(~18 ms) and the PartialReduce custom call (~14 ms) are ~300x off memory
bandwidth there (34 MB of f32 should stream in ~0.05 ms).  This kernel makes
stage 1 bandwidth-bound: stream row tiles of the (B, S) reshaped response
vector through VMEM once and extract each row's top-m by m rounds of
vectorized (max, first-argmax, mask) on VMEM-resident data, plus the row's
leftover maximum used by the caller's exactness check.

Replaces the reference's per-level torch.topk cascade
(HandCraftedModules.py:259-263, SparseImgRepresenter.py:104-111) at equal
(bit-identical, via the caller's two-key candidate sort + full-sort
fallback) selection semantics.

Layout notes (measured constraints, see CLAUDE.md):
  - Outputs are written one SUBLANE ROW per extraction round — lane-dim
    concatenation of unaligned widths and 1-lane-wide stores do not lower on
    Mosaic, so vals/cols blocks are (m_pad, R) with round j writing row j.
  - Cross-lane reductions (max / min over S) are supported; argmax is
    computed as min(col id where value == row max), which matches
    jnp.argmax's first-maximum tie rule.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

INTERPRET = False

# Rows per grid step: block (ROWS_PER_TILE, S) f32 must fit VMEM with its
# transients (1024-wide rows -> 1 MB resident + masks).
ROWS_PER_TILE = 256


def _row_topm_kernel(x_ref, vals_ref, cols_ref, *, m: int, r: int, s: int):
    cur = x_ref[:]                                           # (R, S)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, s), 1)
    for j in range(m):
        rmax = jnp.max(cur, axis=1, keepdims=True)           # (R, 1)
        ismax = cur >= rmax
        amax = jnp.min(jnp.where(ismax, col, s), axis=1,
                       keepdims=True)                        # first max col
        vals_ref[0, j, :] = rmax[:, 0]
        cols_ref[0, j, :] = amax[:, 0]
        cur = jnp.where(col == amax, -1.0, cur)
    vals_ref[0, m, :] = jnp.max(cur, axis=1)                 # leftover max
    # Fill the sublane-padding rows so every output element is defined.
    m_pad = vals_ref.shape[1]
    for j in range(m + 1, m_pad):
        vals_ref[0, j, :] = jnp.zeros((r,), vals_ref.dtype)
    for j in range(m, m_pad):
        cols_ref[0, j, :] = jnp.zeros((r,), jnp.int32)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _row_topm_call(x2d: Array, m: int, interpret: bool):
    b, s = x2d.shape
    r = ROWS_PER_TILE
    b_pad = -(-b // r) * r
    if b_pad != b:
        x2d = jnp.pad(x2d, ((0, b_pad - b), (0, 0)), constant_values=-1.0)
    t = b_pad // r
    m_pad = -(-(m + 1) // 8) * 8    # vals rows 0..m-1 + leftover row m

    vals3, cols3 = pl.pallas_call(
        functools.partial(_row_topm_kernel, m=m, r=r, s=s),
        grid=(t,),
        in_specs=[pl.BlockSpec((r, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, m_pad, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, m_pad, r), x2d.dtype),
            jax.ShapeDtypeStruct((t, m_pad, r), jnp.int32),
        ],
        interpret=interpret,
    )(x2d)
    return vals3, cols3, b_pad


def row_topm_pallas(x2d: Array, m: int) -> Tuple[Array, Array, Array]:
    """Per-row top-m of a (B, S) array.  Returns (vals (B, m), cols (B, m),
    leftover_max (B,)); identical to ops/nms._row_topm (tie rule: first
    maximum wins), tested in interpret mode on CPU."""
    b = x2d.shape[0]
    vals3, cols3, _ = _row_topm_call(x2d, m, INTERPRET)
    # (T, m_pad, R) -> (T, R, m_pad) -> (B_pad, m_pad)
    vals = vals3.transpose(0, 2, 1).reshape(-1, vals3.shape[1])[:b]
    cols = cols3.transpose(0, 2, 1).reshape(-1, cols3.shape[1])[:b]
    return vals[:, :m], cols[:, :m], vals[:, m]
