"""Pallas TPU fused conv for the patch CNNs — eval-mode forward only.

The patch CNNs (AffNet/OriNet/HardNet/TFeat trunks over 2-3k 32x32 patches;
reference workload architectures.py:207-230, HardNet.py:30-101) run at ~10%
MFU under stock lax.conv: 3x3 convs with 16-128 output channels fill only
16-128 of the MXU's 128x128 systolic array, and every XLA-level im2col
reformulation materializes a 9x copy of the activations through HBM (~2 ms
for the 16-ch 32x32 layer alone at v5e bandwidth — measured dead end, see
scripts/bench_conv_formulations.py).

This kernel keeps the im2col in VMEM:

  - activations live FLAT as (C, N*H*W): channels in sublanes, every pixel
    of every patch in lanes (the lane axis is always 128-full);
  - each k x k tap is a `pltpu.roll` of the whole lane axis by the
    flattened offset dr*W + dc, multiplied by a host-constant edge mask
    (one (taps, H*W) pattern tiled over the block) that zeroes exactly the
    positions whose tap falls outside the patch — this also kills the
    circular wrap at block edges, so zero-padding semantics are exact;
  - taps are stacked along sublanes in GROUPS whose contraction depth
    targets 128-256 (e.g. 9 taps x 16 ch = one K=144 matmul; 9 x 64 = three
    K=192 matmuls), each group one MXU dot accumulated in f32 VMEM;
  - bias add + activation fuse in; BatchNorm (eval, affine=False) is folded
    into the weights/bias by the caller (models/cnn.py), so one kernel
    launch per conv layer reads the activations from HBM exactly once and
    writes the layer output exactly once.

Stride-2 layers run at stride 1 here and are downsampled by the caller with
exact one-hot selection matmuls; VALID convs compute the zero-padded
full-size output and the caller crops (models/cnn.py `_apply_spec_flat`).

Numerics: the matmul accumulates in f32 (preferred_element_type) exactly
like the stock path under the pinned f32 matmul precision; parity-tested
against lax.conv for every zoo net (tests/test_models.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Flipped to True by tests/conftest.py on the CPU backend.
INTERPRET = False

# Per-block VMEM budget for choosing patches-per-block (bytes, ~2/3 of the
# 16 MB VMEM so the compiler can double-buffer the streams).
_VMEM_BUDGET = 10 * 2 ** 20
_K_TARGET = 256          # max contraction depth per tap group


def _tap_groups(n_taps: int, c_pad: int):
    """Split tap indices into groups with contraction depth <= _K_TARGET,
    as evenly as possible (keeps every group's K >= 128 when it can)."""
    per = max(1, _K_TARGET // c_pad)
    n_groups = -(-n_taps // per)
    base = n_taps // n_groups
    rem = n_taps % n_groups
    groups = []
    at = 0
    for g in range(n_groups):
        size = base + (1 if g < rem else 0)
        groups.append(list(range(at, at + size)))
        at += size
    return groups


def _conv_kernel(shift_ref, x_ref, w_ref, b_ref, m_ref, o_ref, im_ref, *,
                 n_taps, groups, c_pad, out_ch, act, out_dtype):
    # Mosaic gives every temporary of an UNROLLED loop its own slot on the
    # 16 MB scoped-vmem stack (no reuse — an unrolled 9-tap build OOM'd at
    # C=64), so the tap loop is a TRACED fori_loop: one live rolled
    # temporary, dynamic roll shift from the scalar-prefetch SMEM table,
    # stores into the full-K im2col scratch at a dynamic row offset.
    x = x_ref[...]
    bl = x.shape[1]

    def tap(t, carry):
        xt = pltpu.roll(x, shift_ref[t], 1)
        im_ref[pl.ds(t * c_pad, c_pad), :] = \
            xt * m_ref[pl.ds(t, 1), :].astype(x.dtype)
        return carry

    jax.lax.fori_loop(0, n_taps, tap, 0, unroll=False)

    acc = jnp.zeros((out_ch, bl), jnp.float32)
    for row, k in groups:                       # static row ranges
        acc = acc + jax.lax.dot_general(
            w_ref[:, row:row + k], im_ref[row:row + k, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = acc + b_ref[...]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "tanh":
        y = jnp.tanh(y)
    elif act == "elu":
        y = jnp.where(y > 0, y, jnp.expm1(y))
    o_ref[...] = y.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _edge_masks(kh: int, kw: int, h: int, w: int, pad: int):
    """(kh*kw, h*w) f32: mask[t, y*w+x] = 1 iff tap t of output (y, x) reads
    inside the patch (zero-padding semantics, and it also kills the circular
    wrap of the lane roll at patch/block boundaries)."""
    ys, xs = np.mgrid[0:h, 0:w]
    masks = np.zeros((kh * kw, h * w), np.float32)
    t = 0
    for r in range(kh):
        for s in range(kw):
            dr, dc = r - pad, s - pad
            ok = ((ys + dr >= 0) & (ys + dr < h)
                  & (xs + dc >= 0) & (xs + dc < w))
            masks[t] = ok.reshape(-1)
            t += 1
    return masks


def conv_flat(x_flat: Array, w_hwio: Array, bias, *, img_hw, pad: int,
              act: str = "none", n_patches: int,
              interpret=None) -> Array:
    """Stride-1 zero-padded conv on flat activations.

    x_flat: (C_pad, N*H*W) with C zero-padded up to a multiple of 8.
    w_hwio: (kh, kw, C, O) — O must be a multiple of 8 (trunk layers only;
    heads with O=2/3/5 run as plain XLA matmuls, see models/cnn.py).
    Returns (O, N*H*W) in x_flat.dtype, same spatial extent (caller crops
    for VALID / downsamples for stride 2)."""
    if interpret is None:
        interpret = INTERPRET
    h, w = img_hw
    hw = h * w
    c_pad, total = x_flat.shape
    kh, kw, c, o = w_hwio.shape
    assert o % 8 == 0, "head convs go through the XLA matmul path"
    n_taps = kh * kw

    # Pack weights (O, taps*C_pad) in tap-major order, BN/bias pre-folded.
    wt = jnp.transpose(w_hwio, (3, 0, 1, 2)).reshape(o, n_taps, c)
    if c_pad != c:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, c_pad - c)))
    wt = wt.reshape(o, n_taps * c_pad).astype(x_flat.dtype)
    b = (jnp.zeros((o,), jnp.float32) if bias is None
         else bias.astype(jnp.float32))
    b = jnp.broadcast_to(b[:, None], (o, 1))

    groups = [(g[0] * c_pad, len(g) * c_pad)
              for g in _tap_groups(n_taps, c_pad)]

    # Patches per block under the VMEM budget: x + one live rolled tap +
    # the full-K im2col scratch + masks + f32 accumulator + output, at the
    # actual element size.
    es = jnp.dtype(x_flat.dtype).itemsize
    k_all = n_taps * c_pad
    per_lane = es * (2 * c_pad + k_all + o + n_taps) + 4 * o
    pb = max(1, min(n_patches, _VMEM_BUDGET // (per_lane * hw)))
    while n_patches % pb:
        pb -= 1
    bl = pb * hw

    masks_np = _edge_masks(kh, kw, h, w, pad)
    masks = jnp.asarray(np.tile(masks_np, (1, pb))).astype(x_flat.dtype)

    shifts = np.array(
        [(bl - ((r - pad) * w + (s - pad))) % bl
         for r in range(kh) for s in range(kw)], np.int32)

    kern = functools.partial(
        _conv_kernel, n_taps=n_taps, groups=tuple(groups),
        c_pad=c_pad, out_ch=o, act=act, out_dtype=x_flat.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total // bl,),
        in_specs=[
            pl.BlockSpec((c_pad, bl), lambda i, sh: (0, i)),
            pl.BlockSpec((o, k_all), lambda i, sh: (0, 0)),
            pl.BlockSpec((o, 1), lambda i, sh: (0, 0)),
            pl.BlockSpec((n_taps, bl), lambda i, sh: (0, 0)),
        ],
        out_specs=pl.BlockSpec((o, bl), lambda i, sh: (0, i)),
        scratch_shapes=[pltpu.VMEM((k_all, bl), x_flat.dtype)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((o, total), x_flat.dtype),
        interpret=interpret,
    )(jnp.asarray(shifts), x_flat, wt, b, masks)
