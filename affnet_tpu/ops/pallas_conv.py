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
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Flipped to True by tests/conftest.py on the CPU backend.
INTERPRET = False

# Per-block VMEM budget for choosing patches-per-block (bytes): the 16 MB
# scoped-vmem stack must also hold the per-group matmul/accumulate
# temporaries the per_lane estimate below can't see (measured overrun at a
# 10 MB budget: 17.35M > 16M on the f32 C=64 layer), so leave ~25% slack.
_VMEM_BUDGET = 8 * 2 ** 20
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


def _conv_kernel(x_ref, w_ref, b_ref, m_ref, o_ref, im_ref, *,
                 shifts, groups, c_pad, out_ch, act, out_dtype):
    # Mosaic gives every temporary of an UNROLLED loop its own slot on the
    # 16 MB scoped-vmem stack when they all stay live (a 9-tap concat
    # build OOM'd at C=64), so each rolled tap is STORED into the full-K
    # im2col VMEM scratch immediately — liveness is one rolled temporary
    # + the scratch.  tpu.dynamic_rotate (what pltpu.roll lowers to, even
    # for constant shifts) is unimplemented for 16-bit data on this
    # Mosaic, so the roll happens on an f32 upcast and the masked tap is
    # cast back to the storage dtype — the im2col scratch and the MXU
    # matmuls below stay bf16 in fast mode.
    x = x_ref[...]
    bl = x.shape[1]
    x32 = x.astype(jnp.float32)
    for t, s in enumerate(shifts):
        xt = pltpu.roll(x32, s, 1) if s else x32
        im_ref[t * c_pad:(t + 1) * c_pad, :] = \
            (xt * m_ref[t:t + 1, :].astype(jnp.float32)).astype(x.dtype)

    # bf16 operands must contract at DEFAULT precision: the package-level
    # jax_default_matmul_precision=float32 pin reaches in here, and
    # tpu.matmul with bf16 operands + fp32 contract precision is "Bad lhs
    # type" to Mosaic.  f32 accumulation comes from preferred_element_type.
    prec = (jax.lax.Precision.HIGHEST if out_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = jnp.zeros((out_ch, bl), jnp.float32)
    for row, k in groups:                       # static row ranges
        acc = acc + jax.lax.dot_general(
            w_ref[:, row:row + k], im_ref[row:row + k, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec)
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


def block_patches(dtype, c_pad: int, o: int, n_taps: int, hw: int) -> int:
    """Patches per VMEM block the kernel will use, or 0 if no legal block
    fits the budget.

    Mosaic requires the block lane dim bl = pb*hw to be a multiple of 128,
    so pb must be a multiple of q = 128/gcd(hw, 128); when even the q-patch
    block exceeds the budget (e.g. TFeat's 6x6-tap conv on odd 13x13 maps,
    where q = 128 forces a 47 MB block) there is no legal block and the
    caller must use the stock XLA path for that layer."""
    es = jnp.dtype(dtype).itemsize
    k_all = n_taps * c_pad
    # x (double-buffered across grid steps) + f32 upcast + one live rolled
    # f32 tap + im2col scratch + masks + f32 accumulator + output
    # (double-buffered).
    per_lane = (es * (2 * c_pad + k_all + 2 * o + n_taps)
                + 4 * (2 * c_pad + o))
    q = 128 // math.gcd(hw, 128)
    pb_budget = _VMEM_BUDGET // (per_lane * hw)
    return pb_budget // q * q if pb_budget >= q else 0


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
    # actual element size.  Mosaic requires the block lane dim bl = pb*hw
    # to be a multiple of 128 (interpret mode does NOT check this), so pb
    # is a multiple of 128/gcd(hw, 128) and the patch count is zero-padded
    # up to a whole number of blocks (dead patches are cropped off below).
    k_all = n_taps * c_pad
    pb = block_patches(x_flat.dtype, c_pad, o, n_taps, hw)
    if pb == 0:
        raise ValueError(
            f"conv_flat: no legal VMEM block for c_pad={c_pad} o={o} "
            f"taps={n_taps} hw={hw} — callers must pre-check block_patches")
    n_pad = -(-n_patches // pb) * pb
    if n_pad * hw != total:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, n_pad * hw - total)))
    total_pad = n_pad * hw
    bl = pb * hw

    masks_np = _edge_masks(kh, kw, h, w, pad)
    masks = jnp.asarray(np.tile(masks_np, (1, pb))).astype(x_flat.dtype)

    shifts = tuple(
        (bl - ((r - pad) * w + (s - pad))) % bl
        for r in range(kh) for s in range(kw))

    kern = functools.partial(
        _conv_kernel, shifts=shifts, groups=tuple(groups),
        c_pad=c_pad, out_ch=o, act=act, out_dtype=x_flat.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(total_pad // bl,),
        in_specs=[
            pl.BlockSpec((c_pad, bl), lambda i: (0, i)),
            pl.BlockSpec((o, k_all), lambda i: (0, 0)),
            pl.BlockSpec((o, 1), lambda i: (0, 0)),
            pl.BlockSpec((n_taps, bl), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((o, bl), lambda i: (0, i)),
        scratch_shapes=[pltpu.VMEM((k_all, bl), x_flat.dtype)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((o, total_pad), x_flat.dtype),
        interpret=interpret,
    )(x_flat, wt, b, masks)
    return out[:, :total] if total_pad != total else out
