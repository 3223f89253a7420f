"""Functional CNN machinery: spec-driven conv stacks with explicit param
pytrees (no framework modules — plain jit/vmap/pjit-composable functions).

Each network is described by a layer ``spec`` (tuple of Layer records) whose
order mirrors the reference's ``nn.Sequential`` indices exactly, which makes
torch ``state_dict`` conversion a mechanical walk (see
:mod:`affnet_tpu.models.convert`).

Conventions:
  - activations NHWC, weights HWIO (TPU-native layouts)
  - BatchNorm(affine=False) eval: (x - mean) / sqrt(var + 1e-5)
    (torch defaults; reference uses affine=False everywhere)
  - train-mode BN normalizes with biased batch stats and updates running
    stats with momentum 0.1 and *unbiased* variance (torch semantics)
  - per-patch input standardization uses the unbiased std + 1e-7
    (reference ``input_norm``, e.g. architectures.py:235-239)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

# Conv backward strategy for training compiles on the remote TPU compile
# service, where XLA's gradient-conv patterns are pathologically slow to
# compile when fused with surrounding BN/relu ops (measured: NCHW conv
# backward 1.6 s bare, 15-20 s fused; a full AffNet+HardNet train step
# ~45 min).  "explicit" routes conv gradients through a custom VJP whose
# dx/dw are hand-written PLAIN forward convs wrapped in optimization
# barriers, so each compiles as an isolated, ordinary conv.
#   "xla"      — stock jax AD (default)
#   "explicit" — custom-VJP convs (training-path f32 convs only)
CONV_VJP = "xla"


# ---------------------------------------------------------------------------
# Layer spec records
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Conv:
    in_ch: int
    out_ch: int
    k: int                       # square kernel; (kh, kw) via k_hw
    stride: int = 1
    pad: int = 0
    bias: bool = False
    k_hw: Optional[Tuple[int, int]] = None

    @property
    def kernel_hw(self) -> Tuple[int, int]:
        return self.k_hw if self.k_hw is not None else (self.k, self.k)


@dataclasses.dataclass(frozen=True)
class BN:
    ch: int


@dataclasses.dataclass(frozen=True)
class ReLU:
    pass


@dataclasses.dataclass(frozen=True)
class Tanh:
    pass


@dataclasses.dataclass(frozen=True)
class ELU:
    pass


@dataclasses.dataclass(frozen=True)
class Dropout:
    p: float


@dataclasses.dataclass(frozen=True)
class AvgPoolGlobal:
    """AdaptiveAvgPool2d(1)."""


@dataclasses.dataclass(frozen=True)
class MaxPool:
    k: int
    stride: int
    pad: int = 0


Layer = Any
Spec = Tuple[Layer, ...]


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_explicit(x: Array, w_oihw: Array, stride: int, pad: int) -> Array:
    """NCHW x, OIHW w, symmetric int padding: stock forward, hand-written
    backward.  The VJPs are expressed as PLAIN forward convs (the zero
    insertion XLA would do via lhs/rhs_dilation is identical here, but
    spelled so the compile service sees ordinary conv patterns) and wrapped
    in optimization barriers so they cannot fuse into the 15-20 s/conv
    conv+BN backward clusters (see CONV_VJP)."""
    return jax.lax.conv_general_dilated(
        x, w_oihw, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def _conv_explicit_fwd(x, w_oihw, stride, pad):
    return _conv_explicit(x, w_oihw, stride, pad), (x, w_oihw)


def _conv_explicit_bwd(stride, pad, res, g):
    x, w = res
    g, = jax.lax.optimization_barrier((g,))
    n, ci, h, wd = x.shape
    o, _, kh, kw = w.shape
    hp, wp = g.shape[2], g.shape[3]
    s = stride

    # dx: conv of the s-dilated cotangent with the spatially-flipped,
    # O<->I-transposed kernel, stride 1.
    w_flip = jnp.transpose(w[:, :, ::-1, ::-1], (1, 0, 2, 3))  # (I, O, kh, kw)
    pad_h = (kh - 1 - pad, h - ((hp - 1) * s + 1) + pad)
    pad_w = (kw - 1 - pad, wd - ((wp - 1) * s + 1) + pad)
    dx = jax.lax.conv_general_dilated(
        g, w_flip, window_strides=(1, 1), padding=[pad_h, pad_w],
        lhs_dilation=(s, s), dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)

    # dw: batch dim becomes the contraction; x plays lhs with its channel
    # dim as "batch", g plays rhs s-dilated.  Output (C_in, O, kh, kw).
    pad_h2 = (pad, (hp - 1) * s + kh - h - pad)
    pad_w2 = (pad, (wp - 1) * s + kw - wd - pad)
    dw_cio = jax.lax.conv_general_dilated(
        x, g, window_strides=(1, 1), padding=[pad_h2, pad_w2],
        rhs_dilation=(s, s), dimension_numbers=("CNHW", "IOHW", "NCHW"),
        preferred_element_type=jnp.float32)
    dw = jnp.transpose(dw_cio, (1, 0, 2, 3))
    dx, dw = jax.lax.optimization_barrier((dx, dw))
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv_explicit.defvjp(_conv_explicit_fwd, _conv_explicit_bwd)


def conv2d(x: Array, w: Array, b: Optional[Array], stride: int, pad,
           compute_dtype=None, keep_compute_dtype: bool = False) -> Array:
    """x NCHW, w HWIO (stored layout; transposed to OIHW at trace time);
    pad is an int (symmetric zeros) or 'VALID'.

    NCHW internally: on this TPU stack the NHWC conv BACKWARD takes ~150 s
    PER CONV to compile (measured; NCHW: 1.6 s), so the whole CNN path runs
    channels-first.

    ``compute_dtype`` (e.g. jnp.bfloat16) casts the conv INPUTS only — the
    MXU accumulates and returns float32 (explicit-dtype speed policy; see
    affnet_tpu.__init__)."""
    if isinstance(pad, int):
        padding = [(pad, pad), (pad, pad)]
        pad_int = pad
    else:
        padding = pad
        pad_int = 0 if pad == "VALID" else None
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        if keep_compute_dtype:
            # Fast-mode EVAL keeps activations in compute_dtype end-to-end
            # (f32 MXU accumulation, rounded on output): f32 inter-layer
            # activations doubled HBM traffic and measured the isolated
            # AffNet trunk at 2.3 ms vs the 1.4 ms bf16-chain floor
            # (scripts/bench_cnn_stage.py / bench_conv_formulations.py).
            out_dtype = compute_dtype
    if CONV_VJP == "explicit" and compute_dtype is None and pad_int is not None:
        y = _conv_explicit(x, jnp.transpose(w, (3, 2, 0, 1)), stride,
                           pad_int).astype(out_dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(w, (3, 2, 0, 1)),
            window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(out_dtype)
    if b is not None:
        y = y + b[None, :, None, None].astype(out_dtype)
    return y


# Eval-mode conv formulation.  "nchw" = stock lax.conv (channels-first).
# "cnhw" = transposed im2col: activations live as (C, N, H, W) end-to-end
# and every conv is one matmul (O, kh*kw*C) @ (kh*kw*C, N*H*W) — pixels
# fill the 128 MXU lanes completely and the contraction depth is kh*kw*C
# (144-4096 here) instead of C_out (16-128) lanes, which left the stock
# formulations at ~10% MFU on the 32x32-patch CNNs (VERDICT r3 Weak #1).
# Stride-2 convs run at stride 1 and downsample through exact host-constant
# one-hot selection matmuls (lane-strided slicing costs ~2.7 ns/element on
# TPU; the extra conv FLOPs are noise at these sizes).  Eval only — the
# training path keeps lax.conv (its backward patterns are what the custom
# VJP machinery above targets).  Env override AFFNET_EVAL_CONV for A/B
# measurement without code edits.
EVAL_CONV_LAYOUT = os.environ.get("AFFNET_EVAL_CONV", "nchw")


def conv_cnhw(x: Array, w: Array, b: Optional[Array], stride: int,
              pad: int) -> Array:
    """x (C, N, H, W), w HWIO -> (O, N, Hout, Wout) via transposed im2col."""
    c, n, h, wd = x.shape
    kh, kw, _, o = w.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    hs = h + 2 * pad - kh + 1            # stride-1 output extent
    ws = wd + 2 * pad - kw + 1
    taps = [x[:, :, r:r + hs, s:s + ws]
            for r in range(kh) for s in range(kw)]
    xim = jnp.concatenate(taps, axis=0).reshape(kh * kw * c, n * hs * ws)
    wt = jnp.transpose(w, (3, 0, 1, 2)).reshape(o, kh * kw * c).astype(x.dtype)
    y = jnp.dot(wt, xim, preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(o, n, hs, ws)
    if stride == 2:
        y = _downsample2_onehot(y)
    elif stride != 1:
        raise NotImplementedError(f"stride {stride}")
    if b is not None:
        y = y + b[:, None, None, None].astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _onehot_even(full: int, dtype_name: str):
    sel = np.zeros((full, (full + 1) // 2), np.float32)
    idx = np.arange(0, full, 2)
    sel[idx, np.arange(idx.size)] = 1.0
    return jnp.asarray(sel, dtype=dtype_name)


def _downsample2_onehot(y: Array) -> Array:
    """(O, N, H, W) -> even rows/cols via exact one-hot selection matmuls."""
    o, n, h, wd = y.shape
    y = jnp.einsum("onhw,wx->onhx", y, _onehot_even(wd, jnp.dtype(y.dtype).name))
    y = jnp.einsum("onhx,hg->ongx", y, _onehot_even(h, jnp.dtype(y.dtype).name))
    return y


def _maxpool2_cnhw(x: Array) -> Array:
    """2x2/stride-2 max pool on (C, N, H, W) without strided slicing: the
    stride-1 4-way shifted max, then even-index one-hot downsample."""
    m = jnp.maximum(jnp.maximum(x[:, :, :-1, :-1], x[:, :, 1:, :-1]),
                    jnp.maximum(x[:, :, :-1, 1:], x[:, :, 1:, 1:]))
    return _downsample2_onehot(m)


def batchnorm_eval(x: Array, mean: Array, var: Array) -> Array:
    """x NCHW; stats per channel.  The per-channel scale/shift are computed
    in f32 and cast to x.dtype so a bf16 activation chain stays bf16."""
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (x - mean[None, :, None, None].astype(x.dtype)) \
        * inv[None, :, None, None].astype(x.dtype)


def batchnorm_train(x: Array, mean: Array, var: Array):
    """x NCHW.  Returns (normalized, new_running_mean, new_running_var)."""
    axes = (0, 2, 3)
    m = jnp.mean(x, axes)
    v = jnp.mean((x - m[None, :, None, None]) ** 2, axes)   # biased
    n = x.shape[0] * x.shape[2] * x.shape[3]
    v_unbiased = v * n / max(n - 1, 1)
    y = (x - m[None, :, None, None]) \
        * jax.lax.rsqrt(v + BN_EPS)[None, :, None, None]
    new_mean = (1 - BN_MOMENTUM) * mean + BN_MOMENTUM * m
    new_var = (1 - BN_MOMENTUM) * var + BN_MOMENTUM * v_unbiased
    return y, new_mean, new_var


def input_norm(x: Array, detach: bool = True) -> Array:
    """Per-sample standardization over all pixels, unbiased std + 1e-7.
    Reference: architectures.py:235-239 / HardNet.py:92-96.

    The 1e-12 inside the sqrt is below f32 resolution for any non-constant
    patch (forward bitwise unchanged vs the torch oracle) but keeps the
    NON-detached backward finite on an exactly-constant patch: d sqrt(s)/ds
    at s=0 is inf, and inf * (ds/dx = 0) = NaN — one fully-out-of-bounds
    rewarped patch NaN'd the whole r4 training step through TFeat's
    detach=False input norm (the torch reference has the same hazard;
    .std() backward at zero variance is NaN there too)."""
    n = x.shape[0]
    flat = x.reshape(n, -1)
    mp = jnp.mean(flat, axis=1)
    d = flat - mp[:, None]
    denom = max(flat.shape[1] - 1, 1)
    sp = jnp.sqrt(jnp.sum(d * d, axis=1) / denom + 1e-12) + 1e-7
    if detach:
        mp = jax.lax.stop_gradient(mp)
        sp = jax.lax.stop_gradient(sp)
    shape = (n,) + (1,) * (x.ndim - 1)
    return (x - mp.reshape(shape)) / sp.reshape(shape)


def l2norm(x: Array, eps: float = 1e-10) -> Array:
    """Row-wise L2 normalization (Utils.py:68-75)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=1) + eps)
    return x / norm[:, None]


def l1norm(x: Array, eps: float = 1e-10) -> Array:
    """Row-wise L1 normalization (Utils.py:77-84)."""
    norm = jnp.sum(jnp.abs(x), axis=1) + eps
    return x / norm[:, None]


# ---------------------------------------------------------------------------
# Spec-driven init / apply
# ---------------------------------------------------------------------------

def _orthogonal(key, shape_oihw: Tuple[int, ...], gain: float) -> np.ndarray:
    """torch-style orthogonal init on an OIHW conv weight."""
    o = shape_oihw[0]
    f = int(np.prod(shape_oihw[1:]))
    a = jax.random.normal(key, (max(o, f), min(o, f)))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if o < f:
        q = q.T
    return (gain * q[:o, :f]).reshape(shape_oihw)


def init_params(key, spec: Spec, gain: float = 0.8,
                last_gain: float = 1.0,
                last_bias: Optional[Sequence[float]] = None,
                bias_const: float = 0.01) -> Params:
    """Initialize params for a spec.  Mirrors the reference weights_init:
    orthogonal(gain) everywhere, the final 8x8 conv gets gain ``last_gain``
    and its bias set to ``last_bias`` (architectures.py:240-247 etc.)."""
    params: Params = {}
    convs = [i for i, l in enumerate(spec) if isinstance(l, Conv)]
    last_conv = convs[-1] if convs else -1
    for i, layer in enumerate(spec):
        if isinstance(layer, Conv):
            key, sub = jax.random.split(key)
            kh, kw = layer.kernel_hw
            g = last_gain if (i == last_conv and last_bias is not None) else gain
            w = _orthogonal(sub, (layer.out_ch, layer.in_ch, kh, kw), g)
            w = jnp.transpose(jnp.asarray(w, jnp.float32), (2, 3, 1, 0))
            p = {"w": w}
            if layer.bias:
                if i == last_conv and last_bias is not None:
                    p["b"] = jnp.asarray(np.array(last_bias, np.float32))
                else:
                    p["b"] = jnp.full((layer.out_ch,), bias_const, jnp.float32)
            params[f"layer{i}"] = p
        elif isinstance(layer, BN):
            params[f"layer{i}"] = {
                "mean": jnp.zeros((layer.ch,), jnp.float32),
                "var": jnp.ones((layer.ch,), jnp.float32),
            }
    return params


def apply_spec(spec: Spec, params: Params, x: Array, *,
               train: bool = False, rng=None, compute_dtype=None):
    """Run the layer stack on NHWC input.  Returns (features, new_params)
    where new_params carries updated BN running stats when train=True
    (otherwise it is ``params`` unchanged).

    Eval with a compute_dtype keeps the activation chain in that dtype
    (f32 MXU accumulation per conv); the caller casts the features back.
    Training keeps f32 activations — the bf16 chain is an inference-speed
    path and BN batch stats / gradients stay full precision."""
    if not train and EVAL_CONV_LAYOUT == "cnhw":
        return _apply_spec_cnhw(spec, params, x, compute_dtype), params
    if not train and EVAL_CONV_LAYOUT == "flat" and x.shape[1] == 1:
        return _apply_spec_flat(spec, params, x, compute_dtype), params
    keep = compute_dtype is not None and not train
    if keep:
        x = x.astype(compute_dtype)
    new_params = dict(params) if train else params
    for i, layer in enumerate(spec):
        name = f"layer{i}"
        if isinstance(layer, Conv):
            p = params[name]
            x = conv2d(x, p["w"], p.get("b"), layer.stride,
                       layer.pad if layer.pad > 0 else "VALID",
                       compute_dtype=compute_dtype, keep_compute_dtype=keep)
        elif isinstance(layer, BN):
            p = params[name]
            if train:
                x, nm, nv = batchnorm_train(x, p["mean"], p["var"])
                new_params[name] = {"mean": nm, "var": nv}
            else:
                x = batchnorm_eval(x, p["mean"], p["var"])
        elif isinstance(layer, ReLU):
            x = jnp.maximum(x, 0.0)
        elif isinstance(layer, Tanh):
            x = jnp.tanh(x)
        elif isinstance(layer, ELU):
            x = jax.nn.elu(x)
        elif isinstance(layer, Dropout):
            if train and rng is not None and layer.p > 0:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - layer.p, x.shape)
                x = jnp.where(keep, x / (1.0 - layer.p), 0.0)
        elif isinstance(layer, AvgPoolGlobal):
            x = jnp.mean(x, axis=(2, 3), keepdims=True)
        elif isinstance(layer, MaxPool):
            pad = [(layer.pad, layer.pad), (layer.pad, layer.pad)]
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, 1, layer.k, layer.k), (1, 1, layer.stride, layer.stride),
                [(0, 0), (0, 0)] + pad)
        else:
            raise TypeError(f"Unknown layer {layer!r}")
    return x, new_params


def _onehot_first(full: int, keep: int, dtype_name: str):
    sel = np.zeros((full, keep), np.float32)
    sel[np.arange(keep), np.arange(keep)] = 1.0
    return jnp.asarray(sel, dtype=dtype_name)


def _apply_spec_flat(spec: Spec, params: Params, x: Array,
                     compute_dtype=None) -> Array:
    """Eval-only layer stack through the Pallas fused conv
    (ops/pallas_conv.py): activations flat as (C_pad, N*H*W), one kernel
    launch per trunk conv with the following eval-BN folded into the
    weights and the following activation fused in.  Full-cover VALID convs
    (the 8x8 descriptor heads) run as one XLA matmul with contraction
    depth kh*kw*C (512-8192).  Layers the flat layout doesn't cover (tiny
    odd-shaped heads like OriNet's pad-1 4x4, global pools, trailing BNs)
    fall back to the stock NCHW loop on the un-flattened remainder.
    Takes NCHW input, returns NCHW features like the stock path."""
    from ..ops import pallas_conv

    n, c, h, w = x.shape
    assert c == 1, "patch CNNs are single-channel at the input"
    dt = compute_dtype if compute_dtype is not None else x.dtype
    xf = x.astype(dt).reshape(1, n * h * w)
    c_pad = 8
    xf = jnp.pad(xf, ((0, c_pad - 1), (0, 0)))
    dname = jnp.dtype(dt).name

    i = 0
    head = None                      # set when the head matmul consumed a conv
    while i < len(spec):
        layer = spec[i]
        if isinstance(layer, Conv):
            kh, kw = layer.kernel_hw
            p = params[f"layer{i}"]
            wgt = p["w"].astype(jnp.float32)
            bias = p.get("b")
            bias = (jnp.zeros((layer.out_ch,), jnp.float32) if bias is None
                    else bias.astype(jnp.float32))
            # Peephole: fold an eval BatchNorm right after the conv, then
            # fuse a following elementwise activation into the kernel.
            j = i + 1
            if j < len(spec) and isinstance(spec[j], BN):
                bp = params[f"layer{j}"]
                scale = jax.lax.rsqrt(bp["var"] + BN_EPS)
                wgt = wgt * scale[None, None, None, :]
                bias = (bias - bp["mean"]) * scale
                j += 1
            act = "none"
            if j < len(spec) and isinstance(spec[j], (ReLU, Tanh, ELU)):
                act = {ReLU: "relu", Tanh: "tanh", ELU: "elu"}[type(spec[j])]
                j += 1
            if (kh == kw == h == w and layer.pad == 0 and layer.stride == 1):
                # Full-cover VALID head: one matmul (O, hw*C) @ (hw*C, N).
                cin = layer.in_ch
                xk = xf[:cin].reshape(cin, n, h * w)
                xk = jnp.transpose(xk, (2, 0, 1)).reshape(h * w * cin, n)
                wk = wgt.reshape(kh * kw * cin, layer.out_ch).T.astype(dt)
                y = jnp.dot(wk, xk.astype(dt),
                            preferred_element_type=jnp.float32)
                y = y + bias[:, None]
                if act == "relu":
                    y = jnp.maximum(y, 0.0)
                elif act == "tanh":
                    y = jnp.tanh(y)
                elif act == "elu":
                    y = jax.nn.elu(y)
                head = y.astype(dt)          # (O, N)
                c, h, w = layer.out_ch, 1, 1
                i = j
                continue
            if (layer.out_ch % 8 or kh != kw or layer.stride not in (1, 2)
                    or kh >= min(h, w)
                    or pallas_conv.block_patches(
                        dt, c_pad, layer.out_ch, kh * kw, h * w) == 0):
                break                         # stock tail handles the rest
            xf = pallas_conv.conv_flat(
                xf, wgt.astype(dt), bias, img_hw=(h, w), pad=layer.pad,
                act=act, n_patches=n)
            c = layer.out_ch
            c_pad = c
            if layer.pad == 0:               # VALID: crop the SAME output
                ho, wo = h - kh + 1, w - kw + 1
                y4 = xf.reshape(c, n, h, w)
                y4 = jnp.einsum("cnhw,wx->cnhx", y4,
                                _onehot_first(w, wo, dname))
                y4 = jnp.einsum("cnhx,hg->cngx", y4,
                                _onehot_first(h, ho, dname))
                h, w = ho, wo
                xf = y4.reshape(c, n * h * w)
            if layer.stride == 2:
                y4 = _downsample2_onehot(xf.reshape(c, n, h, w))
                c, n_, h, w = y4.shape
                xf = y4.reshape(c, n * h * w)
            i = j
        elif isinstance(layer, MaxPool) and \
                (layer.k, layer.stride, layer.pad) == (2, 2, 0):
            y4 = _maxpool2_cnhw(xf.reshape(c, n, h, w))
            h, w = y4.shape[2], y4.shape[3]
            xf = y4.reshape(c, n * h * w)
            i += 1
        elif isinstance(layer, Dropout):
            i += 1
        else:
            break

    # Un-flatten and run any remaining layers through the stock loop.
    if head is not None:
        x_tail = head.T.reshape(n, c, 1, 1)
    else:
        x_tail = jnp.transpose(xf[:c].reshape(c, n, h, w), (1, 0, 2, 3))
    if i < len(spec):
        old = globals()["EVAL_CONV_LAYOUT"]
        try:
            globals()["EVAL_CONV_LAYOUT"] = "nchw"
            x_tail, _ = apply_spec(spec[i:], _shift_params(params, i),
                                   x_tail, train=False,
                                   compute_dtype=compute_dtype)
        finally:
            globals()["EVAL_CONV_LAYOUT"] = old
    return x_tail


def _shift_params(params: Params, offset: int) -> Params:
    """Re-key layer params so spec[offset:] lines up with layer0..."""
    out = {}
    for k, v in params.items():
        if k.startswith("layer"):
            idx = int(k[5:]) - offset
            if idx >= 0:
                out[f"layer{idx}"] = v
    return out


def _apply_spec_cnhw(spec: Spec, params: Params, x: Array,
                     compute_dtype=None) -> Array:
    """Eval-only layer stack in the transposed (C, N, H, W) layout (see
    EVAL_CONV_LAYOUT).  Numerics: each conv is the same f32-accumulated
    contraction as lax.conv under the pinned f32 matmul precision; outputs
    match the nchw path to f32 round-off (parity-tested).  Takes NCHW input
    and returns NCHW features like the stock path."""
    x = jnp.transpose(x, (1, 0, 2, 3))              # NCHW -> CNHW
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, layer in enumerate(spec):
        name = f"layer{i}"
        if isinstance(layer, Conv):
            p = params[name]
            x = conv_cnhw(x, p["w"], p.get("b"), layer.stride, layer.pad)
        elif isinstance(layer, BN):
            p = params[name]
            inv = jax.lax.rsqrt(p["var"] + BN_EPS)
            x = (x - p["mean"][:, None, None, None].astype(x.dtype)) \
                * inv[:, None, None, None].astype(x.dtype)
        elif isinstance(layer, ReLU):
            x = jnp.maximum(x, 0.0)
        elif isinstance(layer, Tanh):
            x = jnp.tanh(x)
        elif isinstance(layer, ELU):
            x = jax.nn.elu(x)
        elif isinstance(layer, Dropout):
            pass                                     # eval: identity
        elif isinstance(layer, AvgPoolGlobal):
            x = jnp.mean(x, axis=(2, 3), keepdims=True)
        elif isinstance(layer, MaxPool):
            if (layer.k, layer.stride, layer.pad) != (2, 2, 0):
                raise NotImplementedError("cnhw MaxPool supports 2/2/0 only")
            x = _maxpool2_cnhw(x)
        else:
            raise TypeError(f"Unknown layer {layer!r}")
    return jnp.transpose(x, (1, 0, 2, 3))            # CNHW -> NCHW


def as_nchw(patches: Array) -> Array:
    """(N, PS, PS) or (N, PS, PS, 1) -> (N, 1, PS, PS)."""
    if patches.ndim == 3:
        return patches[:, None, :, :]
    if patches.ndim == 4 and patches.shape[-1] == 1:
        return jnp.transpose(patches, (0, 3, 1, 2))
    return patches


# Backwards-compat alias (activations are channels-first internally now).
as_nhwc = as_nchw
