"""Microbenchmark: patch-CNN conv formulations on the real TPU.

The detector's CNN stage (AffNet/OriNet/TFeat over ~2-3k 32x32 patches) runs
at ~8% MFU with stock lax.conv NCHW (VERDICT r3 Weak #1): 3x3 convs with 16-64
output channels fill 16-64 of the MXU's 128 lanes.  Candidates measured here:

  nchw      current conv2d (lax.conv, NCHW)
  nhwc      lax.conv with NHWC dimension numbers (inference only; the NHWC
            BACKWARD compile is pathological, CLAUDE.md)
  im2col    9-shift im2col + one matmul (N*H*W, 9C) @ (9C, C_out)
  rowblock  8-output-row packing: (N*G*W, 10*3*C) @ (10*3*C, 8*C_out) with a
            banded (0.3-dense) host-built weight matrix -> 128+ output lanes

Each timed as an in-jit fori_loop (amortizes the ~25 ms tunnel round trip),
fenced by a device->host fetch.  Run on the TPU:
    python scripts/bench_conv_formulations.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

import affnet_tpu  # noqa: F401  (pins matmul precision)
from affnet_tpu.utils import fence

N = 2560
ITERS = 50


# --- formulations -----------------------------------------------------------

def conv_nchw(x, w, stride, pad):
    # x (N, C, H, W), w HWIO
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (3, 2, 0, 1)), (stride, stride),
        [(pad, pad), (pad, pad)], dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def conv_nhwc(x, w, stride, pad):
    # x (N, H, W, C), w HWIO
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def conv_im2col(x, w, stride, pad):
    # x (N, H, W, C), w (kh, kw, C, O); stride 1 only
    n, h, wd, c = x.shape
    kh, kw, _, o = w.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [xp[:, r:r + h, s:s + wd, :] for r in range(kh) for s in range(kw)]
    xim = jnp.concatenate(cols, axis=-1).reshape(n * h * wd, kh * kw * c)
    y = xim @ w.reshape(kh * kw * c, o)
    return y.reshape(n, h, wd, o)


@functools.lru_cache(maxsize=None)
def _rowblock_weight_np(kh, kw, c, o, rows_per_group):
    """(rows_per_group+2)*kw*c x rows_per_group*o banded weight template
    indices; filled per-call from the conv weight."""
    rpg = rows_per_group
    wrb = np.zeros((rpg + 2, kw, c, rpg, o), np.float32)
    return wrb  # filled by caller


def make_rowblock_weight(w, rows_per_group):
    kh, kw, c, o = w.shape
    assert kh == 3
    rpg = rows_per_group
    wrb = jnp.zeros(((rpg + 2), kw, c, rpg, o), w.dtype)
    for orow in range(rpg):
        for kr in range(3):
            wrb = wrb.at[orow + kr, :, :, orow, :].set(w[kr])
    return wrb.reshape((rpg + 2) * kw * c, rpg * o)


def conv_im2colT(x_cnhw, w, pad):
    """Transposed im2col: x (C, N, H, W), w (kh, kw, C, O) -> (O, N, H, W).

    The matmul is (O, 9C) @ (9C, N*H*W): pixels fill the 128 MXU lanes
    completely and the contraction depth is 9*C (144/288/576 for C=16/32/64)
    instead of C_out=16-64 lanes in the stock layouts.  Stride 1 only."""
    c, n, h, wd = x_cnhw.shape
    kh, kw, _, o = w.shape
    xp = jnp.pad(x_cnhw, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    taps = [xp[:, :, r:r + h, s:s + wd] for r in range(kh) for s in range(kw)]
    xim = jnp.concatenate(taps, axis=0).reshape(kh * kw * c, n * h * wd)
    wt = jnp.transpose(w, (3, 0, 1, 2)).reshape(o, kh * kw * c)
    y = jnp.dot(wt, xim, preferred_element_type=jnp.float32)
    return y.reshape(o, n, h, wd).astype(x_cnhw.dtype)


@functools.lru_cache(maxsize=None)
def _downsample_onehot(full, dtype_name):
    sel = np.zeros((full, full // 2), np.float32)
    sel[np.arange(0, full, 2), np.arange(full // 2)] = 1.0
    return jnp.asarray(sel).astype(dtype_name)


def downsample2_onehot(y):
    """(O, N, H, W) -> (O, N, H/2, W/2) via exact one-hot selection matmuls
    (lane-strided slicing costs ~2.7 ns/element; these are tiny matmuls)."""
    o, n, h, wd = y.shape
    dh = _downsample_onehot(h, jnp.dtype(y.dtype).name)
    dw = _downsample_onehot(wd, jnp.dtype(y.dtype).name)
    y = jnp.einsum("onhw,wx->onhx", y, dw)
    y = jnp.einsum("onhx,hg->ongx", y, dh)
    return y.astype(y.dtype)


def conv_rowblock(x, wrb, rows_per_group, kw, o):
    # x (N, H, W, C) -> groups of rows_per_group output rows; 3x3 pad 1.
    n, h, wd, c = x.shape
    rpg = rows_per_group
    g = h // rpg
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [xp[:, rpg * gi:rpg * gi + rpg + 2, s:s + wd, :]
             for gi in range(g) for s in range(kw)]
    xx = jnp.stack(parts, axis=1).reshape(n, g, kw, rpg + 2, wd, c)
    xx = xx.transpose(0, 1, 4, 3, 2, 5)          # (N, g, W, rpg+2, kw, C)
    xx = xx.reshape(n * g * wd, (rpg + 2) * kw * c)
    y = xx @ wrb                                  # (N*g*W, rpg*o)
    y = y.reshape(n, g, wd, rpg, o).transpose(0, 1, 3, 2, 4)
    return y.reshape(n, h, wd, o)


# --- layer stacks -----------------------------------------------------------

AFFNET_LAYERS = [
    # (in_ch, out_ch, k, stride, pad, h_in)
    (1, 16, 3, 1, 1, 32),
    (16, 16, 3, 1, 1, 32),
    (16, 32, 3, 2, 1, 32),
    (32, 32, 3, 1, 1, 16),
    (32, 64, 3, 2, 1, 16),
    (64, 64, 3, 1, 1, 8),
]


def stack_flops(n):
    f = 0
    for cin, cout, k, s, p, hin in AFFNET_LAYERS:
        hout = hin // s
        f += 2 * n * hout * hout * k * k * cin * cout
    return f


def run_stack(x_nhwc, weights, mode, dtype):
    x = x_nhwc.astype(dtype)
    if mode == "nchw":
        x = x.transpose(0, 3, 1, 2)
    elif mode == "im2colT":
        x = x.transpose(3, 0, 1, 2)                # (C, N, H, W)
    for li, (cin, cout, k, s, p, hin) in enumerate(AFFNET_LAYERS):
        w = weights[li].astype(dtype)
        if mode == "nchw":
            y = conv_nchw(x, w, s, p)
            x = jnp.maximum(y, 0.0).astype(dtype)
        elif mode == "nhwc":
            y = conv_nhwc(x, w, s, p)
            x = jnp.maximum(y, 0.0).astype(dtype)
        elif mode == "im2col":
            if s == 1:
                y = conv_im2col(x, w, s, p)
            else:
                y = conv_nhwc(x, w, s, p)
            x = jnp.maximum(y, 0.0).astype(dtype)
        elif mode == "rowblock":
            if s == 1 and k == 3:
                rpg = min(8, hin)
                wrb = make_rowblock_weight(w, rpg).astype(dtype)
                y = conv_rowblock(x, wrb, rpg, k, cout)
            else:
                y = conv_nhwc(x, w, s, p)
            x = jnp.maximum(y, 0.0).astype(dtype)
        elif mode == "im2colT":
            y = conv_im2colT(x, w, p)              # stride-1 at full res
            if s == 2:
                y = downsample2_onehot(y)
            x = jnp.maximum(y, 0.0).astype(dtype)
    if mode == "nchw":
        x = x.transpose(0, 2, 3, 1)
    elif mode == "im2colT":
        x = x.transpose(1, 2, 3, 0)
    return x


def timed(fn, x, label, flops):
    f = jax.jit(fn)
    fence(f(x))                                   # compile
    t0 = time.time()
    fence(f(x))
    t1 = time.time()
    ms = (t1 - t0) * 1e3 / ITERS
    print(json.dumps({"variant": label, "ms_per_iter": round(ms, 3),
                      "tflops": round(flops / ms / 1e9, 1)}), flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, 32, 32, 1).astype(np.float32))
    weights = [jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32)
                           * 0.1)
               for (cin, cout, k, s, p, hin) in AFFNET_LAYERS]
    flops = stack_flops(N)
    print(f"# AffNet-trunk stack, N={N}, {flops/1e9:.1f} GFLOP/iter",
          flush=True)

    for dtype in (jnp.bfloat16, jnp.float32):
        for mode in ("nchw", "nhwc", "im2col", "rowblock", "im2colT"):
            def loop(xx, mode=mode, dtype=dtype):
                def body(i, acc):
                    out = run_stack(xx * (1.0 + 1e-12 * i), weights, mode,
                                    dtype)
                    return acc + out.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, ITERS, body, 0.0)
            try:
                timed(loop, x, f"{mode}_{jnp.dtype(dtype).name}", flops)
            except Exception as e:                # noqa: BLE001
                print(json.dumps({"variant": f"{mode}_{jnp.dtype(dtype).name}",
                                  "error": str(e)[:200]}), flush=True)

    # MXU speed-of-light probe: one big dense matmul, same FLOP count.
    for dtype in (jnp.bfloat16, jnp.float32):
        m = 8192
        kk = 2048
        nn = int(flops / (2 * m * kk))
        a = jnp.asarray(rng.rand(m, kk).astype(np.float32)).astype(dtype)
        b = jnp.asarray(rng.rand(kk, nn).astype(np.float32)).astype(dtype)

        def mm(aa, dtype=dtype, b=b):
            def body(i, acc):
                return acc + jnp.dot(
                    aa * (1.0 + 1e-12 * i), b,
                    preferred_element_type=jnp.float32).mean()
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        timed(mm, a, f"sol_matmul_{jnp.dtype(dtype).name}",
              2 * m * kk * nn)


if __name__ == "__main__":
    main()
