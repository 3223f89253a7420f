"""Standalone compile-and-check for ops/pallas_conv.conv_flat on the TPU.

Fast iteration loop for Mosaic lowering issues (the full bench takes ~5
min to reach the kernel): runs each trunk-layer shape the AffNet/TFeat
flat path emits, bf16 and f32, compares against the XLA reference conv.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import affnet_tpu  # noqa: F401  (pins matmul precision)
from affnet_tpu.ops import pallas_conv


def xla_ref(x_flat, w, img_hw, pad, n):
    h, w_ = img_hw
    c = w.shape[2]
    x4 = x_flat[:c].reshape(c, n, h, w_).transpose(1, 0, 2, 3)
    y = jax.lax.conv_general_dilated(
        x4.astype(jnp.float32), w.transpose(3, 2, 0, 1).astype(jnp.float32),
        (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    o = w.shape[3]
    return y.transpose(1, 0, 2, 3).reshape(o, n * h * w_)


def main():
    rng = np.random.RandomState(0)
    cases = [
        # (c, c_pad, o, hw, n, pad) — the shapes _apply_spec_flat emits.
        (1, 8, 16, (32, 32), 3000, 1),
        (16, 16, 16, (32, 32), 3000, 1),
        (16, 16, 32, (16, 16), 3000, 1),
        (32, 32, 64, (8, 8), 3000, 1),
        (64, 64, 64, (8, 8), 3000, 1),
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        for c, c_pad, o, (h, w_), n, pad in cases:
            x = rng.randn(c_pad, n * h * w_).astype(np.float32)
            x[c:] = 0.0
            wgt = (rng.randn(3, 3, c, o) * 0.1).astype(np.float32)
            xj = jnp.asarray(x, dtype)
            try:
                y = jax.jit(lambda a: pallas_conv.conv_flat(
                    a, jnp.asarray(wgt, dtype), None, img_hw=(h, w_),
                    pad=pad, act="none", n_patches=n))(xj)
                y = np.asarray(y, np.float32)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL c={c} o={o} hw={h}x{w_} {jnp.dtype(dtype).name}: {msg}")
                continue
            ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(wgt),
                                     (h, w_), pad, n))
            err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
            tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
            status = "ok" if err < tol else f"MISMATCH rel={err:.2e}"
            print(f"{status} c={c} o={o} hw={h}x{w_} {jnp.dtype(dtype).name}")


if __name__ == "__main__":
    main()
