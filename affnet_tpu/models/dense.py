"""Dense (fully convolutional) AffNet and LocalNorm2d.

Reference: LocalNorm2d (architectures.py:21-31) and AffNetFastFullConv
(architectures.py:629-674): reflect-pad 14, the AffNet trunk run densely,
bilinear upsample back to input size, per-pixel up-is-up rectified affine map.
Used by the OnePassSIR pipeline (OnePassSIR.py:76).

Channel layout here is NHWC with the affine map as 4 trailing channels
(a11, a12, a21, a22) — the reference uses (n, 4, h, w).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cnn import BN, Conv, Dropout, Params, ReLU, Spec, apply_spec, init_params
from ..laf import rectify_up_is_up_dense

Array = jax.Array


def local_norm_2d(x: Array, kernel_size: int = 33, eps: float = 1e-10) -> Array:
    """33x33 windowed local contrast normalization, clamped to [-6, 6].
    x: (N, 1, H, W).  Reference: architectures.py:21-31 (avg_pool over a
    reflect-padded map == box filter)."""
    pd = kernel_size // 2
    ones = (1.0 / (kernel_size * kernel_size))

    def box(v):
        vp = jnp.pad(v, ((0, 0), (0, 0), (pd, pd), (pd, pd)), mode="reflect")
        return jax.lax.reduce_window(
            vp, 0.0, jax.lax.add, (1, 1, kernel_size, kernel_size),
            (1, 1, 1, 1), "VALID") * ones

    mean = box(x)
    var = box(x * x) - mean * mean
    return jnp.clip((x - mean) / (jnp.sqrt(jnp.abs(var)) + eps), -6.0, 6.0)


_DENSE_SPEC: Spec = (
    Conv(1, 16, 3, 1, 1), BN(16), ReLU(),
    Conv(16, 16, 3, 1, 1), BN(16), ReLU(),
    Conv(16, 32, 3, 2, 1), BN(32), ReLU(),
    Conv(32, 32, 3, 1, 1), BN(32), ReLU(),
    Conv(32, 64, 3, 2, 1), BN(64), ReLU(),
    Conv(64, 64, 3, 1, 1), BN(64), ReLU(),
    Dropout(0.25), Conv(64, 3, 8, 1, 0, bias=True),
)


class AffNetFastFullConv:
    """Dense AffNet: (N, H, W) image -> (N, H, W, 4) rectified affine map."""

    name = "AffNetFastFullConv"
    spec = _DENSE_SPEC
    ps = 32

    def __init__(self, stride: int = 2):
        self.stride = stride

    def init(self, key) -> Params:
        return init_params(key, self.spec)

    def __call__(self, params: Params, img: Array, **_) -> Array:
        if img.ndim == 2:
            img = img[None]
        x = img[:, None, :, :]                               # NCHW
        n, _, h, w = x.shape
        x = local_norm_2d(x)
        x = jnp.pad(x, ((0, 0), (0, 0), (14, 14), (14, 14)), mode="reflect")
        ff, _ = apply_spec(self.spec, params, x)             # (N, 3, h', w')
        ff = jnp.transpose(ff, (0, 2, 3, 1))
        xy = jnp.tanh(jax.image.resize(ff, (n, h, w, ff.shape[-1]),
                                       "bilinear"))
        a0bc = jnp.stack([1.0 + xy[..., 0], 0.0 * xy[..., 1],
                          xy[..., 1], 1.0 + xy[..., 2]], axis=-1)
        return rectify_up_is_up_dense(a0bc)
