"""Determinant-of-Hessian response — fused stencil on (H, W) images.

Reference: HessianResp (HandCraftedModules.py:58-78): fixed 3-tap kernels
gxx = [1,-2,1], gyy = [1,-2,1]^T, gxy = gy(gx(x)) with gx/gy = [0.5,0,-0.5]
under replicate padding; response = |gxx*gyy - gxy^2| * sigma^4.

Implemented with shifted slices of a replicate-padded array instead of conv
calls — XLA fuses the whole thing into one elementwise/stencil kernel, which
is bandwidth-optimal on TPU (the op is memory-bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _pad_x(img: Array) -> Array:
    return jnp.concatenate([img[:, :1], img, img[:, -1:]], axis=1)


def _pad_y(img: Array) -> Array:
    return jnp.concatenate([img[:1, :], img, img[-1:, :]], axis=0)


def hessian_response(img: Array, sigma: float) -> Array:
    """det-of-Hessian response scaled by sigma^4.  ``img`` is (H, W)."""
    xp = _pad_x(img)
    # torch cross-correlation with [1,-2,1]: out[i] = x[i-1] - 2 x[i] + x[i+1]
    gxx = xp[:, :-2] - 2.0 * xp[:, 1:-1] + xp[:, 2:]
    yp = _pad_y(img)
    gyy = yp[:-2, :] - 2.0 * yp[1:-1, :] + yp[2:, :]
    # gx with [0.5, 0, -0.5]: out[i] = 0.5 (x[i-1] - x[i+1]); then gy of that.
    gx = 0.5 * (xp[:, :-2] - xp[:, 2:])
    gxp = _pad_y(gx)
    gxy = 0.5 * (gxp[:-2, :] - gxp[2:, :])
    return jnp.abs(gxx * gyy - gxy * gxy) * (sigma ** 4)


def clipped_response(img: Array, sigma: float, th: float) -> Array:
    """clamp(response - th, min=0) — the per-level detector input
    (SparseImgRepresenter.py:77-84)."""
    return jnp.maximum(hessian_response(img, sigma) - th, 0.0)
