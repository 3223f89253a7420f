"""Handcrafted (weight-free) shape and orientation estimators.

Reference: AffineShapeEstimator (HandCraftedModules.py:81-132) — one Baumberg
iteration step from the gradient second-moment matrix — and
OrientationDetector (HandCraftedModules.py:133-192) — dominant gradient
orientation with 36 soft-assigned angular bins.

Both consume (N, PS, PS) patches and are pure functions (vmap/jit friendly).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..laf import abc2A, invsqrt2x2_sym, rectify_up_is_up, rotation_matrix

Array = jax.Array


def circular_gauss_kernel(kernlen: int = None, circ_zeros: bool = False,
                          sigma: float = None, norm: bool = True,
                          py2: bool = False) -> np.ndarray:
    """2-D Gaussian window (Utils.py:92-114).  ``py2`` selects the original
    python-2 integer halfSize; default matches a python-3 run (float)."""
    assert kernlen is not None or sigma is not None
    if kernlen is None:
        kernlen = int(2.0 * 3.0 * sigma + 1.0)
        if kernlen % 2 == 0:
            kernlen += 1
    half = kernlen // 2 if py2 else kernlen / 2.0
    r2 = float(half * half)
    if sigma is None:
        sigma2 = 0.9 * r2
    else:
        sigma2 = 2.0 * sigma * sigma
    x = np.linspace(-half, half, kernlen)
    xv, yv = np.meshgrid(x, x, indexing="xy")
    distsq = xv ** 2 + yv ** 2
    kernel = np.exp(-(distsq / sigma2))
    if circ_zeros:
        kernel *= (distsq <= r2).astype(np.float32)
    if norm:
        kernel /= np.sum(kernel)
    return kernel.astype(np.float32)


def _grad_x(p: Array, taps=(-1.0, 0.0, 1.0)) -> Array:
    """3-tap horizontal gradient with replicate padding; taps are the torch
    cross-correlation weights, so out[i] = t0*x[i-1] + t1*x[i] + t2*x[i+1]."""
    xp = jnp.concatenate([p[..., :, :1], p, p[..., :, -1:]], axis=-1)
    return (taps[0] * xp[..., :, :-2] + taps[1] * xp[..., :, 1:-1]
            + taps[2] * xp[..., :, 2:])


def _grad_y(p: Array, taps=(-1.0, 0.0, 1.0)) -> Array:
    yp = jnp.concatenate([p[..., :1, :], p, p[..., -1:, :]], axis=-2)
    return (taps[0] * yp[..., :-2, :] + taps[1] * yp[..., 1:-1, :]
            + taps[2] * yp[..., 2:, :])


@partial(jax.jit, static_argnames=("patch_size",))
def affine_shape_estimator(patches: Array, patch_size: int = 19) -> Array:
    """One Baumberg step: (N, PS, PS) patches -> (N, 2, 2) unit-det upright
    shape matrices.  Reference: HandCraftedModules.py:119-132."""
    gk = jnp.asarray(circular_gauss_kernel(
        kernlen=patch_size, sigma=(patch_size / 2) / 3.0), patches.dtype)
    gx = _grad_x(patches, (-1.0, 0.0, 1.0))
    gy = _grad_y(patches, (-1.0, 0.0, 1.0))
    a1 = jnp.mean(gx * gx * gk, axis=(-1, -2))
    b1 = jnp.mean(gx * gy * gk, axis=(-1, -2))
    c1 = jnp.mean(gy * gy * gk, axis=(-1, -2))
    a, b, c, _, _ = invsqrt2x2_sym(a1, b1, c1)
    return rectify_up_is_up(abc2A(a, b, c))


class AffineShapeEstimator:
    """Callable wrapper with the same injection interface as learned AffNets
    (carries .PS; __call__(None, patches) ignores params)."""

    def __init__(self, patch_size: int = 19):
        self.ps = patch_size
        self.name = "AffineShapeEstimator"

    def __call__(self, params, patches, **_):
        return affine_shape_estimator(patches, self.ps)

    def init(self, key):
        return {}


NUM_ANG_BINS = 36


@partial(jax.jit, static_argnames=("patch_size",))
def orientation_detector(patches: Array, patch_size: int = 19) -> Array:
    """Dominant orientation per patch (radians).  Soft angular binning of
    gradient magnitudes under a 10x Gaussian window, smoothing conv
    [0.33, 0.34, 0.33], argmax bin.  Reference: HandCraftedModules.py:168-192
    (kept bug-for-bug: only the floor-bin weight wo0 contributes, :185)."""
    gk = 10.0 * jnp.asarray(circular_gauss_kernel(kernlen=patch_size),
                            patches.dtype)
    gx = _grad_x(patches, (0.5, 0.0, -0.5))
    gy = _grad_y(patches, (0.5, 0.0, -0.5))
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-10) * gk
    ori = jnp.arctan2(gy, gx)
    o_big = NUM_ANG_BINS * (ori + math.pi) / (2.0 * math.pi)
    bo0 = jnp.floor(o_big)
    wo1 = o_big - bo0
    bo0 = jnp.mod(bo0, NUM_ANG_BINS).astype(jnp.int32)
    wo0 = (1.0 - wo1) * mag
    onehot = jax.nn.one_hot(bo0, NUM_ANG_BINS, dtype=patches.dtype)
    bins = jnp.mean(onehot * wo0[..., None], axis=(1, 2))     # (N, 36)
    # Angular smoothing: 1-D conv [0.33, 0.34, 0.33], zero padding.
    left = jnp.pad(bins, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(bins, ((0, 0), (0, 1)))[:, 1:]
    smoothed = 0.33 * left + 0.34 * bins + 0.33 * right
    idx = jnp.argmax(smoothed, axis=1).astype(patches.dtype)
    return -((2.0 * math.pi * idx / NUM_ANG_BINS) - math.pi)


class OrientationDetector:
    def __init__(self, patch_size: int = 19):
        self.ps = patch_size
        self.name = "OrientationDetector"

    def __call__(self, params, patches, return_rot_matrix: bool = True, **_):
        a = orientation_detector(patches, self.ps)
        return rotation_matrix(a) if return_rot_matrix else a

    def angle(self, params, patches, **_):
        return orientation_detector(patches, self.ps)

    def init(self, key):
        return {}
