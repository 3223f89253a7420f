"""Differentiable SIFT descriptor (weight-free).

Reference: pytorch_sift.py:30-94 (SIFTNet): gradients -> 8 soft-assigned
angular bins -> 4x4 spatial pooling with a triangular kernel -> L2 / clip 0.2
/ L2.  Pure function over (N, PS, PS) patches.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .cnn import l2norm
from .handcrafted import _grad_x, _grad_y

Array = jax.Array


def get_pooling_kernel(kernel_size: int = 25) -> np.ndarray:
    """Triangular pooling kernel (pytorch_sift.py:19-25)."""
    step = 1.0 / float(np.floor(kernel_size / 2.0))
    x_coef = np.arange(step / 2.0, 1.0, step)
    xc2 = np.hstack([x_coef, [1], x_coef[::-1]])
    kernel = np.outer(xc2.T, xc2)
    return np.maximum(0, kernel).astype(np.float32)


def get_bin_weight_kernel_size_and_stride(patch_size: int,
                                          num_spatial_bins: int):
    """pytorch_sift.py:26-29."""
    bin_weight_stride = int(round(2.0 * math.floor(patch_size / 2)
                                  / float(num_spatial_bins + 1)))
    bin_weight_kernel_size = int(2 * bin_weight_stride - 1)
    return bin_weight_kernel_size, bin_weight_stride


def _sift_gauss_kernel(kernlen: int, py2: bool = False) -> np.ndarray:
    """SIFTNet's own circular-masked, UNnormalized Gaussian window
    (pytorch_sift.py:31-44)."""
    half = kernlen // 2 if py2 else kernlen / 2.0
    r2 = float(half * half)
    sigma2 = 0.9 * r2
    k = np.zeros((kernlen, kernlen), np.float32)
    for y in range(kernlen):
        for x in range(kernlen):
            disq = (y - half) ** 2 + (x - half) ** 2
            k[y, x] = math.exp(-disq / sigma2) if disq < r2 else 0.0
    return k


@partial(jax.jit, static_argnames=("patch_size", "num_ang_bins",
                                   "num_spatial_bins", "clipval"))
def sift_describe(patches: Array, patch_size: int = 65, num_ang_bins: int = 8,
                  num_spatial_bins: int = 4, clipval: float = 0.2) -> Array:
    """(N, PS, PS) -> (N, num_ang_bins * num_spatial_bins^2) descriptors."""
    gk = jnp.asarray(_sift_gauss_kernel(patch_size), patches.dtype)
    ksize, stride = get_bin_weight_kernel_size_and_stride(patch_size,
                                                          num_spatial_bins)
    pk = jnp.asarray(get_pooling_kernel(ksize), patches.dtype)

    gx = _grad_x(patches, (-1.0, 0.0, 1.0))
    gy = _grad_y(patches, (-1.0, 0.0, 1.0))
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-10) * gk
    ori = jnp.arctan2(gy, gx + 1e-8)
    o_big = (ori + 2.0 * math.pi) / (2.0 * math.pi) * float(num_ang_bins)
    bo0 = jnp.floor(o_big)
    wo1 = o_big - bo0
    bo0 = jnp.mod(bo0, num_ang_bins).astype(jnp.int32)
    bo1 = jnp.mod(bo0 + 1, num_ang_bins)
    wo0 = (1.0 - wo1) * mag
    wo1 = wo1 * mag
    # Soft-binned angular maps, channels-first: (N, bins, H, W).
    # (NHWC conv backward compiles pathologically slowly on this TPU stack;
    # see models/cnn.py — NCHW everywhere on differentiable paths.)
    maps = (jax.nn.one_hot(bo0, num_ang_bins, dtype=patches.dtype,
                           axis=1) * wo0[:, None]
            + jax.nn.one_hot(bo1, num_ang_bins, dtype=patches.dtype,
                             axis=1) * wo1[:, None])
    # Spatial pooling: depthwise conv (the same triangular kernel per
    # angular bin; feature_group_count = num_ang_bins, OIHW with I=1).
    pooled = jax.lax.conv_general_dilated(
        maps,
        jnp.ones((num_ang_bins, 1, 1, 1), patches.dtype)
        * pk[None, None, :, :],
        window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=num_ang_bins)
    n = pooled.shape[0]
    # torch layout: channels-major (bin, y, x) flatten == NCHW flatten.
    flat = pooled.reshape(n, -1)
    flat = l2norm(flat)
    flat = jnp.clip(flat, 0.0, clipval)
    return l2norm(flat)


class SIFTNet:
    """Callable descriptor with the PatchNet-style interface."""

    def __init__(self, patch_size: int = 65, num_ang_bins: int = 8,
                 num_spatial_bins: int = 4, clipval: float = 0.2):
        self.ps = patch_size
        self.num_ang_bins = num_ang_bins
        self.num_spatial_bins = num_spatial_bins
        self.clipval = clipval
        self.name = "SIFTNet"

    def __call__(self, params, patches, **_):
        return sift_describe(patches, self.ps, self.num_ang_bins,
                             self.num_spatial_bins, self.clipval)

    def init(self, key):
        return {}
