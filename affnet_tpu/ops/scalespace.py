"""Gaussian scale pyramid with a static, trace-time plan.

TPU-first redesign of the reference ``ScalePyramid`` (HandCraftedModules.py:13-56):
the reference builds a ragged list-of-lists of tensors with a Python ``while``
loop on runtime shapes.  Here the octave count, every level shape, and every
blur kernel are computed *on the host* from (H, W) into a frozen
:class:`PyramidPlan`, so the full pyramid construction traces into ONE XLA
program with static shapes.  Levels are additionally flattened into a single
1-D HBM buffer (:func:`build_flat_pyramid`) so that downstream patch
extraction is a single vectorized gather instead of a per-level Python loop.

Numerics match the reference exactly:
  - initial blur sigma = sqrt(init_sigma^2 - 0.5^2)          (:26-29)
  - per-level blur sigma = curSigma * sqrt(step^2 - 1)        (:39)
  - sigmaStep = 2 ** (1 / nLevels)                            (:18)
  - octave downsample = stride-2 point sampling (avg_pool k=1) (:47)
  - stop when next octave side <= 2 * border + 3              (:21,50)
  - Gaussian kernel: CircularGaussKernel with py2 integer halfSize
    (Utils.py:92-114), applied with replicate padding (Utils.py:150-166).
    The 2-D kernel is a normalized outer product, so we apply it as two 1-D
    convolutions (mathematically identical, ~kernlen/2 x less compute).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def gauss_kernel_1d(sigma: float, py2: bool = False) -> np.ndarray:
    """1-D Gaussian taps matching CircularGaussKernel (Utils.py:92-114):
    kernlen = int(2*3*sigma + 1) made odd, taps at linspace(-half, half),
    normalized so the separable outer product equals the reference 2-D kernel.

    ``py2`` selects the original python-2 integer halfSize (= kernlen // 2,
    integer tap offsets); the default matches the reference executed under
    python 3 / modern torch, where ``kernlen / 2`` is a float and linspace
    produces non-integer tap positions."""
    kernlen = int(2.0 * 3.0 * sigma + 1.0)
    if kernlen % 2 == 0:
        kernlen += 1
    half = kernlen // 2 if py2 else kernlen / 2.0
    x = np.linspace(-half, half, kernlen)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: Array, sigma: float, py2: bool = False) -> Array:
    """Separable Gaussian blur with replicate padding on an (H, W) image.
    Matches GaussianBlur (Utils.py:150-166) bit-for-bit up to fp
    reassociation.

    Implemented as shifted-slice multiply-adds rather than lax.conv: a
    1-channel conv pads the channel dimension to full vector lanes on TPU
    (~100x wasted compute/bandwidth), while K shifted slices fuse into one
    bandwidth-bound VPU stencil pass.  Inside large programs the Pallas
    kernel (ops/pallas_blur.py) is used instead — see USE_PALLAS_BLUR."""
    if USE_PALLAS_BLUR:
        from .pallas_blur import gaussian_blur_pallas
        return gaussian_blur_pallas(img, sigma, py2=py2)
    return gaussian_blur_xla(img, sigma, py2=py2)


def gaussian_blur_xla(img: Array, sigma: float, py2: bool = False) -> Array:
    """The XLA shifted-slice formulation (reference implementation; also the
    fallback for shapes the Pallas kernel cannot tile)."""
    k = gauss_kernel_1d(sigma, py2=py2)
    pad = len(k) // 2
    # Horizontal pass: out[., j] = sum_i k[i] * xp[., j + i].
    xp = jnp.pad(img, ((0, 0), (pad, pad)), mode="edge")
    w = img.shape[1]
    x = k[0] * jax.lax.dynamic_slice_in_dim(xp, 0, w, 1)
    for i in range(1, len(k)):
        x = x + k[i] * jax.lax.dynamic_slice_in_dim(xp, i, w, 1)
    # Vertical pass.
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    h = img.shape[0]
    y = k[0] * jax.lax.dynamic_slice_in_dim(xp, 0, h, 0)
    for i in range(1, len(k)):
        y = y + k[i] * jax.lax.dynamic_slice_in_dim(xp, i, h, 0)
    return y


# Route pyramid blurs through the Pallas stencil kernel and the downsample
# through the one-hot selection matmul (ops/pallas_blur.py).  Both are exact
# vs the XLA formulations below (tested); the switch exists because inside
# the full detector program XLA duplicates the separable-blur computation
# into its consumers (measured 1.4-5 ms per blur at 1080p vs 0.07 ms for
# the same blur in isolation), and lane-strided slicing costs ~2.7 ns/elem
# (5 ms per 1080p downsample).  pallas_call is opaque to fusion, forcing
# materialization.
USE_PALLAS_BLUR = True


def downsample2(img: Array) -> Array:
    """Stride-2 point sampling == avg_pool2d(kernel_size=1, stride=2)
    (HandCraftedModules.py:47)."""
    if USE_PALLAS_BLUR:
        from .pallas_blur import downsample2_matmul
        return downsample2_matmul(img)
    return img[::2, ::2]


@dataclasses.dataclass(frozen=True)
class PyramidPlan:
    """Static description of the scale pyramid for an (H, W) input.

    ``sigmas[o][l]``/``pix_dists[o][l]`` follow the reference lists; flat level
    index ``o * levels_per_octave + l`` addresses tables below.
    """
    height: int
    width: int
    n_levels: int                 # center levels per octave ("nLevels")
    init_sigma: float
    border: int
    octave_shapes: Tuple[Tuple[int, int], ...]
    sigmas: Tuple[Tuple[float, ...], ...]
    pix_dists: Tuple[Tuple[float, ...], ...]

    @property
    def n_octaves(self) -> int:
        return len(self.octave_shapes)

    @property
    def levels_per_octave(self) -> int:
        return self.n_levels + 2

    @property
    def n_flat_levels(self) -> int:
        return self.n_octaves * self.levels_per_octave

    def flat_index(self, octave: int, level: int) -> int:
        return octave * self.levels_per_octave + level

    # --- flat level tables (host numpy; move to device once per jit trace) ---
    def level_shapes(self) -> List[Tuple[int, int]]:
        return [s for s in self.octave_shapes for _ in range(self.levels_per_octave)]

    def level_offsets(self) -> np.ndarray:
        sizes = [h * w for (h, w) in self.level_shapes()]
        return np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    def flat_buffer_size(self) -> int:
        return int(sum(h * w for (h, w) in self.level_shapes()))

    def level_dims(self):
        """(offsets, heights, widths) int32 arrays of length n_flat_levels."""
        shapes = self.level_shapes()
        hs = np.array([h for h, _ in shapes], np.int32)
        ws = np.array([w for _, w in shapes], np.int32)
        return self.level_offsets(), hs, ws

    # --- row-padded 2-D layout (fast (2,2)-window gathers) -----------------
    def row_offsets(self) -> np.ndarray:
        """Starting ROW of each level in the row-padded (sum_h, max_w)
        buffer."""
        hs = [h for h, _ in self.level_shapes()]
        return np.concatenate([[0], np.cumsum(hs)[:-1]]).astype(np.int32)

    def padded_buffer_shape(self) -> Tuple[int, int]:
        shapes = self.level_shapes()
        return (int(sum(h for h, _ in shapes)),
                int(max(w for _, w in shapes)))

    def level_dims_padded(self):
        """(row_offsets, heights, widths) for the row-padded buffer."""
        shapes = self.level_shapes()
        hs = np.array([h for h, _ in shapes], np.int32)
        ws = np.array([w for _, w in shapes], np.int32)
        return self.row_offsets(), hs, ws

    def sigma_pixdist_table(self) -> np.ndarray:
        """sigma * pix_dist per flat level — the effective blur in original-image
        pixels, used for descriptor-patch level selection (LAF.py:453-472)."""
        out = []
        for o in range(self.n_octaves):
            for l in range(self.levels_per_octave):
                out.append(self.sigmas[o][l] * self.pix_dists[o][l])
        return np.array(out, np.float32)


def make_plan(height: int, width: int, n_levels: int = 3,
              init_sigma: float = 1.6, border: int = 5) -> PyramidPlan:
    """Compute the full static pyramid plan for an (H, W) image.
    Mirrors the reference's runtime loop (HandCraftedModules.py:23-56)."""
    min_size = 2 * border + 2 + 1
    step = 2.0 ** (1.0 / n_levels)

    octave_shapes = [(height, width)]
    sigmas, pix_dists = [], []
    pix = 1.0
    while True:
        sig_o = [init_sigma * step ** i for i in range(n_levels + 2)]
        sigmas.append(tuple(sig_o))
        pix_dists.append(tuple([pix] * (n_levels + 2)))
        h, w = octave_shapes[-1]
        # Size after stride-2 sampling of the level-nLevels image.
        nh, nw = (h + 1) // 2, (w + 1) // 2
        pix *= 2.0
        if nh <= min_size or nw <= min_size:
            break
        octave_shapes.append((nh, nw))
    return PyramidPlan(height=height, width=width, n_levels=n_levels,
                       init_sigma=init_sigma, border=border,
                       octave_shapes=tuple(octave_shapes),
                       sigmas=tuple(sigmas), pix_dists=tuple(pix_dists))


def build_pyramid(img: Array, plan: PyramidPlan,
                  py2: bool = False) -> List[List[Array]]:
    """Build all pyramid levels.  ``img`` is (H, W) float.  Returns
    pyr[octave][level] with static shapes from ``plan`` — a Python list of
    jnp arrays inside the trace (unrolled; no ragged runtime structures)."""
    step = 2.0 ** (1.0 / plan.n_levels)
    cur_sigma = 0.5
    if plan.init_sigma > cur_sigma:
        sigma = math.sqrt(plan.init_sigma ** 2 - cur_sigma ** 2)
        curr = gaussian_blur(img, sigma, py2=py2)
    else:
        curr = img

    pyr: List[List[Array]] = []
    for o in range(plan.n_octaves):
        levels = [curr]
        cs = plan.init_sigma
        next_first = None
        for i in range(1, plan.levels_per_octave):
            sigma = cs * math.sqrt(step * step - 1.0)
            levels.append(gaussian_blur(levels[-1], sigma, py2=py2))
            cs *= step
            if i == plan.n_levels:
                next_first = downsample2(levels[-1])
        pyr.append(levels)
        curr = next_first
    return pyr


def build_flat_pyramid(img: Array, plan: PyramidPlan, py2: bool = False):
    """Build the pyramid and also pack every level into one row-padded 2-D
    buffer (sum of heights, max width) for vectorized (2,2)-window patch
    gathers.  Returns (pyr, buf2d)."""
    pyr = build_pyramid(img, plan, py2=py2)
    _, wmax = plan.padded_buffer_shape()
    rows = []
    for oct_ in pyr:
        for lvl in oct_:
            h, w = lvl.shape
            rows.append(jnp.pad(lvl, ((0, 0), (0, wmax - w)))
                        if w < wmax else lvl)
    return pyr, jnp.concatenate(rows, axis=0)
