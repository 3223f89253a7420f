"""YiNet — the LIFT-paper orientation estimator with GHH heads.

Reference: GHH (architectures.py:84-103) and YiNet (architectures.py:105-151).
GHH = generalized hinge head: a linear layer viewed as (n_out, s, m), max over
m, alternating +/- sum over s.  YiNet weights ship as .npy dumps loaded via
``import_weights`` — supported here through :func:`import_weights`.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from .cnn import Params, input_norm
from ..laf import rotation_matrix

Array = jax.Array


def ghh(params: Dict[str, Array], x: Array, n_out: int, s: int = 4,
        m: int = 4) -> Array:
    """x: (N, n_in) -> (N, n_out).  params: w (n_in, n_out*s*m), b."""
    feats = (x @ params["w"] + params["b"]).reshape(x.shape[0], n_out, s, m)
    max_feats = jnp.max(feats, axis=3)
    d = np.arange(s)
    deltas = jnp.asarray(np.where(d % 2 == 0, 1.0, -1.0), x.dtype)
    return jnp.sum(max_feats * deltas, axis=2)


def _conv(x, w, b, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x, k, stride, pad):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class YiNet:
    """(N, PS, PS) patches -> orientation angle (or rotation matrix)."""

    name = "YiNet"

    def __init__(self, patch_size: int = 28):
        self.ps = patch_size

    def init(self, key) -> Params:
        k = jax.random.split(key, 5)
        def conv_p(kk, i, o, ks):
            w = jax.random.normal(kk, (ks, ks, i, o), jnp.float32) * 0.05
            return {"w": w, "b": jnp.zeros((o,), jnp.float32)}
        return {
            "conv0": conv_p(k[0], 1, 10, 5),
            "conv1": conv_p(k[1], 10, 20, 5),
            "conv2": conv_p(k[2], 20, 50, 3),
            "ghh0": {"w": jax.random.normal(k[3], (50, 1600)) * 0.05,
                     "b": jnp.zeros((1600,))},
            "ghh1": {"w": jax.random.normal(k[4], (100, 32)) * 0.05,
                     "b": jnp.zeros((32,))},
        }

    def __call__(self, params, patches, return_rot_matrix: bool = False, **_):
        a = self.angle(params, patches)
        return rotation_matrix(-a) if return_rot_matrix else a

    def angle(self, params, patches, **_):
        x = patches[..., None] if patches.ndim == 3 else patches
        x = input_norm(x, detach=False)
        x = jnp.maximum(_conv(x, params["conv0"]["w"], params["conv0"]["b"]), 0)
        x = _maxpool(x, 3, 2, 1)
        x = jnp.maximum(_conv(x, params["conv1"]["w"], params["conv1"]["b"]), 0)
        x = _maxpool(x, 4, 2, 2)
        x = jnp.maximum(_conv(x, params["conv2"]["w"], params["conv2"]["b"]), 0)
        x = jnp.max(x, axis=(1, 2))                      # AdaptiveMaxPool2d(1)
        x = ghh(params["ghh0"], x, 100)
        x = ghh(params["ghh1"], x, 2)
        return jnp.arctan2(x[:, 0] + 1e-8, x[:, 1] + 1e-8)

    def import_weights(self, dir_name: str) -> Params:
        """Load the LIFT .npy dumps (architectures.py:125-138)."""
        def load(n):
            return np.load(os.path.join(dir_name, n)).astype(np.float32)
        p = {
            "conv0": {"w": np.transpose(load("layer0_W.npy"), (2, 3, 1, 0)),
                      "b": load("layer0_b.npy").reshape(-1)},
            "conv1": {"w": np.transpose(load("layer1_W.npy"), (2, 3, 1, 0)),
                      "b": load("layer1_b.npy").reshape(-1)},
            "conv2": {"w": np.transpose(load("layer2_W.npy"), (2, 3, 1, 0)),
                      "b": load("layer2_b.npy").reshape(-1)},
            "ghh0": {"w": load("layer3_W.npy").reshape(50, 1600),
                     "b": load("layer3_b.npy").reshape(1600)},
            "ghh1": {"w": load("layer4_W.npy").reshape(100, 32),
                     "b": load("layer4_b.npy").reshape(32)},
        }
        return jax.tree_util.tree_map(jnp.asarray, p)
