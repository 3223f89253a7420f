"""Descriptor matching: distance matrices, SNN-ratio tentative matching.

Reference: Losses.py:5-28 (distance kernels) and the matching logic inside
test() (train_AffNet_test_on_graffity.py:292-305).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def distance_matrix(anchor: Array, positive: Array, eps: float = 1e-6) -> Array:
    """Pairwise L2 distances, sqrt(|(|a|^2 + |p|^2 - 2 a.p)| + eps).
    Reference: distance_matrix_vector (Losses.py:5-13); the abs follows the
    ReprojectionStuff variant (:84) — without it, fp cancellation on
    identical points yields NaN (sqrt of a tiny negative)."""
    d1 = jnp.sum(anchor * anchor, axis=1)[:, None]
    d2 = jnp.sum(positive * positive, axis=1)[None, :]
    cross = anchor @ positive.T
    return jnp.sqrt(jnp.abs(d1 + d2 - 2.0 * cross) + eps)


def distance_vectors_pairwise(anchor: Array, positive: Array,
                              negative: Array = None, eps: float = 1e-8):
    """Row-wise distances (Losses.py:15-28)."""
    a_sq = jnp.sum(anchor * anchor, axis=1)
    p_sq = jnp.sum(positive * positive, axis=1)
    d_a_p = jnp.sqrt(a_sq + p_sq - 2 * jnp.sum(anchor * positive, axis=1) + eps)
    if negative is None:
        return d_a_p
    n_sq = jnp.sum(negative * negative, axis=1)
    d_a_n = jnp.sqrt(a_sq + n_sq - 2 * jnp.sum(anchor * negative, axis=1) + eps)
    d_p_n = jnp.sqrt(p_sq + n_sq - 2 * jnp.sum(positive * negative, axis=1) + eps)
    return d_a_p, d_a_n, d_p_n


@jax.jit
def snn_match(desc1: Array, desc2: Array, snn_threshold: float = 0.8):
    """Second-nearest-neighbor ratio matching, exactly as the reference
    test() does it (train_AffNet_test_on_graffity.py:292-298): nearest
    neighbor per row, then mask out *the matched columns* (a column-wise
    scatter, not a per-row second-minimum!) before taking the second min.

    Returns (idxs_in_2, mask, min_dist, ratio) all of length N1."""
    d = distance_matrix(desc1, desc2)
    min_dist = jnp.min(d, axis=1)
    idxs_in_2 = jnp.argmin(d, axis=1)
    # dist_matrix[:, idxs_in_2] = 100000 — zero out matched COLUMNS globally.
    col_hit = jnp.zeros((d.shape[1],), bool).at[idxs_in_2].set(True)
    d2 = jnp.where(col_hit[None, :], 1e5, d)
    min_2nd = jnp.min(d2, axis=1)
    ratio = min_dist / (min_2nd + 1e-8)
    mask = ratio <= snn_threshold
    return idxs_in_2, mask, min_dist, ratio


def snn_match_host(desc1, desc2, snn_threshold: float = 0.8
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper returning (tent_idxs_in_1, tent_idxs_in_2)."""
    idxs_in_2, mask, _, _ = snn_match(jnp.asarray(desc1), jnp.asarray(desc2),
                                      snn_threshold)
    mask = np.asarray(mask)
    return np.arange(len(mask))[mask], np.asarray(idxs_in_2)[mask]
