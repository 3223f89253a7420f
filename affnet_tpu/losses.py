"""Descriptor metric-learning losses.

Reference: Losses.py (loss_HardNet :113-180, loss_HardNegC :58-81,
loss_L2Net :83-111, loss_random_sampling :31-57) plus
global_orthogonal_regularization and get_snn from the examples' Losses
(examples/hesaffnet/Losses.py:156-163, examples/direct_shape_optimization/
Losses.py:167-178).

All functions are pure and differentiable (jit/grad/vmap/pjit friendly) and
preserve the reference's masking constants: +10 on the diagonal, +10 on
near-duplicate negatives (distance < 0.008).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .match import distance_matrix, distance_vectors_pairwise

Array = jax.Array


def _masked_distance_matrix(anchor: Array, positive: Array,
                            eps: float = 1e-8) -> Array:
    """Distance matrix with the diagonal and near-duplicate (< 0.008)
    entries pushed up by 10 (Losses.py:122-129)."""
    d = distance_matrix(anchor, positive) + eps
    n = d.shape[0]
    eye = jnp.eye(n, dtype=d.dtype)
    d = d + eye * 10.0
    dup = (d < 0.008).astype(d.dtype) * 10.0
    return d + dup


def loss_hardnet(anchor: Array, positive: Array, anchor_swap: bool = False,
                 margin: float = 1.0, batch_reduce: str = "min",
                 loss_type: str = "triplet_margin", rng=None) -> Array:
    """Hardest-in-batch margin loss (Losses.py:113-180)."""
    eps = 1e-8
    dist = _masked_distance_matrix(anchor, positive, eps)
    pos1 = jnp.diagonal(distance_matrix(anchor, positive) + eps)
    if batch_reduce == "min":
        min_neg = jnp.min(dist, axis=1)
        if anchor_swap:
            min_neg = jnp.minimum(min_neg, jnp.min(dist, axis=0))
        pos = pos1
    elif batch_reduce == "average":
        n = anchor.shape[0]
        pos = jnp.tile(pos1, n)
        min_neg = dist.reshape(-1)
        if anchor_swap:
            min_neg = jnp.minimum(min_neg, dist.T.reshape(-1))
    elif batch_reduce == "random":
        if rng is None:
            rng = jax.random.PRNGKey(0)
        n = anchor.shape[0]
        idxs = jax.random.permutation(rng, n)
        min_neg = dist[jnp.arange(n), idxs]
        if anchor_swap:
            min_neg = jnp.minimum(min_neg, dist.T[jnp.arange(n), idxs])
        pos = pos1
    else:
        raise ValueError(f"Unknown batch_reduce {batch_reduce}")

    if loss_type == "triplet_margin":
        loss = jnp.maximum(margin + pos - min_neg, 0.0)
    elif loss_type == "softmax":
        exp_pos = jnp.exp(2.0 - pos)
        exp_den = exp_pos + jnp.exp(2.0 - min_neg) + eps
        loss = -jnp.log(exp_pos / exp_den)
    elif loss_type == "contrastive":
        loss = jnp.maximum(margin - min_neg, 0.0) + pos
    else:
        raise ValueError(f"Unknown loss type {loss_type}")
    return jnp.mean(loss)


def loss_hardnegc(anchor: Array, positive: Array, margin: float = 1.0) -> Array:
    """Symmetric hardest-negative-DETACHED contrastive loss — the default
    AffNet training loss (run_me.sh:9; Losses.py:58-81)."""
    eps = 1e-8
    pos1 = distance_vectors_pairwise(anchor, positive)

    def half(a, p_detached, axis):
        d = distance_matrix(a, p_detached) + eps
        n = d.shape[0]
        d = d + jnp.eye(n, dtype=d.dtype) * 10.0
        d = d + (d < 0.008).astype(d.dtype) * 10.0
        min_neg = jnp.min(d, axis=axis)
        return jnp.mean(jnp.maximum(margin + pos1 - min_neg, 0.0))

    loss = 0.5 * half(anchor, jax.lax.stop_gradient(positive), 1)
    loss += 0.5 * half(jax.lax.stop_gradient(anchor), positive, 0)
    return loss


def loss_l2net(anchor: Array, positive: Array, anchor_swap: bool = False,
               margin: float = 1.0, loss_type: str = "softmax") -> Array:
    """Full-batch softmax loss (Losses.py:83-111)."""
    if loss_type != "softmax":
        raise ValueError("Only softmax loss works with L2Net sampling")
    eps = 1e-8
    d = distance_matrix(anchor, positive)
    pos1 = jnp.diagonal(d)
    exp_pos = jnp.exp(2.0 - pos1)
    exp_den = jnp.sum(jnp.exp(2.0 - d), axis=1) + eps
    loss = -jnp.log(exp_pos / exp_den)
    if anchor_swap:
        exp_den1 = jnp.sum(jnp.exp(2.0 - d), axis=0) + eps
        loss = loss - jnp.log(exp_pos / exp_den1)
    return jnp.mean(loss)


def loss_random_sampling(anchor: Array, positive: Array, negative: Array,
                         anchor_swap: bool = False, margin: float = 1.0,
                         loss_type: str = "triplet_margin") -> Array:
    """Triplet/softmax/contrastive with random negatives (Losses.py:31-57)."""
    eps = 1e-8
    pos, d_a_n, d_p_n = distance_vectors_pairwise(anchor, positive, negative)
    min_neg = jnp.minimum(d_a_n, d_p_n) if anchor_swap else d_a_n
    if loss_type == "triplet_margin":
        loss = jnp.maximum(margin + pos - min_neg, 0.0)
    elif loss_type == "softmax":
        exp_pos = jnp.exp(2.0 - pos)
        exp_den = exp_pos + jnp.exp(2.0 - min_neg) + eps
        loss = -jnp.log(exp_pos / exp_den)
    elif loss_type == "contrastive":
        loss = jnp.maximum(margin - min_neg, 0.0) + pos
    else:
        raise ValueError(f"Unknown loss type {loss_type}")
    return jnp.mean(loss)


def global_orthogonal_regularization(anchor: Array, negative: Array) -> Array:
    """GOR term (examples/hesaffnet/Losses.py:156-163)."""
    neg_dis = jnp.sum(anchor * negative, axis=1)
    dim = anchor.shape[1]
    gor = jnp.mean(neg_dis) ** 2 + jnp.maximum(
        jnp.mean(neg_dis ** 2) - 1.0 / dim, 0.0)
    return gor


def get_snn(anchor: Array, positive: Array) -> Array:
    """Second-nearest-neighbor ratio per anchor
    (examples/direct_shape_optimization/Losses.py:167-178)."""
    d = distance_matrix(anchor, positive) + 1e-8
    n = d.shape[0]
    pos = jnp.diagonal(d)
    d_masked = d + jnp.eye(n, dtype=d.dtype) * 10.0
    min_neg = jnp.min(d_masked, axis=1)
    return pos / (min_neg + 1e-8)


def descriptor_dist(desc_a: Array, desc_p: Array) -> Array:
    """Mean pairwise positive distance — the 'PosDist' training loss
    (train_AffNet_test_on_graffity.py:221)."""
    return jnp.mean(jnp.sqrt(jnp.sum((desc_a - desc_p) ** 2, axis=1) + 1e-6))
