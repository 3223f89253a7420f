"""Homography reprojection, GT correspondences, geometric LAF losses.

Reference: ReprojectionStuff.py — linH (:9-21), reprojectLAFs (:23-40),
affineAug (:57-76), GT-correspondence matchers (:126-203), LAFMagic(:228-259)
/ LAFMagicFro (:260-278), identity_loss (:281-288).

Fixed-size masked variants of the index-returning functions are provided for
use inside jit; host wrappers return index arrays like the reference.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .laf import lafs_to_h_frames, rectify_up_is_up
from .match import distance_matrix

Array = jax.Array


def linH(H: Array, x: Array, y: Array) -> Array:
    """Local linearization (Jacobian) of homography H at points (x, y).
    Reference: ReprojectionStuff.py:9-21."""
    den = x * H[2, 0] + y * H[2, 1] + H[2, 2]
    num1_densq = (x * H[0, 0] + y * H[0, 1] + H[0, 2]) / (den * den)
    num2_densq = (x * H[1, 0] + y * H[1, 1] + H[1, 2]) / (den * den)
    a11 = H[0, 0] / den - num1_densq * H[2, 0]
    a12 = H[0, 1] / den - num1_densq * H[2, 1]
    a21 = H[1, 0] / den - num2_densq * H[2, 0]
    a22 = H[1, 1] / den - num2_densq * H[2, 1]
    return jnp.stack([jnp.stack([a11, a12], -1),
                      jnp.stack([a21, a22], -1)], -2)


def reproject_lafs(LAFs1: Array, H1to2: Array,
                   return_lhfs: bool = False) -> Array:
    """Map LAFs between views under H (ReprojectionStuff.py:23-40)."""
    LHF1 = lafs_to_h_frames(LAFs1)
    xy1 = H1to2[None] @ LHF1[:, :, 2:]
    xy1 = xy1 / xy1[:, 2:, :]
    As = linH(H1to2, LAFs1[:, 0, 2], LAFs1[:, 1, 2])
    AF = As @ LHF1[:, 0:2, 0:2]
    out = jnp.concatenate([AF, xy1[:, :2, :]], axis=2)
    return lafs_to_h_frames(out) if return_lhfs else out


def px2grid_A(w: float, h: float) -> np.ndarray:
    A = np.eye(3, dtype=np.float32)
    A[0, 0] = 2.0 / w
    A[1, 1] = 2.0 / h
    A[0, 2] = -1
    A[1, 2] = -1
    return A


def grid2px_A(w: float, h: float) -> np.ndarray:
    A = np.eye(3, dtype=np.float32)
    A[0, 0] = w / 2.0
    A[0, 2] = w / 2.0
    A[1, 1] = h / 2.0
    A[1, 2] = h / 2.0
    return A


def affine_aug(img: Array, key, max_add: float = 0.5,
               align_corners: bool = False) -> Tuple[Array, Array]:
    """Random affine warp of a whole (H, W) image + ground-truth H mapping
    original -> new coordinates.  Reference: ReprojectionStuff.py:57-76."""
    from .ops.patches import _bilinear_window_sample
    h, w = img.shape
    rand_add = max_add * (jax.random.uniform(key, (3, 3)) - 0.5) * 2.0
    rand_add = rand_add.at[2, 0:2].set(0.0).at[2, 2].set(0.0)
    A = jnp.eye(3, dtype=img.dtype) + rand_add
    H_orig2new = (jnp.asarray(grid2px_A(w, h))
                  @ jnp.linalg.inv(A) @ jnp.asarray(px2grid_A(w, h)))
    # affine_grid over the full image + grid_sample (zeros padding).
    if align_corners:
        lx = jnp.linspace(-1.0, 1.0, w)
        ly = jnp.linspace(-1.0, 1.0, h)
    else:
        lx = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
        ly = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    gxx = jnp.tile(lx[None, :], (h, 1))
    gyy = jnp.tile(ly[:, None], (1, w))
    xs = A[0, 0] * gxx + A[0, 1] * gyy + A[0, 2]
    ys = A[1, 0] * gxx + A[1, 1] * gyy + A[1, 2]
    if align_corners:
        u = (xs + 1.0) / 2.0 * (w - 1)
        v = (ys + 1.0) / 2.0 * (h - 1)
    else:
        u = ((xs + 1.0) * w - 1.0) / 2.0
        v = ((ys + 1.0) * h - 1.0) / 2.0
    new_img = _bilinear_window_sample(img, 0, h, w, u, v)
    return new_img, H_orig2new


def ratio_matrix(a: Array, p: Array, eps: float = 1e-12) -> Array:
    """out[i, j] = p[i] / a[j]... following the reference's broadcast
    (ReprojectionStuff.py:88-90): row i = a / p[i]."""
    return a[None, :] / (p[:, None] + eps)


def inverse_lhfs(LHFs: Array) -> Array:
    return jnp.linalg.inv(LHFs)


def frobenius_canonical_dist(LHF1_inv: Array, LHF2: Array,
                             skip_center: bool = False) -> Array:
    """||LHF1^-1 @ LHF2 - I||_F^2 matrix (ReprojectionStuff.py:102-124)."""
    prod = jnp.einsum("aij,bjk->abik", LHF1_inv, LHF2)
    eye = jnp.eye(3, dtype=LHF1_inv.dtype)
    diff2 = (prod - eye) ** 2
    if skip_center:
        return diff2[:, :, :2, :2].sum(axis=(2, 3))
    return diff2.sum(axis=(2, 3))


# ---------------------------------------------------------------------------
# GT correspondences (masked cores + host index wrappers)
# ---------------------------------------------------------------------------

def gt_correspondence_mask(LAFs1: Array, LAFs2: Array, H1to2: Array,
                           dist_threshold: float = 4.0):
    """Center-distance-NN GT matching (ReprojectionStuff.py:126-137).
    Returns (min_dist, idxs_in_2, mask) of length N1."""
    LHF2_in_1 = reproject_lafs(LAFs2, jnp.linalg.inv(H1to2), True)
    c1 = LAFs1[:, :, 2]
    c2 = LHF2_in_1[:, 0:2, 2]
    # NB ReprojectionStuff's own distance_matrix_vector (:78-86) is
    # TRANSPOSED relative to the Losses one: dmv(anchor, positive)[i, j] =
    # dist(positive_i, anchor_j).  dmv(c2_in_1, c1) therefore has rows =
    # LAFs1: for each LAF1, the nearest reprojected LAF2.
    dist = distance_matrix(c1, c2)
    min_dist = jnp.min(dist, axis=1)
    idxs_in_2 = jnp.argmin(dist, axis=1)
    mask = min_dist <= dist_threshold
    return min_dist, idxs_in_2, mask


def get_gt_correspondence_indexes(LAFs1, LAFs2, H1to2, dist_threshold=4.0):
    """Host wrapper matching the reference return convention:
    (min_dist[mask], plain_idxs_in_1[mask], idxs_in_2[mask]).

    NB the reference's names are misleading: ``plain_indxs_in1`` enumerates
    LAFs2 rows and ``idxs_in_2`` holds indices into LAFs1 (it computes the
    distance matrix with reprojected-LAFs2 as rows).  We reproduce the exact
    same returned triples."""
    md, idx, mask = gt_correspondence_mask(jnp.asarray(LAFs1),
                                           jnp.asarray(LAFs2),
                                           jnp.asarray(H1to2), dist_threshold)
    md, idx, mask = np.asarray(md), np.asarray(idx), np.asarray(mask)
    plain = np.arange(len(idx))
    return md[mask], plain[mask], idx[mask]


def gt_correspondence_fro_mask(LAFs1: Array, LAFs2: Array, H1to2: Array,
                               dist_threshold: float = 4.0,
                               skip_center_in_fro: bool = False):
    """Frobenius-norm GT matching (ReprojectionStuff.py:139-150)."""
    LHF2_in_1 = reproject_lafs(LAFs2, jnp.linalg.inv(H1to2), True)
    LHF1_inv = inverse_lhfs(lafs_to_h_frames(LAFs1))
    fro = frobenius_canonical_dist(LHF1_inv, LHF2_in_1, skip_center_in_fro)
    # fro[i, j] = dist(LAF1 i, LAF2 j); reference then min over dim 1.
    min_dist = jnp.min(fro, axis=1)
    idxs_in_2 = jnp.argmin(fro, axis=1)
    mask = min_dist <= dist_threshold
    return min_dist, idxs_in_2, mask


def gt_correspondence_fro_and_center_mask(
        LAFs1: Array, LAFs2: Array, H1to2: Array,
        dist_threshold: float = 4.0, center_dist_th: float = 2.0,
        scale_diff_coef: float = 0.3, skip_center_in_fro: bool = False,
        do_up_is_up: bool = False, inv_to_eye: bool = True):
    """Frobenius + center/scale-gated GT matching
    (ReprojectionStuff.py:152-203)."""
    LHF2_in_1_pre = reproject_lafs(LAFs2, jnp.linalg.inv(H1to2), True)
    if do_up_is_up:
        A2 = LHF2_in_1_pre[:, :2, :2]
        sc2 = jnp.sqrt(jnp.abs(A2[:, 0, 0] * A2[:, 1, 1]
                               - A2[:, 1, 0] * A2[:, 0, 1]))[:, None, None]
        A2r = rectify_up_is_up(A2 / sc2) * sc2
        LHF2_in_1 = LHF2_in_1_pre.at[:, :2, :2].set(A2r)
        A1 = LAFs1[:, :2, :2]
        sc1 = jnp.sqrt(jnp.abs(A1[:, 0, 0] * A1[:, 1, 1]
                               - A1[:, 1, 0] * A1[:, 0, 1]))[:, None, None]
        LHF1 = lafs_to_h_frames(jnp.concatenate(
            [rectify_up_is_up(A1 / sc1) * sc1, LAFs1[:, :, 2:]], axis=2))
    else:
        LHF2_in_1 = LHF2_in_1_pre
        LHF1 = lafs_to_h_frames(LAFs1)

    if inv_to_eye:
        # (n1, n2): rows = LAFs1, like every other matrix in this function.
        fro = frobenius_canonical_dist(inverse_lhfs(LHF1), LHF2_in_1,
                                       skip_center_in_fro)
    else:
        if not skip_center_in_fro:
            fro = distance_matrix(LHF1.reshape(LHF1.shape[0], -1),
                                  LHF2_in_1.reshape(LHF2_in_1.shape[0], -1))
        else:
            fro = distance_matrix(
                LHF1[:, 0:2, 0:2].reshape(LHF1.shape[0], -1),
                LHF2_in_1[:, 0:2, 0:2].reshape(LHF2_in_1.shape[0], -1))

    c1 = LAFs1[:, :, 2]
    c2 = LHF2_in_1[:, 0:2, 2]
    masked = fro
    if scale_diff_coef > 0:
        s1 = jnp.sqrt(jnp.abs(LAFs1[:, 0, 0] * LAFs1[:, 1, 1]
                              - LAFs1[:, 1, 0] * LAFs1[:, 0, 1]))
        s2 = jnp.sqrt(jnp.abs(LHF2_in_1[:, 0, 0] * LHF2_in_1[:, 1, 1]
                              - LHF2_in_1[:, 1, 0] * LHF2_in_1[:, 0, 1]))
        scale_matrix = ratio_matrix(s2, s1)        # rows = LAFs1? see ref
        scale_ok = jnp.abs(1.0 - scale_matrix) <= scale_diff_coef
    else:
        scale_ok = jnp.ones_like(masked, bool)
    center_far = distance_matrix(c1, c2) >= center_dist_th
    masked = (1.0 - scale_ok.astype(fro.dtype)
              + center_far.astype(fro.dtype)) * 1000.0 + fro
    min_dist = jnp.min(masked, axis=1)
    idxs_in_2 = jnp.argmin(masked, axis=1)
    mask = min_dist <= dist_threshold
    return min_dist, idxs_in_2, mask, LHF2_in_1


# ---------------------------------------------------------------------------
# Differentiable geometric losses over mutually-nearest LAF pairs
# ---------------------------------------------------------------------------

def lhf_scale(LHF: Array) -> Array:
    return jnp.sqrt(jnp.abs(LHF[:, 0, 0] * LHF[:, 1, 1]
                            - LHF[:, 1, 0] * LHF[:, 0, 1]))


def closest_correspondences(LHF1: Array, LHF2_in_1: Array, xy_th: float,
                            scale_log: float):
    """Mutually-nearest pairs under center+log-scale distance, masked form
    (ReprojectionStuff.py:204-225).  Returns (pair_mask over LHF1 rows,
    nn_idxs_in_2)."""
    xy1 = LHF1[:, 0:2, 2]
    xy2in1 = LHF2_in_1[:, 0:2, 2]
    center = distance_matrix(xy1, xy2in1)          # rows = LAFs1
    s1 = lhf_scale(LHF1)
    s2 = lhf_scale(LHF2_in_1)
    scale = jnp.abs(jnp.log(ratio_matrix(s2, s1)))
    mm = (1000.0 * ((scale > scale_log) & (center > xy_th)).astype(center.dtype)
          + center + scale)
    d2_to_1 = jnp.min(mm, axis=1)
    nn_in_2 = jnp.argmin(mm, axis=1)       # for each LAF2 row: nearest LAF1
    nn_in_1 = jnp.argmin(mm, axis=0)       # for each LAF1 col: nearest LAF2
    flat = jnp.arange(mm.shape[0])
    mutual = (flat == nn_in_1[nn_in_2]) & (d2_to_1 <= 100.0)
    return mutual, nn_in_2


def laf_magic(LAFs1: Array, LAFs2: Array, H1to2: Array, xy_th: float = 5.0,
              scale_log: float = 0.4, t: float = 1.0, sc: float = 1.0,
              aff: float = 1.0):
    """Differentiable geometric loss over mutually-nearest pairs, masked
    variant of LAFMagic (ReprojectionStuff.py:228-259).  Returns
    (per-row loss, pair mask, idxs_in_2, LHF2_in_1[:, 0:2, :])."""
    LHF2_in_1 = reproject_lafs(LAFs2, jnp.linalg.inv(H1to2), True)
    LHF1 = lafs_to_h_frames(LAFs1)
    mutual, nn_in_2 = closest_correspondences(LHF1, LHF2_in_1, xy_th,
                                              scale_log)
    LHF1_good = LHF1
    LHF2_good = LHF2_in_1[nn_in_2]
    s1 = lhf_scale(LHF1_good)
    s2 = lhf_scale(LHF2_good)
    max_s = jnp.maximum(s1, s2)
    min_s = jnp.minimum(s1, s2)
    mean_s = 0.5 * (max_s + min_s)
    eps = 1e-12
    dist_loss = (jnp.sqrt(jnp.sum(
        (LHF1_good[:, 0:2, 2] - LHF2_good[:, 0:2, 2]) ** 2, axis=1) + eps)
        / jax.lax.stop_gradient(mean_s)) if t != 0 else 0.0
    scale_loss = jnp.log1p((max_s - min_s) / mean_s) if sc != 0 else 0.0
    if aff != 0:
        A1 = LHF1_good[:, :2, :2] / s1[:, None, None]
        A2 = LHF2_good[:, :2, :2] / s2[:, None, None]
        shape_loss = jnp.mean((A1 - A2) ** 2, axis=(1, 2))
    else:
        shape_loss = 0.0
    loss = t * dist_loss + sc * scale_loss + aff * shape_loss
    return loss, mutual, nn_in_2, LHF2_in_1[:, 0:2, :]


def laf_magic_fro(LAFs1: Array, LAFs2: Array, H1to2: Array,
                  xy_th: float = 5.0, scale_log: float = 0.4):
    """Frobenius variant (ReprojectionStuff.py:260-278)."""
    LHF2_in_1 = reproject_lafs(LAFs2, jnp.linalg.inv(H1to2), True)
    LHF1 = lafs_to_h_frames(LAFs1)
    mutual, nn_in_2 = closest_correspondences(LHF1, LHF2_in_1, xy_th,
                                              scale_log)
    LHF1_good = LHF1
    LHF2_good = LHF2_in_1[nn_in_2]
    s1 = lhf_scale(LHF1_good)
    s2 = lhf_scale(LHF2_good)
    mean_s = 0.5 * (jnp.maximum(s1, s2) + jnp.minimum(s1, s2))
    eps = 1e-12
    diff = (LHF1_good.reshape(-1, 9) - LHF2_good.reshape(-1, 9))
    loss = jnp.mean(jnp.sqrt(diff ** 2 + eps)
                    / jax.lax.stop_gradient(mean_s)[:, None], axis=1)
    return loss, mutual, nn_in_2, LHF2_in_1[:, 0:2, :]


def identity_loss(A: Array) -> Array:
    """Penalize deviation of predicted [A|t] from [I|0]
    (ReprojectionStuff.py:281-288)."""
    eye = jnp.concatenate([jnp.eye(2, dtype=A.dtype),
                           jnp.zeros((2, 1), A.dtype)], axis=1)
    per = jnp.sqrt((A - eye) ** 2 + 1e-15).reshape(A.shape[0], -1).mean(axis=1)
    return jnp.mean(jnp.clip(per, 0.0, 100.0))
