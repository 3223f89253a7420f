"""Train-time LAF augmentation: random rotations, tilts, shifts.

Reference: augmentation.py:20-57.  Base LAF [[0.5, 0, 0.5], [0, 0.5, 0.5]]
covers the central half of a patch in normalized coordinates.

All functions are pure: they take a jax PRNG key instead of mutating global
RNG state.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .laf import get_normalized_affine_shape, rotation_matrix

Array = jax.Array


def _base_lafs(n: int, dtype=jnp.float32) -> Array:
    base = jnp.asarray([[0.5, 0.0, 0.5], [0.0, 0.5, 0.5]], dtype)
    return jnp.broadcast_to(base, (n, 2, 3))


def get_random_rotation_lafs(key, n: int, angle_mag: float = math.pi
                             ) -> Tuple[Array, Array]:
    """Random-rotation LAFs + inverse rotation matrices
    (augmentation.py:20-29)."""
    phi = 2.0 * jax.random.uniform(key, (n,)) - 1.0
    rot = rotation_matrix(angle_mag * phi)
    inv_rot = rotation_matrix(-angle_mag * phi)
    lafs = _base_lafs(n)
    lafs = jnp.concatenate([rot @ lafs[:, :, 0:2], lafs[:, :, 2:]], axis=2)
    return lafs, inv_rot


def get_random_shifts(key, n: int, w_mag: int, h_mag: int = 3
                      ) -> Tuple[Array, Array]:
    """+-w_mag/4-px random center shifts (augmentation.py:31-39: integers in
    [0, 2*w_mag) minus w_mag/2, divided by 2)."""
    k1, k2 = jax.random.split(key)
    shift_w = (jax.random.randint(k1, (n,), 0, 2 * w_mag)
               - w_mag // 2).astype(jnp.float32) / 2.0
    shift_h = (jax.random.randint(k2, (n,), 0, 2 * w_mag)
               - w_mag // 2).astype(jnp.float32) / 2.0
    return shift_w, shift_h


def get_random_norm_affine_lafs(key, n: int, max_tilt: float = 1.0) -> Array:
    """Random det-1 tilt (U[1/t, t]) + rotation via
    get_normalized_affine_shape (augmentation.py:41-57).  ``max_tilt`` may be
    a traced scalar (the tilt curriculum feeds it per-epoch)."""
    k1, k2 = jax.random.split(key)
    tilt = 1.0 / max_tilt + (max_tilt - 1.0 / max_tilt) * \
        jax.random.uniform(k1, (n,))
    phi = math.pi * (2.0 * jax.random.uniform(k2, (n,)) - 1.0)
    TA = get_normalized_affine_shape(tilt, phi)
    lafs = _base_lafs(n)
    return jnp.concatenate([TA @ lafs[:, :, 0:2], lafs[:, :, 2:]], axis=2)


def extract_random_laf(key, data: Array, max_rot, max_tilt: float = 1.0,
                       crop_size: int = 32, align_corners: bool = False):
    """Random rot+tilt warp of (N, H, W) patches, center-cropped.

    ``max_rot``: float (max rotation magnitude) or precomputed rotation LAFs
    to share between anchor/positive ('Rot'-free archs share rotations,
    train_AffNet_test_on_graffity.py:176-188,206-210).

    Returns (cropped, warped_full, rot_lafs, inv_rotmat)."""
    from .ops.patches import extract_patches_batched
    n, h, w = data.shape
    st = (h - crop_size) // 2
    fin = st + crop_size
    k1, k2 = jax.random.split(key)
    if isinstance(max_rot, float):
        rot_lafs, inv_rotmat = get_random_rotation_lafs(k1, n, max_rot)
    else:
        rot_lafs, inv_rotmat = max_rot, None
    aff_lafs = get_random_norm_affine_lafs(k2, n, max_tilt)
    A = rot_lafs[:, 0:2, 0:2] @ aff_lafs[:, 0:2, 0:2]
    lafs = jnp.concatenate([A, aff_lafs[:, :, 2:]], axis=2)
    warped = extract_patches_batched(data, lafs, ps=h,
                                     align_corners=align_corners)
    return warped[:, st:fin, st:fin], warped, rot_lafs, inv_rotmat


def warp_by_predicted_transform(patches: Array, trans: Array,
                                crop_size: int = 32,
                                align_corners: bool = False) -> Array:
    """Re-warp full patches by a predicted 2x2 transform + center crop
    (extract_and_crop_patches_by_predicted_transform,
    train_AffNet_test_on_graffity.py:165-174).

    For the default align_corners=False grid, the center crop of the full
    ps=h warp EQUALS sampling at ps=crop_size with the linear part scaled by
    crop_size/h (the cropped grid rows are exactly the half-scale grid;
    verified bit-exact) — 4x fewer samples, and the halved extents keep the
    predicted (unbounded) transform inside the Pallas sampler's static
    window for everything but pathological outliers."""
    from .ops.patches import extract_patches_batched
    n, h, w = patches.shape
    base = _base_lafs(n, patches.dtype)
    if not align_corners and (h - crop_size) % 2 == 0:
        scale = crop_size / h
        lafs = jnp.concatenate([scale * (trans @ base[:, 0:2, 0:2]),
                                base[:, 0:2, 2:]], axis=2)
        return extract_patches_batched(patches, lafs, ps=crop_size,
                                       align_corners=False)
    st = (h - crop_size) // 2
    fin = st + crop_size
    lafs = jnp.concatenate([trans @ base[:, 0:2, 0:2], base[:, 0:2, 2:]],
                           axis=2)
    out = extract_patches_batched(patches, lafs, ps=h,
                                  align_corners=align_corners)
    return out[:, st:fin, st:fin]


def fliprot(key, img_a: Array, img_p: Array) -> Tuple[Array, Array]:
    """Random shared transpose + horizontal flip of an (N, H, W) pair batch
    — per-batch like the reference applies per-sample (dataset.py:275-286).
    Pure-jax variant used by the on-device input pipeline."""
    k1, k2 = jax.random.split(key)
    do_rot = jax.random.bernoulli(k1)
    do_flip = jax.random.bernoulli(k2)
    img_a = jnp.where(do_rot, jnp.swapaxes(img_a, 1, 2), img_a)
    img_p = jnp.where(do_rot, jnp.swapaxes(img_p, 1, 2), img_p)
    img_a = jnp.where(do_flip, img_a[:, :, ::-1], img_a)
    img_p = jnp.where(do_flip, img_p[:, :, ::-1], img_p)
    return img_a, img_p
