"""External-keypoint entry point: user-supplied keypoints -> AffNet shapes,
OriNet orientations, descriptors.

This is the reference's modern-usage story (the kornia notebook,
examples/SIFT-AffNet-HardNet-kornia-matching.ipynb cells 0-10): detect
keypoints with ANY detector (OpenCV DoG/SIFT, your own), then

  1. build base LAFs from (x, y, scale[, angle])           (cell 2:
     ``laf_from_opencv_kpts`` / kornia ``laf_from_center_scale_ori``)
  2. AffNet on upright patches -> det-1 upright shape A     (``extimate_
     affine_shape``: the 3-vector head -> upright 2x2, made upright and
     rescaled to unit scale)
  3. OriNet on shape-corrected patches -> orientation       (``estimate_
     orientation``)
  4. descriptor CNN on the final measurement patches        (``extract_
     descriptors``)

Composition conventions match the internal detector pipeline
(detector.py): shape LEFT-multiplies the base A, orientation
RIGHT-multiplies (SparseImgRepresenter.py:175-177), so the same shipped
weights behave identically on external keypoints.

Everything after step 1 is ONE jitted XLA program per (H, W, N) — patch
sampling runs the Pallas gather-as-matmul sampler via the single-level
pyramid path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .laf import rotation_matrix
from .ops.patches import extract_patches_pyramid

Array = jax.Array


def lafs_from_keypoints(x, y, scale, angle=None, img_hw=None,
                        mr_size: float = 6.0) -> Array:
    """(x, y) pixel centers, ``scale`` = keypoint size (diameter, OpenCV
    ``KeyPoint.size`` convention), optional ``angle`` in degrees (OpenCV
    convention: clockwise-positive; kornia negates it, cell 2) -> normalized
    (N, 2, 3) LAFs whose measurement radius is ``mr_size * scale / 2``
    pixels (kornia ``laf_from_center_scale_ori`` with the notebook's
    mrSize=6)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    s = jnp.asarray(scale, jnp.float32)
    h, w = img_hw
    m = float(min(h, w))
    r = (mr_size * s / 2.0) / m
    if angle is None:
        A = r[:, None, None] * jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32),
                                                (x.shape[0], 2, 2))
    else:
        th = -jnp.deg2rad(jnp.asarray(angle, jnp.float32))
        A = r[:, None, None] * rotation_matrix(th)
    t = jnp.stack([x / float(w), y / float(h)], axis=-1)[..., None]
    return jnp.concatenate([A, t], axis=2)


def _single_level_tables(h: int, w: int):
    return (jnp.zeros((1,), jnp.int32), jnp.asarray([h], jnp.int32),
            jnp.asarray([w], jnp.int32))


def _extract(img2d, lafs, ps, site):
    """Single-level extraction.  Unlike the pyramid path (extents bounded
    by level selection), external-keypoint extents are unbounded (~3*size px
    at mr_size=6), so every window miss must be recoverable: fallback slots
    = n (the recompute hides behind lax.cond at zero misses) and the
    overflow count is surfaced so describe_keypoints can warn (ADVICE r3)."""
    h, w = img2d.shape
    offs, hs, ws = _single_level_tables(h, w)
    lvl = jnp.zeros((lafs.shape[0],), jnp.int32)
    return extract_patches_pyramid(img2d, lafs, lvl, offs, hs, ws, ps=ps,
                                   site=site, fallback_slots=lafs.shape[0],
                                   return_miss_overflow=True)


def process_keypoints(img: Array, lafs: Array,
                      params: Optional[Dict] = None,
                      shape_net=None, ori_net=None, desc_net=None
                      ) -> Dict[str, Array]:
    """Run shape / orientation / description on base LAFs over one image.
    Any of the nets may be None to skip that stage (the notebook's
    DoG-OriNet-HardNet and DoG-AffNet-OriNet-HardNet variants).  Traced
    (jit-safe); see :func:`describe_keypoints` for the host API."""
    params = params or {}
    out = {}
    cur = lafs
    n_overflow = jnp.zeros((), jnp.int32)
    if shape_net is not None:
        patches, ovf = _extract(img, cur, shape_net.ps, "shape")
        n_overflow = n_overflow + ovf
        A = shape_net(params.get("aff"), patches)
        # det-1 upright shape (the notebook rescales by get_laf_scale and
        # make_upright; our AffNet head already rectifies upright).
        det = jnp.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
        A = A / jnp.sqrt(det + 1e-10)[:, None, None]
        out["shape"] = A
        cur = jnp.concatenate([A @ cur[:, :, :2], cur[:, :, 2:]], axis=2)
    if ori_net is not None:
        patches, ovf = _extract(img, cur, ori_net.ps, "ori")
        n_overflow = n_overflow + ovf
        rot = ori_net(params.get("ori"), patches, return_rot_matrix=True)
        out["angle"] = jnp.rad2deg(jnp.arctan2(rot[:, 1, 0], rot[:, 0, 0]))
        cur = jnp.concatenate([cur[:, :, :2] @ rot, cur[:, :, 2:]], axis=2)
    out["lafs"] = cur
    if desc_net is not None:
        patches, ovf = _extract(img, cur, 32, "desc")
        n_overflow = n_overflow + ovf
        out["patches"] = patches
        out["descs"] = desc_net(params.get("desc"), patches)
    out["n_overflow"] = n_overflow
    return out


@functools.lru_cache(maxsize=8)
def _jitted_process(h, w, n, shape_net, ori_net, desc_net):
    def fn(params, img, lafs):
        return process_keypoints(img, lafs, params, shape_net=shape_net,
                                 ori_net=ori_net, desc_net=desc_net)
    return jax.jit(fn)


def describe_keypoints(img, x, y, scale, angle=None,
                       params: Optional[Dict] = None, mr_size: float = 6.0,
                       shape_net=None, ori_net=None, desc_net=None
                       ) -> Dict[str, np.ndarray]:
    """Host API: image (H, W) + keypoint arrays -> dict with denormalized
    ``lafs`` (pixels), per-keypoint ``shape`` (det-1 upright 2x2, if
    shape_net), ``angle`` (degrees, if ori_net), ``descs`` (if desc_net)."""
    from .laf import denormalize_lafs
    img = jnp.asarray(np.asarray(img, np.float32))
    h, w = img.shape
    lafs = lafs_from_keypoints(x, y, scale, angle, (h, w), mr_size)
    fn = _jitted_process(h, w, lafs.shape[0], shape_net, ori_net, desc_net)
    out = dict(fn(params or {}, img, lafs))
    n_overflow = int(out.pop("n_overflow", 0))
    if n_overflow > 0:
        import warnings
        warnings.warn(
            f"describe_keypoints: {n_overflow} patch-window misses exceeded "
            "the fallback capacity and kept truncated samples (keypoint "
            "extents beyond the window classes)")
    out["lafs"] = denormalize_lafs(out["lafs"], w, h)
    return {k: np.asarray(v) for k, v in out.items()}
