"""3-D (scale-space) non-max suppression + soft-argmax keypoint composition.

Reference: NMS2d/NMS3d (HandCraftedModules.py:194-220) and NMS3dAndComposeA
(HandCraftedModules.py:222-291).  The reference emits a *variable-length*
keypoint list per level via ``torch.nonzero``/``topk``; here every map stays
dense and static-shaped, and selection happens once, globally, with a masked
top-k — so the whole detector is a single XLA program.

Semantics preserved exactly:
  - a center-level pixel survives iff cur + 1e-5 > max over the 3x3x3 cube
    spanning (low, cur, high)                                    (:208-220)
  - responses in a border of width int(mrSize) are zeroed        (:246-250,
    Utils.py:140-148) — note the reference zeroes by mrSize, NOT the ctor
    ``border`` argument; we keep that behavior
  - octave dedup map: a pixel claimed by a previous level in the same octave
    suppresses later levels; the map update uses float->byte truncation in the
    reference (:248,256), i.e. only responses >= 1.0 mark the map — replicated
    via floor()
  - sub-pixel/sub-scale refinement = weighted average of (sigma, y, x) over
    the 3x3x3 response cube (zero-padded), then absolute pixel coords,
    normalized by (min(h,w), h, w)                               (:266-290)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

NMS_EPS = 1e-5


def _maxpool3x3(x: Array) -> Array:
    """3x3 stride-1 max pool with -inf padding, as shifted-slice maxes (a
    1-channel reduce_window wastes TPU vector lanes)."""
    h, w = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1)), constant_values=-jnp.inf)
    rows = [jax.lax.dynamic_slice_in_dim(xp, i, h, 0) for i in range(3)]
    out = None
    for r in rows:
        rm = jnp.maximum(jnp.maximum(
            jax.lax.dynamic_slice_in_dim(r, 0, w, 1),
            jax.lax.dynamic_slice_in_dim(r, 1, w, 1)),
            jax.lax.dynamic_slice_in_dim(r, 2, w, 1))
        out = rm if out is None else jnp.maximum(out, rm)
    return out


def nms2d(x: Array, threshold: float = 0.0) -> Array:
    """2-D max-pool-equality NMS on (H, W).  Reference: NMS2d (:194-206)."""
    mp = _maxpool3x3(x)
    keep = (x - mp + NMS_EPS) > 0
    if threshold > NMS_EPS:
        keep = jnp.logical_and(keep, x > threshold)
    return keep.astype(x.dtype) * x


def nms3d_center(low: Array, cur: Array, high: Array,
                 threshold: float = 0.0) -> Array:
    """Center-level 3x3x3 NMS: cur survives iff it is (within 1e-5 of) the max
    of the 27-neighborhood across the three scale slices.
    Reference: NMS3d (:208-220) applied at [:, 1:2] (:248)."""
    m = jnp.maximum(jnp.maximum(low, cur), high)
    mp = _maxpool3x3(m)
    keep = (cur - mp + NMS_EPS) > 0
    if threshold > NMS_EPS:
        keep = jnp.logical_and(keep, cur > threshold)
    return keep.astype(cur.dtype) * cur


def border_mask(h: int, w: int, b: int, dtype=jnp.float32) -> Array:
    """1 inside, 0 in a b-wide frame.  Reference: zero_response_at_border
    (Utils.py:140-148); returns all-zeros when the border swallows the map."""
    if b >= h or b >= w:
        return jnp.zeros((h, w), dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((row >= b) & (row < h - b) & (col >= b) & (col < w - b))
    return inside.astype(dtype)


def _softargmax_kernel(sigmas3: Sequence[float]) -> np.ndarray:
    """OIHW kernel (4, 3, 3, 3): output channels = (sigma-weight, dy, dx, ones).
    Matches generate_3dgrid(scales, 3, 3) reshaped at
    HandCraftedModules.py:266-270 plus the all-ones denominator kernel.

    NOTE the spatial offsets are [-0.5, 0.5, 1.5], NOT [-1, 0, 1]:
    generate_2dgrid(3, 3, centered=True) is linspace(-w/2+1, w/2, w)
    (Utils.py:116-124), which for w=3 is off-center by +0.5.  The reference's
    sub-pixel refinement therefore carries a systematic +0.5-pixel bias;
    preserved here for exact parity (all downstream constants were tuned
    against it)."""
    k = np.zeros((4, 3, 3, 3), np.float32)
    for l in range(3):
        k[0, l, :, :] = sigmas3[l]
    for di in range(3):
        k[1, :, di, :] = di - 0.5
    for dj in range(3):
        k[2, :, :, dj] = dj - 0.5
    k[3] = 1.0
    return k


def softargmax_scale_y_x(low: Array, cur: Array, high: Array,
                         sigmas3: Sequence[float]) -> Tuple[Array, Array, Array]:
    """Per-pixel soft-argmax refinement maps over the 3x3x3 response cube.

    Returns (scale, y, x) maps of shape (H, W) in *normalized* coordinates:
    scale / min(h, w), y / h, x / w — exactly NMS3dAndComposeA:279-290.

    Implemented as shifted-slice accumulation (separable in the offsets):
    per level, row sums r0/r1/r2 over the 3 columns feed the (z, y, x, den)
    accumulators — tiny-channel convs waste TPU vector lanes; this fuses
    into a few VPU stencil passes."""
    h, w = cur.shape
    kern = _softargmax_kernel(sigmas3)          # offsets doc'd there

    def shifts2d(m):
        """sum over the 3x3 window (zero pad) and x/y-offset-weighted sums."""
        mp = jnp.pad(m, ((1, 1), (1, 1)))
        rows = [jax.lax.dynamic_slice_in_dim(mp, i, h, 0) for i in range(3)]
        # column triplets for each row shift
        s = jnp.zeros_like(m)
        sy = jnp.zeros_like(m)
        sx = jnp.zeros_like(m)
        for di, r in enumerate(rows):
            cols = [jax.lax.dynamic_slice_in_dim(r, j, w, 1) for j in range(3)]
            rsum = cols[0] + cols[1] + cols[2]
            s = s + rsum
            sy = sy + (di - 0.5) * rsum
            # x offsets are [-0.5, 0.5, 1.5] (reference grid bias).
            sx = sx + (-0.5 * cols[0] + 0.5 * cols[1] + 1.5 * cols[2])
        return s, sy, sx

    num_z = jnp.zeros_like(cur)
    num_y = jnp.zeros_like(cur)
    num_x = jnp.zeros_like(cur)
    den = jnp.zeros_like(cur)
    for lvl, m in enumerate((low, cur, high)):
        s, sy, sx = shifts2d(m)
        den = den + s
        num_z = num_z + sigmas3[lvl] * s
        num_y = num_y + sy
        num_x = num_x + sx
    den = den + 1e-8
    sc = num_z / den
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(cur.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(cur.dtype)
    y = num_y / den + row
    x = num_x / den + col
    min_size = float(min(h, w))
    return sc / min_size, y / float(h), x / float(w)


def update_octave_map(octave_map: Array, nmsed: Array) -> Tuple[Array, Array]:
    """Apply the octave dedup map to a fresh NMS response and produce the
    updated map.  Returns (masked_response, new_map).

    Two reference quirks preserved exactly:
      - a level whose (post-mask) survivor count is <= 1 is dropped entirely
        and does NOT update the map (NMS3dAndComposeA returns None and the
        caller ``continue``s; HandCraftedModules.py:252-254,
        SparseImgRepresenter.py:89-90)
      - the map is stored as bytes and updated with
        ``(map.float() + resp).byte()`` (:248,256) — float->uint8 truncation,
        so only responses >= 1.0 actually claim a pixel.  Replicated via
        floor()."""
    masked = nmsed * (1.0 - octave_map)
    keep = ((masked > 0).sum() > 1).astype(nmsed.dtype)
    masked = masked * keep
    new_map = (jnp.floor(octave_map + masked) > 0).astype(nmsed.dtype)
    return masked, new_map


def _row_topm(x2d: Array, m: int) -> Tuple[Array, Array, Array]:
    """Per-row top-m of (B, S) by m rounds of vectorized argmax-and-mask.
    Among equal values the LOWEST column wins first (jnp.argmax picks the
    first maximum), so extraction order matches a (value desc, index asc)
    sort.  Returns (vals (B, m), cols (B, m), leftover_max (B,)) where
    leftover_max is the (m+1)-th largest per row (-1 when the row is
    exhausted)."""
    b, s = x2d.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    cur = x2d
    vals, cols = [], []
    for _ in range(m):
        amax = jnp.argmax(cur, axis=1)
        vals.append(jnp.take_along_axis(cur, amax[:, None], axis=1)[:, 0])
        cols.append(amax.astype(jnp.int32))
        cur = jnp.where(col == amax[:, None], -1.0, cur)
    return (jnp.stack(vals, 1), jnp.stack(cols, 1),
            jnp.max(cur, axis=1))


# Use the Pallas row-top-m kernel (ops/pallas_topk.py) inside
# two-stage top-k on sufficiently large inputs; tests/conftest leaves this
# on (the kernel runs interpreted on CPU) but the XLA extraction above is
# the reference implementation.
USE_PALLAS_TOPK = True

# Row width and per-row candidate count of the two-stage top-k.  With
# S=1024, a fallback to the full sort happens only when >M_CAND keypoints
# of the global top-k live in the same 1024 contiguous flat pixels (one
# image-row segment of one response map) — rare, detected exactly on
# device, and then answered by the full sort, so the result is ALWAYS
# bit-identical to lax.top_k.
ROW_S = 1024
M_CAND = 16


def _two_stage_topk(values: Array, k: int) -> Tuple[Array, Array]:
    """Exact top-k for large flat vectors: per-row top-m candidates, then a
    two-key sort by (value desc, flat index asc) — the same tie semantics as
    ``lax.top_k`` — with an on-device exactness check that falls back to the
    full sort via ``lax.cond`` when any row's (m+1)-th value could reach the
    k-th selected value.

    The flat 8M-element sort (``lax.top_k`` ~18 ms) and the PartialReduce
    custom call (``approx_max_k`` ~14 ms) were both ~300x off memory
    bandwidth at 1080p; this pass is bandwidth-bound (one streaming read of
    the response vector + O(B*m) sorting).

    Identical to ``lax.top_k`` on every POSITIVE entry (values, indices,
    order, ties).  When k exceeds the positive count, the zero tail may be
    padded from different (equally invalid: ``vals > 0`` defines validity)
    zero positions than lax.top_k's lowest-index zeros."""
    n = values.shape[0]
    b = -(-n // ROW_S)
    pad = b * ROW_S - n
    x2d = jnp.pad(values, (0, pad), constant_values=-1.0).reshape(b, ROW_S)
    if USE_PALLAS_TOPK:
        from .pallas_topk import row_topm_pallas
        rv, rc, leftover = row_topm_pallas(x2d, M_CAND)
    else:
        rv, rc, leftover = _row_topm(x2d, M_CAND)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (b, M_CAND), 0)
    flat_idx = jnp.minimum(row0 * ROW_S + rc, n - 1)

    # Candidate order is (row asc, extraction order): within a row equal
    # values are extracted lowest-column-first, and rows ascend in flat-index
    # order, so lax.top_k's lowest-position tie rule over this array equals
    # the (value desc, flat index asc) rule over the original vector.
    cand_v = rv.reshape(-1)
    cand_idx = flat_idx.reshape(-1)
    top_v, pos = jax.lax.top_k(cand_v, k)
    top_i = cand_idx[pos]
    kth = top_v[k - 1]
    # A row can hide values only if its leftover could tie/beat the k-th
    # selected value; leftover <= 0 rows hide only padding/non-survivors.
    ok = jnp.all((leftover < kth) | (leftover <= 0.0))

    def exact(_):
        return top_v, top_i

    def full_sort(_):
        v, i = jax.lax.top_k(values, k)
        return v, i.astype(jnp.int32)

    return jax.lax.cond(ok, exact, full_sort, None)


def masked_topk(values: Array, k: int) -> Tuple[Array, Array, Array]:
    """Global top-k with validity mask: returns (vals, idxs, valid) where
    ``valid[i] = vals[i] > 0``.  Zero-response entries act as padding.

    Equivalent to the reference's per-level topk + global topk cascade
    (HandCraftedModules.py:259-263 + SparseImgRepresenter.py:104-108): any
    element of the global top-k is necessarily in its own level's top-k, so a
    single global top-k selects the identical set.

    Large inputs route through the hierarchical two-stage reduction
    (:func:`_two_stage_topk`), which is bit-identical to ``lax.top_k``
    (ties broken by lowest flat index) but bandwidth-bound instead of
    sort-bound (the 1080p detection top-k was 14.4 ms as a flat
    PartialReduce; see tests/test_utils.py for the tie-equivalence tests)."""
    # The two-stage pass can only surface ceil(n/ROW_S)*M_CAND candidates;
    # k beyond that (e.g. --max-keypoints 8192 on a mid-size image) must
    # take the full sort or lax.top_k(cand_v, k) errors at trace time.
    n_cand = (-(-values.size // ROW_S)) * M_CAND
    if values.size > (1 << 18) and 1 <= k <= n_cand:
        vals, idxs = _two_stage_topk(values, k)
        return vals, idxs, vals > 0
    vals, idxs = jax.lax.top_k(values, k)
    return vals, idxs, vals > 0
