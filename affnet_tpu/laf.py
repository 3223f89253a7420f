"""Local Affine Frame (LAF) algebra — pure, vmappable JAX functions.

A LAF is a ``(..., 2, 3)`` array ``[A | t]`` where ``A`` is a 2x2 affine
(scale * shape * rotation) and ``t = (x, y)`` is the frame center.  Inside the
pipeline LAFs live in *normalized* image coordinates (``A`` divided by
``min(h, w)``, ``t`` by ``(w, h)``); they are denormalized at the output.

Functional parity targets (reference: ducha-aiki/affnet):
  - invSqrt / invSqrtTorch              -> ``invsqrt2x2_sym``   (LAF.py:11-74)
  - bsvd2x2                             -> ``svd2x2``           (LAF.py:106-144)
  - rectifyAffineTransformationUpIsUp   -> ``rectify_up_is_up`` (LAF.py:285-297)
  - LAFs2ell(T)/ells2LAFs(T)            -> ``lafs_to_ells`` / ``ells_to_lafs``
                                           (LAF.py:35-89,154-182,225-240)
  - normalizeLAFs/denormalizeLAFs       -> ``normalize_lafs`` etc (LAF.py:407-429)
  - checkTouchBoundary                  -> ``check_touch_boundary`` (LAF.py:98-104)
  - sc_y_x2LAFs / sc_y_x_and_A2LAFs     -> ``sc_y_x_to_lafs`` etc (LAF.py:431-449)
  - get_normalized_affine_shape etc.    -> same names, snake_case (LAF.py:263-311)
  - batch_eig2x2                        -> ``eig2x2_vals``       (Utils.py:168-175)

All functions are shape-polymorphic over a leading batch dim and contain no
Python control flow on traced values, so they compose with jit/vmap/pjit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# 2x2 matrix primitives
# ---------------------------------------------------------------------------

def invsqrt2x2_sym(a: Array, b: Array, c: Array, eps: float = 1e-12):
    """Inverse square root of the SPD matrix [[a, b], [b, c]], via one Jacobi
    rotation (closed form).  Returns (a', b', c', l1, l2) with
    [[a',b'],[b',c']] = M^(-1/2) normalized to unit determinant, and
    l1 >= l2 the raw (unnormalized) inverse-sqrt eigenvalues.

    Reference: LAF.py:11-34 (numpy), HandCraftedModules.py:93-118.
    """
    mask = (b != 0).astype(a.dtype)
    r1 = mask * (c - a) / (2.0 * b + eps)
    t1 = jnp.sign(r1) / (jnp.abs(r1) + jnp.sqrt(1.0 + r1 * r1))
    r = 1.0 / jnp.sqrt(1.0 + t1 * t1)
    t = t1 * r
    r = r * mask + 1.0 * (1.0 - mask)
    t = t * mask

    x = 1.0 / jnp.sqrt(r * r * a - 2.0 * r * t * b + t * t * c)
    z = 1.0 / jnp.sqrt(t * t * a + 2.0 * r * t * b + r * r * c)
    d = jnp.sqrt(x * z)
    x = x / d
    z = z / d

    l1 = jnp.maximum(x, z)
    l2 = jnp.minimum(x, z)

    new_a = r * r * x + t * t * z
    new_b = -r * t * x + t * r * z
    new_c = t * t * x + r * r * z
    return new_a, new_b, new_c, l1, l2


def svd2x2(As: Array):
    """Closed-form batched SVD of (..., 2, 2) matrices via atan2 of the Gram
    matrices.  Returns (U, S, V) with As = U @ S @ V^T (same convention as the
    reference's bsvd2x2, LAF.py:106-144)."""
    AsT = jnp.swapaxes(As, -1, -2)
    Su = As @ AsT
    phi = 0.5 * jnp.arctan2(Su[..., 0, 1] + Su[..., 1, 0] + 1e-12,
                            Su[..., 0, 0] - Su[..., 1, 1] + 1e-12)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    U = jnp.stack([jnp.stack([cphi, -sphi], -1),
                   jnp.stack([sphi, cphi], -1)], -2)

    Sw = AsT @ As
    theta = 0.5 * jnp.arctan2(Sw[..., 0, 1] + Sw[..., 1, 0] + 1e-12,
                              Sw[..., 0, 0] - Sw[..., 1, 1] + 1e-12)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    W = jnp.stack([jnp.stack([cth, -sth], -1),
                   jnp.stack([sth, cth], -1)], -2)

    su_sum = Su[..., 0, 0] + Su[..., 1, 1]
    su_dif = jnp.sqrt((Su[..., 0, 0] - Su[..., 1, 1]) ** 2
                      + 4.0 * Su[..., 0, 1] * Su[..., 1, 0] + 1e-12)
    sig1 = jnp.sqrt((su_sum + su_dif) / 2.0)
    sig2 = jnp.sqrt(jnp.maximum((su_sum - su_dif) / 2.0, 0.0))
    zeros = jnp.zeros_like(sig1)
    SIG = jnp.stack([jnp.stack([sig1, zeros], -1),
                     jnp.stack([zeros, sig2], -1)], -2)

    S = jnp.swapaxes(U, -1, -2) @ As @ W
    # Sign-correction matrix keeps only the diagonal signs.
    c00 = jnp.sign(S[..., 0, 0])
    c11 = jnp.sign(S[..., 1, 1])
    C = jnp.stack([jnp.stack([c00, zeros], -1),
                   jnp.stack([zeros, c11], -1)], -2)
    V = W @ C
    return U, SIG, V


def eig2x2_vals(A: Array):
    """Closed-form eigenvalues of batched (..., 2, 2); complex pairs are mapped
    to the sentinel (1000, 1e-4) so that their ratio fails any sanity gate.
    Reference: Utils.py:168-175."""
    trace = A[..., 0, 0] + A[..., 1, 1]
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 1, 0] * A[..., 0, 1]
    delta1 = trace * trace - 4.0 * det
    mask = (delta1 > 0).astype(A.dtype)
    delta = jnp.sqrt(jnp.abs(delta1))
    l1 = mask * (trace + delta) / 2.0 + 1000.0 * (1.0 - mask)
    l2 = mask * (trace - delta) / 2.0 + 0.0001 * (1.0 - mask)
    return l1, l2


def rectify_up_is_up(A: Array) -> Array:
    """Canonicalize (..., 2, 2) affine so 'up stays up': zero the a12 entry
    while preserving determinant.  Reference: LAF.py:285-291."""
    det = jnp.sqrt(jnp.abs(A[..., 0, 0] * A[..., 1, 1]
                           - A[..., 1, 0] * A[..., 0, 1] + 1e-10))
    b2a2 = jnp.sqrt(A[..., 0, 1] * A[..., 0, 1] + A[..., 0, 0] * A[..., 0, 0])
    a11 = b2a2 / det
    a12 = jnp.zeros_like(det)
    a21 = (A[..., 1, 1] * A[..., 0, 1] + A[..., 1, 0] * A[..., 0, 0]) / (b2a2 * det)
    a22 = det / b2a2
    return jnp.stack([jnp.stack([a11, a12], -1),
                      jnp.stack([a21, a22], -1)], -2)


def rectify_up_is_up_dense(A: Array) -> Array:
    """Dense fully-convolutional rectify for per-pixel affine maps.

    ``A`` has shape (..., 4) with the last axis = (a11, a12, a21, a22); any
    leading spatial/batch dims.  Reference: LAF.py:293-297 (channel layout
    there is (n, 4, h, w); we use channels-last)."""
    det = jnp.sqrt(jnp.abs(A[..., 0] * A[..., 3] - A[..., 1] * A[..., 2] + 1e-10))
    b2a2 = jnp.sqrt(A[..., 1] * A[..., 1] + A[..., 0] * A[..., 0])
    return jnp.stack([
        b2a2 / det,
        jnp.zeros_like(det),
        (A[..., 3] * A[..., 1] + A[..., 2] * A[..., 0]) / (b2a2 * det),
        det / b2a2,
    ], axis=-1)


def abc2A(a: Array, b: Array, c: Array) -> Array:
    """Symmetric 2x2 from (a, b, c).  Reference: LAF.py:299-302."""
    return jnp.stack([jnp.stack([a, b], -1), jnp.stack([b, c], -1)], -2)


def rotation_matrix(angle: Array) -> Array:
    """Batched 2x2 rotation [[cos, sin], [-sin, cos]] (reference convention,
    LAF.py:276-283)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)


# torch reference's angles2A (LAF.py:306-311) is identical to rotation_matrix.
angles2A = rotation_matrix


def get_normalized_affine_shape(tilt: Array, angle: Array) -> Array:
    """det-1 tilt matrix R(phi) @ diag(t, 1) @ R(phi), rectified up-is-up
    (train-time shape augmentation).  Reference: LAF.py:263-274."""
    one = jnp.ones_like(tilt)
    zero = jnp.zeros_like(tilt)
    tilt_A = jnp.stack([jnp.stack([tilt, zero], -1),
                        jnp.stack([zero, one], -1)], -2)
    rot = rotation_matrix(angle)
    return rectify_up_is_up(rot @ tilt_A @ rot)


# ---------------------------------------------------------------------------
# LAF predicates / measures
# ---------------------------------------------------------------------------

def laf_scale(LAFs: Array) -> Array:
    """Per-LAF scale = sqrt(|det A|).  Reference: LAF.py:450-451."""
    A = LAFs[..., :2, :2]
    return jnp.sqrt(jnp.abs(A[..., 0, 0] * A[..., 1, 1]
                            - A[..., 0, 1] * A[..., 1, 0]) + 1e-12)


def laf_elongation(LAFs: Array) -> Array:
    """Axis ratio (>= 1) of each LAF.  Reference: LAF.py:146-148."""
    _, S, _ = svd2x2(LAFs[..., :2, :2])
    return (jnp.maximum(S[..., 0, 0], S[..., 1, 1])
            / jnp.minimum(S[..., 0, 0], S[..., 1, 1]))


def num_collapsed(LAFs: Array, th: float = 10.0) -> Array:
    """Count of degenerate (elongation > th) frames.  Reference: LAF.py:150-152."""
    return (laf_elongation(LAFs) > th).astype(jnp.float32).sum()


def lafs_to_h_frames(LAFs: Array) -> Array:
    """Append [0 0 1] row -> (..., 3, 3) homogeneous frames.
    Reference: LAF.py:91-95."""
    shape = LAFs.shape[:-2] + (1, 3)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], LAFs.dtype), shape)
    return jnp.concatenate([LAFs, bottom], axis=-2)


def check_touch_boundary(LAFs: Array) -> Array:
    """True for LAFs whose +-1 unit-square corners stay inside the normalized
    image [0, 1]^2.  Reference: LAF.py:98-104."""
    pts = jnp.array([[-1.0, -1.0, 1.0, 1.0],
                     [-1.0, 1.0, -1.0, 1.0],
                     [1.0, 1.0, 1.0, 1.0]], LAFs.dtype)
    out = (lafs_to_h_frames(LAFs) @ pts)[..., :2, :]
    bad = jnp.logical_or(out > 1.0, out < 0.0).sum(axis=(-1, -2)) > 0
    return jnp.logical_not(bad)


# ---------------------------------------------------------------------------
# Normalized <-> pixel coordinates
# ---------------------------------------------------------------------------

def _norm_coef(w: float, h: float, dtype=jnp.float32) -> Array:
    m = float(min(h, w))
    return jnp.array([[m, m, float(w)], [m, m, float(h)]], dtype)


def denormalize_lafs(LAFs: Array, w: int, h: int) -> Array:
    """Normalized image coords -> pixels.  Reference: LAF.py:407-417."""
    return LAFs * _norm_coef(w, h, LAFs.dtype)


def normalize_lafs(LAFs: Array, w: int, h: int) -> Array:
    """Pixels -> normalized image coords.  Reference: LAF.py:419-429."""
    return LAFs / _norm_coef(w, h, LAFs.dtype)


def sc_y_x_to_lafs(sc_y_x: Array) -> Array:
    """(scale, y, x) -> LAF = [scale*I | (x, y)].  Reference: LAF.py:431-441."""
    s = sc_y_x[..., 0]
    zero = jnp.zeros_like(s)
    return jnp.stack([jnp.stack([s, zero, sc_y_x[..., 2]], -1),
                      jnp.stack([zero, s, sc_y_x[..., 1]], -1)], -2)


def sc_y_x_and_A_to_lafs(sc_y_x: Array, A_flat: Array) -> Array:
    """(scale, y, x) + per-point dense 2x2 shape -> LAF.
    Reference: LAF.py:442-449."""
    A = A_flat.reshape(A_flat.shape[:-1] + (2, 2))
    A = sc_y_x[..., 0][..., None, None] * A
    t = jnp.stack([sc_y_x[..., 2], sc_y_x[..., 1]], -1)[..., None]
    return jnp.concatenate([A, t], axis=-1)


# ---------------------------------------------------------------------------
# LAF <-> Oxford ellipse (x y a b c) conversions
# ---------------------------------------------------------------------------

def lafs_to_ells(LAFs: Array) -> Array:
    """(N, 2, 3) LAFs -> (N, 5) Oxford ellipses (x, y, a, b, c) with
    [a b; b c] the inverse second-moment matrix.  Reference: LAF.py:35-51
    (torch) / LAF.py:225-240 (numpy)."""
    A = LAFs[..., :2, :2]
    scale = jnp.sqrt(A[..., 0, 0] * A[..., 1, 1]
                     - A[..., 0, 1] * A[..., 1, 0] + 1e-10)
    u, W, _ = svd2x2(A / scale[..., None, None])
    w1 = 1.0 / (scale * scale * W[..., 0, 0] ** 2)
    w2 = 1.0 / (scale * scale * W[..., 1, 1] ** 2)
    zeros = jnp.zeros_like(w1)
    Wi = jnp.stack([jnp.stack([w1, zeros], -1),
                    jnp.stack([zeros, w2], -1)], -2)
    E = u @ Wi @ jnp.swapaxes(u, -1, -2)
    return jnp.stack([LAFs[..., 0, 2], LAFs[..., 1, 2],
                      E[..., 0, 0], E[..., 0, 1], E[..., 1, 1]], -1)


def lafs_to_ells_host(lafs: "np.ndarray") -> "np.ndarray":
    """Host-side ells conversion for CLI output paths: eager jnp ops on a
    numpy input dispatch to the default (TPU) backend one op at a time
    through the axon tunnel (~15 s for 5000 LAFs, measured); pinning the
    computation to the CPU backend makes it milliseconds."""
    import numpy as np
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(lafs_to_ells(jnp.asarray(np.asarray(lafs))))


def ells_to_lafs(ells: Array) -> Array:
    """(N, 5) Oxford ellipses -> (N, 2, 3) upright LAFs.
    Reference: LAF.py:76-89."""
    a, b, c = ells[..., 2], ells[..., 3], ells[..., 4]
    sc = jnp.sqrt(jnp.sqrt(a * c - b * b + 1e-12))
    ia, ib, ic, _, _ = invsqrt2x2_sym(a, b, c)
    A = abc2A(ia / sc, ib / sc, ic / sc)
    sc2 = jnp.sqrt(jnp.abs(A[..., 0, 0] * A[..., 1, 1]
                           - A[..., 1, 0] * A[..., 0, 1]))
    A = rectify_up_is_up(A / sc2[..., None, None]) * sc2[..., None, None]
    t = jnp.stack([ells[..., 0], ells[..., 1]], -1)[..., None]
    return jnp.concatenate([A, t], axis=-1)


# ---------------------------------------------------------------------------
# Host-side (numpy) helpers: format conversion / plotting
# ---------------------------------------------------------------------------

def convert_lafs_to_a23(LAFs: np.ndarray) -> np.ndarray:
    """Accept (N,2,3), (N,7) = x y s a11 a12 a21 a22, or (N,6) flat formats.
    Reference: LAF.py:200-223."""
    LAFs = np.asarray(LAFs)
    sh = LAFs.shape
    if len(sh) == 3 and sh[1] == 2 and sh[2] == 3:
        return LAFs.copy()
    if len(sh) == 2 and sh[1] == 7:
        out = np.zeros((sh[0], 2, 3), LAFs.dtype)
        out[:, 0, 2] = LAFs[:, 0]
        out[:, 1, 2] = LAFs[:, 1]
        out[:, 0, 0] = LAFs[:, 2] * LAFs[:, 3]
        out[:, 0, 1] = LAFs[:, 2] * LAFs[:, 4]
        out[:, 1, 0] = LAFs[:, 2] * LAFs[:, 5]
        out[:, 1, 1] = LAFs[:, 2] * LAFs[:, 6]
        return out
    if len(sh) == 2 and sh[1] == 6:
        out = np.zeros((sh[0], 2, 3), LAFs.dtype)
        out[:, 0, 2] = LAFs[:, 0]
        out[:, 1, 2] = LAFs[:, 1]
        out[:, 0, 0] = LAFs[:, 2]
        out[:, 0, 1] = LAFs[:, 3]
        out[:, 1, 0] = LAFs[:, 4]
        out[:, 1, 1] = LAFs[:, 5]
        return out
    raise ValueError(f"Unknown LAF format with shape {sh}")


def laf_to_boundary_pts(LAF: np.ndarray, n_pts: int = 50) -> np.ndarray:
    """Sample n_pts ellipse boundary points (plus center) of a LAF for
    plotting.  Reference: LAF.py:184-197."""
    a = np.linspace(0, 2 * np.pi, n_pts)
    x = np.concatenate([[0], np.sin(a)]).reshape(1, -1)
    y = np.concatenate([[0], np.cos(a)]).reshape(1, -1)
    H = np.concatenate([LAF, np.array([[0.0, 0.0, 1.0]])])
    pts = np.concatenate([x, y, np.ones_like(x)])
    out = (H @ pts).T
    out[:, 0] /= out[:, 2]
    out[:, 1] /= out[:, 2]
    return out[:, :2]


def visualize_lafs(img, LAFs, color="r", show=False, save_to=None):
    """Matplotlib ellipse overlay.  Reference: LAF.py:242-259."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    work = convert_lafs_to_a23(np.asarray(LAFs))
    plt.close("all")
    plt.figure()
    plt.imshow(255 - np.asarray(img))
    for i in range(len(work)):
        ell = laf_to_boundary_pts(work[i])
        plt.plot(ell[:, 0], ell[:, 1], color)
    if show:
        plt.show()
    if save_to is not None:
        plt.savefig(save_to)
