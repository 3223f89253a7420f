"""Property tests for the pure LAF algebra (affnet_tpu/laf.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from affnet_tpu import laf


def rand_spd(rng, n):
    """Random SPD 2x2 as (a, b, c) triples."""
    A = rng.rand(n, 2, 2) - 0.5
    M = A @ np.transpose(A, (0, 2, 1)) + 0.2 * np.eye(2)
    return M[:, 0, 0], M[:, 0, 1], M[:, 1, 1]


def rand_affine(rng, n, min_det=0.05):
    A = rng.rand(n, 2, 2) - 0.5
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    A[det < 0] = A[det < 0][:, ::-1]        # make det positive
    det = np.abs(det)
    A += np.eye(2) * (min_det + 0.5)
    return A.astype(np.float32)


class TestInvSqrt:
    def test_is_inverse_sqrt(self):
        rng = np.random.RandomState(0)
        a, b, c = rand_spd(rng, 64)
        na, nb, nc, l1, l2 = laf.invsqrt2x2_sym(jnp.asarray(a), jnp.asarray(b),
                                                jnp.asarray(c))
        na, nb, nc = np.asarray(na), np.asarray(nb), np.asarray(nc)
        # [na nb; nb nc] is the unit-det normalization of M^(-1/2):
        # check it diagonalizes M: S @ M @ S should be ~ proportional to I.
        for i in range(64):
            S = np.array([[na[i], nb[i]], [nb[i], nc[i]]])
            M = np.array([[a[i], b[i]], [b[i], c[i]]])
            out = S @ M @ S
            assert abs(out[0, 1]) < 1e-4 * max(1.0, abs(out[0, 0]))
            assert abs(out[0, 0] - out[1, 1]) < 1e-3 * abs(out[0, 0])
            assert abs(np.linalg.det(S) - 1.0) < 1e-4

    def test_matches_numpy_reference_formula(self):
        # Direct check against scipy's matrix inverse sqrt, up to det-1 scaling.
        from scipy.linalg import sqrtm
        rng = np.random.RandomState(1)
        a, b, c = rand_spd(rng, 16)
        na, nb, nc, _, _ = laf.invsqrt2x2_sym(jnp.asarray(a), jnp.asarray(b),
                                              jnp.asarray(c))
        for i in range(16):
            M = np.array([[a[i], b[i]], [b[i], c[i]]])
            S_ref = np.linalg.inv(sqrtm(M).real)
            S_ref = S_ref / np.sqrt(np.linalg.det(S_ref))
            S = np.array([[na[i], nb[i]], [nb[i], nc[i]]])
            np.testing.assert_allclose(S, S_ref, atol=1e-4)


class TestSVD2x2:
    def test_reconstruction(self):
        rng = np.random.RandomState(2)
        A = rand_affine(rng, 128)
        U, S, V = laf.svd2x2(jnp.asarray(A))
        recon = np.asarray(U @ S @ jnp.swapaxes(V, -1, -2))
        np.testing.assert_allclose(recon, A, atol=1e-4)

    def test_singular_values_match_numpy(self):
        rng = np.random.RandomState(3)
        A = rand_affine(rng, 64)
        _, S, _ = laf.svd2x2(jnp.asarray(A))
        s_ours = np.stack([np.asarray(S)[:, 0, 0], np.asarray(S)[:, 1, 1]], -1)
        s_np = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(s_ours, s_np, atol=1e-4)


class TestRectify:
    def test_zeroes_a12_unit_det_same_shape(self):
        """rectify returns the unit-det up-is-up *shape* of A: a12 = 0,
        det = 1, positive diagonal, and R R^T == A A^T / |det A| (it rotates
        A on the right, preserving the mapped ellipse up to scale)."""
        rng = np.random.RandomState(4)
        A = rand_affine(rng, 64)
        R = np.asarray(laf.rectify_up_is_up(jnp.asarray(A)))
        assert np.abs(R[:, 0, 1]).max() == 0.0
        det_in = np.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
        det_out = R[:, 0, 0] * R[:, 1, 1]
        np.testing.assert_allclose(det_out, 1.0, rtol=1e-4)
        assert (R[:, 0, 0] > 0).all() and (R[:, 1, 1] > 0).all()
        np.testing.assert_allclose(
            R @ np.transpose(R, (0, 2, 1)),
            A @ np.transpose(A, (0, 2, 1)) / det_in[:, None, None], rtol=1e-3)

    def test_dense_matches_batched(self):
        rng = np.random.RandomState(5)
        A = rand_affine(rng, 32)
        R1 = np.asarray(laf.rectify_up_is_up(jnp.asarray(A)))
        flat = A.reshape(32, 4)
        R2 = np.asarray(laf.rectify_up_is_up_dense(jnp.asarray(flat)))
        np.testing.assert_allclose(
            R2, R1.reshape(32, 4), atol=1e-5)


class TestEllConversions:
    def test_roundtrip(self):
        rng = np.random.RandomState(6)
        n = 32
        ells = np.zeros((n, 5), np.float32)
        ells[:, 0] = rng.rand(n) * 100
        ells[:, 1] = rng.rand(n) * 100
        a, b, c = rand_spd(rng, n)
        ells[:, 2], ells[:, 3], ells[:, 4] = a, b, c
        lafs = laf.ells_to_lafs(jnp.asarray(ells))
        back = np.asarray(laf.lafs_to_ells(lafs))
        np.testing.assert_allclose(back, ells, rtol=2e-3, atol=2e-3)

    def test_lafs_to_ells_matches_numpy_svd(self):
        rng = np.random.RandomState(7)
        n = 16
        A = rand_affine(rng, n) * 20
        lafs = np.concatenate([A, rng.rand(n, 2, 1).astype(np.float32) * 50],
                              axis=2)
        ours = np.asarray(laf.lafs_to_ells(jnp.asarray(lafs)))
        # reference numpy path (LAF.py:225-240)
        for i in range(n):
            scale = np.sqrt(A[i, 0, 0] * A[i, 1, 1]
                            - A[i, 0, 1] * A[i, 1, 0] + 1e-10)
            u, W, v = np.linalg.svd(A[i] / scale, full_matrices=True)
            W = 1.0 / (W * W * scale * scale)
            E = u @ np.diag(W) @ u.T
            np.testing.assert_allclose(
                ours[i], [lafs[i, 0, 2], lafs[i, 1, 2],
                          E[0, 0], E[0, 1], E[1, 1]], rtol=2e-3, atol=1e-3)


class TestNormalization:
    def test_roundtrip(self):
        rng = np.random.RandomState(8)
        lafs = jnp.asarray(rng.rand(16, 2, 3).astype(np.float32) * 40)
        out = laf.denormalize_lafs(laf.normalize_lafs(lafs, 640, 480), 640, 480)
        np.testing.assert_allclose(np.asarray(out), np.asarray(lafs), rtol=1e-6)


class TestBoundary:
    def test_check_touch_boundary(self):
        # LAF well inside the unit square.
        inside = jnp.asarray([[[0.05, 0.0, 0.5], [0.0, 0.05, 0.5]]])
        # LAF centered at the edge.
        outside = jnp.asarray([[[0.05, 0.0, 0.01], [0.0, 0.05, 0.5]]])
        good = laf.check_touch_boundary(
            jnp.concatenate([inside, outside], axis=0))
        assert bool(good[0]) and not bool(good[1])


class TestEig:
    def test_real_eigs(self):
        A = jnp.asarray([[[3.0, 0.0], [1.0, 1.0]]])
        l1, l2 = laf.eig2x2_vals(A)
        np.testing.assert_allclose([float(l1[0]), float(l2[0])], [3.0, 1.0],
                                   atol=1e-5)

    def test_complex_sentinel(self):
        R = jnp.asarray([[[0.0, -1.0], [1.0, 0.0]]])  # rotation: complex eigs
        l1, l2 = laf.eig2x2_vals(R)
        assert float(l1[0]) == 1000.0 and abs(float(l2[0]) - 0.0001) < 1e-8


class TestFormats:
    def test_convert_formats(self):
        rng = np.random.RandomState(9)
        n = 8
        x, y, s = rng.rand(n) * 10, rng.rand(n) * 10, rng.rand(n) + 0.5
        a = rng.rand(n, 4) - 0.5
        seven = np.stack([x, y, s, a[:, 0], a[:, 1], a[:, 2], a[:, 3]], -1)
        out = laf.convert_lafs_to_a23(seven)
        np.testing.assert_allclose(out[:, 0, 0], s * a[:, 0])
        np.testing.assert_allclose(out[:, 0, 2], x)
        six = np.stack([x, y, a[:, 0], a[:, 1], a[:, 2], a[:, 3]], -1)
        out6 = laf.convert_lafs_to_a23(six)
        np.testing.assert_allclose(out6[:, 1, 0], a[:, 2])

    def test_elongation(self):
        A = jnp.asarray([[[4.0, 0.0], [0.0, 1.0]],
                         [[1.0, 0.0], [0.0, 1.0]]])
        lafs = jnp.concatenate([A, jnp.zeros((2, 2, 1))], axis=2)
        el = np.asarray(laf.laf_elongation(lafs))
        np.testing.assert_allclose(el, [4.0, 1.0], atol=1e-4)
        assert float(laf.num_collapsed(lafs, 3.0)) == 1.0
