"""Tests for matching, losses, reprojection, and augmentation."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu import augmentation, losses, match, reproj
from affnet_tpu.laf import lafs_to_h_frames


def rand_desc(rng, n, d=128):
    x = rng.rand(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestMatch:
    def test_distance_matrix_exact(self):
        rng = np.random.RandomState(0)
        a, b = rand_desc(rng, 10), rand_desc(rng, 12)
        d = np.asarray(match.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        expected = np.linalg.norm(a[:, None] - b[None, :], axis=2)
        np.testing.assert_allclose(d, expected, atol=1e-2)

    def test_snn_identity(self):
        rng = np.random.RandomState(1)
        a = rand_desc(rng, 30)
        i1, i2 = match.snn_match_host(a, a, 0.8)
        np.testing.assert_array_equal(i1, i2)
        assert len(i1) == 30

    def test_snn_threshold_rejects_ambiguous(self):
        # Two identical rows in desc2 -> ratio ~1 -> rejected.
        rng = np.random.RandomState(2)
        a = rand_desc(rng, 4)
        b = np.concatenate([a, a[:1]], axis=0)    # duplicate of row 0
        i1, i2 = match.snn_match_host(a, b, 0.8)
        assert 0 not in i1          # ambiguous match rejected
        assert len(i1) == 3


class TestLosses:
    def setup_method(self, _):
        rng = np.random.RandomState(3)
        self.a = jnp.asarray(rand_desc(rng, 16))
        noise = rng.rand(16, 128).astype(np.float32) * 0.05
        p = np.asarray(self.a) + noise
        self.p = jnp.asarray(p / np.linalg.norm(p, axis=1, keepdims=True))

    def test_hardnet_positive_and_finite(self):
        for br in ("min", "average", "random"):
            l = float(losses.loss_hardnet(self.a, self.p, batch_reduce=br,
                                          rng=jax.random.PRNGKey(0)))
            assert np.isfinite(l) and l >= 0
        for lt in ("softmax", "contrastive"):
            assert np.isfinite(float(losses.loss_hardnet(self.a, self.p,
                                                         loss_type=lt)))

    def test_hardnet_perfect_embedding_low_loss(self):
        # Orthogonal anchors with identical positives: pos dist ~0,
        # neg dist = sqrt(2) -> loss = margin + 0 - sqrt(2) < margin.
        eye = jnp.eye(16, 128 // 8).reshape(16, -1)
        eye = jnp.concatenate([eye] * 8, axis=1) / np.sqrt(8)
        l = float(losses.loss_hardnet(eye, eye))
        assert l < 0.01 or l < 1.0 - 0.3

    def test_hardnegc_grads_flow(self):
        def f(a):
            return losses.loss_hardnegc(a, self.p)
        g = jax.grad(f)(self.a)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_l2net_and_random_sampling(self):
        assert np.isfinite(float(losses.loss_l2net(self.a, self.p)))
        rng = np.random.RandomState(4)
        n = jnp.asarray(rand_desc(rng, 16))
        assert np.isfinite(float(losses.loss_random_sampling(self.a, self.p,
                                                             n)))

    def test_gor_and_snn(self):
        rng = np.random.RandomState(5)
        n = jnp.asarray(rand_desc(rng, 16))
        assert np.isfinite(float(losses.global_orthogonal_regularization(
            self.a, n)))
        snn = np.asarray(losses.get_snn(self.a, self.p))
        assert snn.shape == (16,)
        assert (snn < 1.0).mean() > 0.8    # positives closer than negatives


class TestReproj:
    def test_linh_identity(self):
        H = jnp.eye(3)
        x = jnp.asarray([10.0, 20.0])
        y = jnp.asarray([5.0, 8.0])
        A = np.asarray(reproj.linH(H, x, y))
        np.testing.assert_allclose(A, np.tile(np.eye(2), (2, 1, 1)), atol=1e-6)

    def test_linh_affine(self):
        # For an affine H the Jacobian equals the linear part everywhere.
        H = jnp.asarray([[2.0, 0.5, 3.0], [0.1, 1.5, -2.0], [0.0, 0.0, 1.0]])
        A = np.asarray(reproj.linH(H, jnp.asarray([7.0]), jnp.asarray([9.0])))
        np.testing.assert_allclose(A[0], [[2.0, 0.5], [0.1, 1.5]], atol=1e-5)

    def test_reproject_roundtrip(self):
        rng = np.random.RandomState(6)
        lafs = jnp.asarray(rng.rand(8, 2, 3).astype(np.float32) * 50)
        H = jnp.asarray(np.array([[1.1, 0.1, 5.0], [-0.05, 0.9, -3.0],
                                  [1e-4, -2e-4, 1.0]], np.float32))
        fwd = reproj.reproject_lafs(lafs, H)
        back = reproj.reproject_lafs(fwd, jnp.linalg.inv(H))
        np.testing.assert_allclose(np.asarray(back)[:, :, 2],
                                   np.asarray(lafs)[:, :, 2], atol=1e-2)

    def test_gt_correspondence_identity(self):
        rng = np.random.RandomState(7)
        lafs = rng.rand(20, 2, 3).astype(np.float32) * 100
        md, in1, in2 = reproj.get_gt_correspondence_indexes(
            lafs, lafs, np.eye(3, dtype=np.float32), 6.0)
        assert len(in1) == 20
        np.testing.assert_array_equal(in1, in2)

    def test_gt_correspondence_rejects_far(self):
        rng = np.random.RandomState(8)
        lafs1 = rng.rand(10, 2, 3).astype(np.float32) * 100
        lafs2 = lafs1.copy()
        lafs2[:, :, 2] += 50.0     # move all centers far away
        md, in1, in2 = reproj.get_gt_correspondence_indexes(
            lafs1, lafs2, np.eye(3, dtype=np.float32), 6.0)
        assert len(in1) == 0

    def test_affine_aug_consistency(self):
        """H_orig2new maps original pixel coords to warped coords: verify by
        tracking a bright dot."""
        img = np.zeros((40, 40), np.float32)
        img[18:22, 24:28] = 1.0
        key = jax.random.PRNGKey(3)
        new_img, H = reproj.affine_aug(jnp.asarray(img), key, max_add=0.2)
        new_img, H = np.asarray(new_img), np.asarray(H)
        # Original dot center (x=25.5, y=19.5) -> predicted new position.
        pt = H @ np.array([25.5, 19.5, 1.0])
        pt = pt[:2] / pt[2]
        ys, xs = np.nonzero(new_img > 0.5 * new_img.max())
        cx, cy = xs.mean(), ys.mean()
        assert abs(cx - pt[0]) < 2.5 and abs(cy - pt[1]) < 2.5

    def test_identity_loss(self):
        A = jnp.concatenate([jnp.eye(2)[None].repeat(4, 0),
                             jnp.zeros((4, 2, 1))], axis=2)
        assert float(reproj.identity_loss(A)) < 1e-6

    def test_laf_magic(self):
        rng = np.random.RandomState(9)
        lafs = jnp.asarray(rng.rand(12, 2, 3).astype(np.float32) * 50
                           + np.array([[10, 0, 0], [0, 10, 0]], np.float32))
        H = jnp.eye(3)
        loss, mutual, nn2, _ = reproj.laf_magic(lafs, lafs, H)
        m = np.asarray(mutual)
        assert m.sum() > 0
        np.testing.assert_allclose(np.asarray(loss)[m], 0.0, atol=1e-2)


class TestAugmentation:
    def test_random_rotation_lafs(self):
        key = jax.random.PRNGKey(0)
        lafs, inv = augmentation.get_random_rotation_lafs(key, 16)
        A = np.asarray(lafs)[:, :, :2]
        det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
        np.testing.assert_allclose(det, 0.25, atol=1e-5)   # 0.5^2 scaling
        # inv undoes the rotation part.
        R = A / 0.5
        prod = R @ np.asarray(inv)
        np.testing.assert_allclose(prod, np.tile(np.eye(2), (16, 1, 1)),
                                   atol=1e-5)

    def test_random_norm_affine_lafs(self):
        key = jax.random.PRNGKey(1)
        lafs = augmentation.get_random_norm_affine_lafs(key, 16, max_tilt=3.0)
        A = np.asarray(lafs)[:, :, :2] / 0.5
        det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
        np.testing.assert_allclose(det, 1.0, atol=1e-4)    # det-1 tilts
        assert np.abs(A[:, 0, 1]).max() < 1e-6             # rectified

    def test_extract_random_laf_shapes(self):
        key = jax.random.PRNGKey(2)
        data = jnp.asarray(np.random.RandomState(0).rand(8, 64, 64)
                           .astype(np.float32))
        crop, full, rot, inv = augmentation.extract_random_laf(
            key, data, math.pi, 3.0, 32)
        assert crop.shape == (8, 32, 32)
        assert full.shape == (8, 64, 64)

    def test_warp_by_predicted_identity(self):
        data = jnp.asarray(np.random.RandomState(1).rand(4, 64, 64)
                           .astype(np.float32))
        eye = jnp.tile(jnp.eye(2)[None], (4, 1, 1))
        out = augmentation.warp_by_predicted_transform(data, eye, 32)
        assert out.shape == (4, 32, 32)
        # Identity transform with the 0.5-base LAF = the central half,
        # cropped to the central 32 px.
        interior = np.asarray(out)[:, 8:-8, 8:-8]
        expected = np.asarray(data)[:, 24:-24, 24:-24]
        np.testing.assert_allclose(interior, expected, atol=1e-3)
