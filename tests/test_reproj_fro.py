"""Tests for the Frobenius-norm GT correspondence matchers and LAFMagicFro."""

import numpy as np
import jax.numpy as jnp
import pytest

from affnet_tpu import reproj


def make_lafs(rng, n, scale=20.0):
    A = rng.rand(n, 2, 2).astype(np.float32) - 0.5 + np.eye(2)
    lafs = np.concatenate([A * scale,
                           rng.rand(n, 2, 1).astype(np.float32) * 100], 2)
    return lafs


class TestFroMatchers:
    def test_identity_perfect_match(self):
        rng = np.random.RandomState(0)
        lafs = jnp.asarray(make_lafs(rng, 10))
        md, idx, mask = reproj.gt_correspondence_fro_mask(
            lafs, lafs, jnp.eye(3), dist_threshold=1e-3)
        assert bool(mask.all())
        np.testing.assert_array_equal(np.asarray(idx), np.arange(10))

    def test_fro_rejects_shape_mismatch(self):
        rng = np.random.RandomState(1)
        lafs1 = make_lafs(rng, 8)
        lafs2 = lafs1.copy()
        lafs2[:, :2, :2] *= 3.0       # same centers, very different shapes
        md, idx, mask = reproj.gt_correspondence_fro_mask(
            jnp.asarray(lafs1), jnp.asarray(lafs2), jnp.eye(3),
            dist_threshold=0.1)
        assert not bool(np.asarray(mask).any())

    def test_fro_and_center_gates(self):
        rng = np.random.RandomState(2)
        lafs = jnp.asarray(make_lafs(rng, 12))
        md, idx, mask, LHF2 = reproj.gt_correspondence_fro_and_center_mask(
            lafs, lafs, jnp.eye(3), dist_threshold=1.0)
        assert bool(mask.all())
        np.testing.assert_array_equal(np.asarray(idx), np.arange(12))
        # Scale gate: double one view's scales -> ratio gate kills matches.
        lafs2 = np.asarray(lafs).copy()
        lafs2[:, :2, :2] *= 2.0
        md2, idx2, mask2, _ = reproj.gt_correspondence_fro_and_center_mask(
            lafs, jnp.asarray(lafs2), jnp.eye(3), dist_threshold=1.0,
            scale_diff_coef=0.3)
        assert not bool(np.asarray(mask2).any())

    def test_fro_and_center_up_is_up(self):
        rng = np.random.RandomState(3)
        lafs = jnp.asarray(make_lafs(rng, 6))
        md, idx, mask, _ = reproj.gt_correspondence_fro_and_center_mask(
            lafs, lafs, jnp.eye(3), dist_threshold=1.0, do_up_is_up=True)
        assert bool(mask.all())

    def test_laf_magic_fro(self):
        rng = np.random.RandomState(4)
        lafs = jnp.asarray(make_lafs(rng, 10))
        loss, mutual, nn2, _ = reproj.laf_magic_fro(lafs, lafs, jnp.eye(3))
        m = np.asarray(mutual)
        assert m.sum() == 10
        np.testing.assert_allclose(np.asarray(loss)[m], 0.0, atol=1e-3)
