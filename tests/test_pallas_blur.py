"""Pallas Gaussian blur + matmul downsample vs the XLA reference ops."""

import numpy as np
import jax.numpy as jnp

from affnet_tpu.ops.pallas_blur import downsample2_matmul, gaussian_blur_pallas
from affnet_tpu.ops.scalespace import gaussian_blur_xla


def test_pallas_blur_matches_xla():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (200, 300)).astype(np.float32))
    for sigma in (0.8, 1.52, 2.45):
        a = np.asarray(gaussian_blur_xla(img, sigma))
        b = np.asarray(gaussian_blur_pallas(img, sigma))
        assert np.abs(a - b).max() < 1e-3, sigma


def test_pallas_blur_py2_kernel():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.uniform(0, 255, (64, 96)).astype(np.float32))
    a = np.asarray(gaussian_blur_xla(img, 1.6, py2=True))
    b = np.asarray(gaussian_blur_pallas(img, 1.6, py2=True))
    assert np.abs(a - b).max() < 1e-3


def test_pallas_blur_edge_replicate():
    """Replicate-pad semantics at all four edges (constant image stays
    constant under a normalized kernel)."""
    img = jnp.full((50, 70), 3.25, jnp.float32)
    out = np.asarray(gaussian_blur_pallas(img, 2.0))
    np.testing.assert_allclose(out, 3.25, rtol=0, atol=1e-5)


def test_downsample_matmul_exact():
    rng = np.random.RandomState(2)
    for shape in ((100, 160), (101, 161), (7, 9)):
        img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
        a = np.asarray(img)[::2, ::2]
        b = np.asarray(downsample2_matmul(img))
        np.testing.assert_array_equal(a, b)
