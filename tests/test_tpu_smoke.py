"""Compiled-TPU kernel smoke tests (VERDICT r3 Weak #8).

The regular suite runs every Pallas kernel through the interpreter on the
CPU backend (conftest), which validates the math but not the Mosaic
lowering.  These tests run each kernel COMPILED on the real chip and
compare against its interpreted / XLA formulation, catching
compile-vs-interpret divergence the day a kernel changes.

Deselected by default (they need the real TPU and its compile time):

    python -m pytest tests -m tpu -q      # ~1-2 min on the chip

run_me.sh / bench.py environments can invoke this as a preflight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _tpu_present():
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


@pytest.fixture(autouse=True)
def _need_tpu():
    if not _tpu_present():
        pytest.skip("no TPU device")
    yield


def test_blur_compiled_matches_interpret():
    from affnet_tpu.ops import pallas_blur
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (120, 256)).astype(np.float32))
    for sigma in (1.6, 3.2):
        got = np.asarray(pallas_blur.gaussian_blur_pallas(
            img, sigma, interpret=False))
        ref = np.asarray(pallas_blur.gaussian_blur_pallas(
            img, sigma, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-4)


def test_downsample_matmul_exact():
    from affnet_tpu.ops.pallas_blur import downsample2_matmul
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    got = np.asarray(jax.jit(downsample2_matmul)(img))
    np.testing.assert_array_equal(got, np.asarray(img)[::2, ::2])


def test_detect_fused_compiled_matches_interpret():
    from affnet_tpu.ops import pallas_detect
    rng = np.random.RandomState(2)
    levels = [jnp.asarray(rng.uniform(0, 1, (64, 128)).astype(np.float32))
              for _ in range(5)]
    sigmas = [1.3 * (2 ** (i / 3.0)) for i in range(5)]
    got = pallas_detect.detect_octave_fused(levels, sigmas, 16.0,
                                            interpret=False)
    ref = pallas_detect.detect_octave_fused(levels, sigmas, 16.0,
                                            interpret=True)
    for (gn, gs, gy, gx), (rn, rs, ry, rx) in zip(got, ref):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(rn),
                                   rtol=1e-5, atol=1e-4)
        m = np.asarray(rn) > 0
        for g, r in ((gs, rs), (gy, ry), (gx, rx)):
            np.testing.assert_allclose(np.asarray(g)[m], np.asarray(r)[m],
                                       rtol=1e-4, atol=1e-4)


def test_topk_compiled_exact():
    from affnet_tpu.ops import pallas_topk
    from affnet_tpu.ops.nms import masked_topk
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.uniform(0, 100, (1 << 17,)).astype(np.float32))
    old = pallas_topk.INTERPRET
    pallas_topk.INTERPRET = False
    try:
        vals, idxs, valid = masked_topk(v, 500)
    finally:
        pallas_topk.INTERPRET = old
    rv, ri = jax.lax.top_k(v, 500)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ri))
    assert bool(np.all(np.asarray(valid)))


def test_patch_sampler_compiled_matches_xla():
    from affnet_tpu.ops import patches
    from affnet_tpu.ops.pallas_patches import extract_patches_window_matmul
    rng = np.random.RandomState(4)
    h, w = 96, 160
    buf = jnp.asarray(rng.uniform(0, 255, (2 * h, w)).astype(np.float32))
    offs = jnp.asarray(np.array([0, h], np.int32))
    hs = jnp.asarray(np.array([h, h], np.int32))
    ws = jnp.asarray(np.array([w, w], np.int32))
    n = 64
    ang = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(ang), np.sin(ang)
    A = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], 1) \
        * rng.uniform(0.02, 0.1, n)[:, None, None]
    t = rng.uniform(0.2, 0.8, (n, 2, 1))
    lafs = jnp.asarray(np.concatenate([A, t], 2).astype(np.float32))
    lvl = jnp.asarray(rng.randint(0, 2, n).astype(np.int32))
    got = np.asarray(extract_patches_window_matmul(
        buf, lafs, lvl, offs, hs, ws, ps=19, interpret=False,
        window_rows=64, window_cols=256, patches_per_step=8,
        fallback_slots=8))
    ref = np.asarray(patches.extract_patches_from_flat_pyramid(
        buf, lafs, lvl, offs, hs, ws, ps=19))
    # 0-255-scale pixels: ~2e-3 abs = ~1e-5 relative, the f32
    # summation-order gap between the tent-matmul and 4-corner forms.
    assert np.abs(got - ref).max() < 8e-3


def test_patch_sampler_dedup_compiled_matches_xla():
    """Shared-window DMA dedup, Mosaic-compiled: repeated LAFs (certain
    dup hits) must match the XLA path — catches conditional-DMA / select
    lowering divergence from the interpreted test."""
    from affnet_tpu.ops import patches
    from affnet_tpu.ops.pallas_patches import extract_patches_window_matmul
    rng = np.random.RandomState(5)
    h, w = 96, 160
    buf = jnp.asarray(rng.uniform(0, 255, (2 * h, w)).astype(np.float32))
    offs = jnp.asarray(np.array([0, h], np.int32))
    hs = jnp.asarray(np.array([h, h], np.int32))
    ws = jnp.asarray(np.array([w, w], np.int32))
    base = 16
    ang = rng.uniform(0, 2 * np.pi, base)
    c, s = np.cos(ang), np.sin(ang)
    A = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], 1) \
        * rng.uniform(0.02, 0.1, base)[:, None, None]
    t = rng.uniform(0.2, 0.8, (base, 2, 1))
    lafs_np = np.concatenate([A, t], 2).astype(np.float32)
    lafs_np = np.repeat(lafs_np, 4, axis=0)       # runs of 4 identical LAFs
    lvl_np = np.repeat(rng.randint(0, 2, base), 4).astype(np.int32)
    lafs, lvl = jnp.asarray(lafs_np), jnp.asarray(lvl_np)
    got = np.asarray(extract_patches_window_matmul(
        buf, lafs, lvl, offs, hs, ws, ps=19, interpret=False,
        window_rows=64, window_cols=256, patches_per_step=8,
        fallback_slots=8, dedup_windows=True))
    ref = np.asarray(patches.extract_patches_from_flat_pyramid(
        buf, lafs, lvl, offs, hs, ws, ps=19))
    assert np.abs(got - ref).max() < 8e-3
