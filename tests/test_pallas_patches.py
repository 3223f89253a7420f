"""Equivalence of the Pallas gather-as-matmul patch sampler with the XLA
flat-gather path (interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu.ops.patches import extract_patches_from_flat_pyramid
from affnet_tpu.ops.pallas_patches import extract_patches_window_matmul


def _fake_pyramid(rng, shapes):
    """Row-padded buffer + level tables for a list of (h, w) level shapes."""
    wmax = max(w for _, w in shapes)
    rows = []
    row_off = []
    pos = 0
    for h, w in shapes:
        lvl = rng.uniform(0, 255, (h, w)).astype(np.float32)
        rows.append(np.pad(lvl, ((0, 0), (0, wmax - w))))
        row_off.append(pos)
        pos += h
    buf = np.concatenate(rows, axis=0)
    hs = np.array([h for h, _ in shapes], np.int32)
    ws = np.array([w for _, w in shapes], np.int32)
    return (jnp.asarray(buf), jnp.asarray(np.array(row_off, np.int32)),
            jnp.asarray(hs), jnp.asarray(ws))


def _random_lafs(rng, n, scale_range):
    """Normalized LAFs: random affines (incl. rotation/elongation) at random
    centers, some near/off the image border."""
    ang = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], 1)
    elong = rng.uniform(0.5, 2.0, n)
    diag = np.zeros((n, 2, 2), np.float32)
    diag[:, 0, 0] = elong
    diag[:, 1, 1] = 1.0 / elong
    sc = rng.uniform(*scale_range, n)[:, None, None]
    A = (rot @ diag) * sc
    t = rng.uniform(-0.1, 1.1, (n, 2, 1))
    return jnp.asarray(np.concatenate([A, t], axis=2).astype(np.float32))


@pytest.mark.parametrize("ps,align", [(32, False), (19, False), (32, True)])
def test_window_matmul_matches_xla(ps, align):
    rng = np.random.RandomState(0)
    shapes = [(100, 160), (50, 80), (25, 40), (13, 20)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    n = 37
    lafs = _random_lafs(rng, n, (0.02, 0.25))
    lvl = jnp.asarray(rng.randint(0, len(shapes), n).astype(np.int32))

    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=ps, align_corners=align)
    got = extract_patches_window_matmul(buf, lafs, lvl, offs, hs, ws,
                                        ps=ps, align_corners=align,
                                        window_rows=96, window_cols=256,
                                        patches_per_step=4,
                                        fallback_slots=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-3)


def test_window_matmul_oversized_fallback():
    """LAFs whose extent exceeds the window must be recomputed exactly."""
    rng = np.random.RandomState(1)
    shapes = [(120, 160), (60, 80)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    # Half the LAFs span most of the image => extent >> window.
    small = _random_lafs(rng, 8, (0.02, 0.1))
    big = _random_lafs(rng, 8, (0.5, 0.9))
    lafs = jnp.concatenate([small, big])
    lvl = jnp.asarray(rng.randint(0, 2, 16).astype(np.int32))

    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=32)
    got = extract_patches_window_matmul(buf, lafs, lvl, offs, hs, ws, ps=32,
                                        window_rows=64, window_cols=128,
                                        patches_per_step=4,
                                        fallback_slots=12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-3)


def test_window_matmul_grouped_calls(monkeypatch):
    """LAF sets above MAX_PATCHES_PER_CALL are processed in groups (the
    scalar-prefetch tables must fit SMEM; threshold mode can reach 16384)."""
    import affnet_tpu.ops.pallas_patches as pp
    monkeypatch.setattr(pp, "MAX_PATCHES_PER_CALL", 16)
    rng = np.random.RandomState(3)
    shapes = [(100, 160), (50, 80)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    n = 40
    lafs = _random_lafs(rng, n, (0.02, 0.2))
    lvl = jnp.asarray(rng.randint(0, 2, n).astype(np.int32))
    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=19)
    got = extract_patches_window_matmul(buf, lafs, lvl, offs, hs, ws, ps=19,
                                        window_rows=96, window_cols=256,
                                        patches_per_step=8,
                                        fallback_slots=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-3)


@pytest.mark.parametrize("wide", [False, True])
def test_window_matmul_dedup_matches_xla(wide):
    """Shared-window DMA dedup (dedup_windows=True): adjacent patches with
    equal quantized origins reuse one DMA via the in-kernel chain-select.
    Repeated LAFs guarantee dup hits (identical origin by construction);
    interleaved clusters + randoms + a cross-level origin collision check
    that values still match the XLA path exactly."""
    rng = np.random.RandomState(7)
    shapes = [(256, 640), (128, 320)] if wide else [(100, 160), (50, 80)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    rnd = np.asarray(_random_lafs(rng, 10, (0.02, 0.15)))
    # Clusters: identical LAFs (certain dups), same-center slight-scale
    # variants (likely dups), plus the randoms.
    c0 = np.tile(rnd[0:1], (5, 1, 1))
    c1 = np.tile(rnd[1:2], (4, 1, 1))
    c1[:, :2, :2] *= np.linspace(0.95, 1.05, 4)[:, None, None]
    lafs = jnp.asarray(np.concatenate([c0, c1, rnd]).astype(np.float32))
    n = lafs.shape[0]
    lvl = np.zeros(n, np.int32)
    lvl[2] = 1  # same LAF, different level: origin may collide, bytes differ
    lvl[19:] = rng.randint(0, 2, n - 19)
    lvl = jnp.asarray(lvl)

    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=32)
    for pps in (8, 16):
        got = extract_patches_window_matmul(
            buf, lafs, lvl, offs, hs, ws, ps=32,
            window_rows=64, window_cols=256, patches_per_step=pps,
            fallback_slots=8, dedup_windows=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-5, atol=5e-3)


def test_window_matmul_bf16_fast_mode():
    """bf16 gather matmuls (fast mode) stay within ~1 grey level of f32."""
    rng = np.random.RandomState(4)
    shapes = [(100, 160), (50, 80)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    lafs = _random_lafs(rng, 16, (0.02, 0.2))
    lvl = jnp.asarray(rng.randint(0, 2, 16).astype(np.int32))
    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=32)
    got = extract_patches_window_matmul(buf, lafs, lvl, offs, hs, ws, ps=32,
                                        window_rows=96, window_cols=256,
                                        patches_per_step=8, fallback_slots=4,
                                        mxu_dtype=jnp.bfloat16,
                                        interpret=True)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 2.5


def test_masked_topk_large_path_bit_identical_to_top_k():
    """The large-input two-stage path must equal lax.top_k exactly —
    values, indices, and order."""
    from affnet_tpu.ops.nms import masked_topk

    rng = np.random.RandomState(5)
    n, k = (1 << 18) + 1024, 500   # above the two-stage threshold
    v = np.zeros(n, np.float32)
    idx = rng.choice(n, 5000, replace=False)
    v[idx] = rng.exponential(10, 5000).astype(np.float32)
    v = jnp.asarray(v)
    vals, idxs, valid = masked_topk(v, k)
    evals, eidxs = jax.lax.top_k(v, k)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(evals))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(eidxs))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(vals) > 0)


def test_window_matmul_nonfinite_lafs_are_harmless():
    """Padded/invalid LAF slots (NaN) must not corrupt valid patches."""
    rng = np.random.RandomState(2)
    shapes = [(64, 96)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    lafs = np.array(_random_lafs(rng, 8, (0.05, 0.2)))
    lafs[3] = np.nan
    lafs = jnp.asarray(lafs)
    lvl = jnp.zeros(8, jnp.int32)

    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=19)
    got = extract_patches_window_matmul(buf, lafs, lvl, offs, hs, ws, ps=19,
                                        window_rows=96, window_cols=128,
                                        patches_per_step=4,
                                        fallback_slots=4, interpret=True)
    keep = np.array([i != 3 for i in range(8)])
    np.testing.assert_allclose(np.asarray(got)[keep], np.asarray(ref)[keep],
                               rtol=5e-5, atol=5e-3)
    assert np.isfinite(np.asarray(got)[keep]).all()


def test_window_matmul_wide_buffer_tiled_layout():
    """Buffers wider than one column tile exercise the tiled-DMA layout
    (tile_w=512, stride 256): windows near tile seams and at the right edge
    must still match the XLA path exactly."""
    rng = np.random.RandomState(7)
    shapes = [(80, 900), (40, 450)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    n = 48
    lafs = np.array(_random_lafs(rng, n, (0.02, 0.12)))
    # Pin several centers near tile-stride boundaries and the right edge.
    for i, cx in enumerate([0.27, 0.29, 0.56, 0.58, 0.84, 0.99, 0.01]):
        lafs[i, 0, 2] = cx
    lafs = jnp.asarray(lafs)
    lvl = jnp.asarray(rng.randint(0, 2, n).astype(np.int32))
    ref = extract_patches_from_flat_pyramid(buf, lafs, lvl, offs, hs, ws,
                                            ps=32)
    got = extract_patches_window_matmul(buf, lafs, lvl, offs, hs, ws, ps=32,
                                        window_rows=96, window_cols=256,
                                        patches_per_step=8, fallback_slots=8,
                                        interpret=True)
    # Window-local-coordinate f32 rounding grows with the column origin
    # (documented equivalence class, ~3e-5 relative on the 0-255 scale).
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-2


def test_batched_pallas_sampler_forward_and_grad():
    """extract_patches_batched_pallas: forward matches the XLA batched
    sampler; custom-VJP gradients (wrt LAFs and source images) match
    jax.grad of the XLA path."""
    from affnet_tpu.ops.pallas_patches import extract_patches_batched_pallas
    from affnet_tpu.ops.patches import _extract_patches_batched_xla

    rng = np.random.RandomState(11)
    n, h = 16, 64
    imgs = jnp.asarray(rng.uniform(0, 1, (n, h, h)).astype(np.float32))
    base = np.tile(np.array([[0.5, 0.0, 0.5], [0.0, 0.5, 0.5]], np.float32),
                   (n, 1, 1))
    pert = (rng.uniform(-0.15, 0.15, (n, 2, 2))).astype(np.float32)
    lafs = base.copy()
    lafs[:, :2, :2] += pert
    lafs = jnp.asarray(lafs)

    ref = _extract_patches_batched_xla(imgs, lafs, ps=32)
    got = extract_patches_batched_pallas(imgs, lafs, ps=32)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 5e-5

    wgt = jnp.asarray(rng.uniform(-1, 1, (n, 32, 32)).astype(np.float32))

    def loss_p(l, im):
        return (extract_patches_batched_pallas(im, l, ps=32) * wgt).sum()

    def loss_x(l, im):
        return (_extract_patches_batched_xla(im, l, ps=32) * wgt).sum()

    gp_l, gp_i = jax.grad(loss_p, argnums=(0, 1))(lafs, imgs)
    gx_l, gx_i = jax.grad(loss_x, argnums=(0, 1))(lafs, imgs)
    # LAF grads: the custom bwd uses the flat-pyramid formulation while the
    # XLA path ADs through the vmap formulation — same function, different
    # fp association (measured 3e-5 relative).  Image grads are bitwise
    # equal (identical scatter-add).
    np.testing.assert_allclose(np.asarray(gp_l), np.asarray(gx_l),
                               rtol=5e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(gp_i), np.asarray(gx_i))


def test_pyramid_sampler_diff_grad():
    """make_pyramid_sampler_diff (shape-opt path): Pallas forward matches
    XLA; custom-VJP grads wrt (buffer, lafs) match the XLA AD; the f32
    level index gets a zero cotangent."""
    from affnet_tpu.ops.pallas_patches import make_pyramid_sampler_diff

    rng = np.random.RandomState(21)
    shapes = [(96, 128), (48, 64)]
    buf, offs, hs, ws = _fake_pyramid(rng, shapes)
    n = 16
    lafs = _random_lafs(rng, n, (0.05, 0.2))
    lvl_f = jnp.asarray(rng.randint(0, 2, n).astype(np.float32))
    sampler = make_pyramid_sampler_diff(offs, hs, ws, 19, False)

    ref = extract_patches_from_flat_pyramid(
        buf, lafs, lvl_f.astype(jnp.int32), offs, hs, ws, ps=19)
    got = sampler(buf, lafs, lvl_f)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 5e-3

    wgt = jnp.asarray(rng.uniform(-1, 1, (n, 19, 19)).astype(np.float32))

    def loss_p(b, l, lf):
        return (sampler(b, l, lf) * wgt).sum()

    def loss_x(b, l, lf):
        return (extract_patches_from_flat_pyramid(
            b, l, lf.astype(jnp.int32), offs, hs, ws, ps=19) * wgt).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(buf, lafs, lvl_f)
    gx = jax.grad(loss_x, argnums=(0, 1))(buf, lafs, lvl_f)
    np.testing.assert_array_equal(np.asarray(gp[0]), np.asarray(gx[0]))
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=5e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(gp[2]), 0.0)


def test_batched_pallas_extreme_transforms_exact():
    """Trainability fix (r4): transforms whose extents exceed the static
    window — raw-network-output rewarps at curriculum-max tilt and beyond —
    must produce EXACT values (full-capacity fallback, no truncation) and
    exact-function gradients, in both the forward and backward."""
    from affnet_tpu.ops.pallas_patches import extract_patches_batched_pallas
    from affnet_tpu.ops.patches import _extract_patches_batched_xla

    rng = np.random.RandomState(13)
    n, h = 16, 64
    imgs = jnp.asarray(rng.uniform(0, 1, (n, h, h)).astype(np.float32))
    # Mix of extreme anisotropic transforms (tilt ~8, rotations, huge
    # scales up to 4x the window) and a NaN row (a diverging net output).
    lafs = np.zeros((n, 2, 3), np.float32)
    lafs[:, 0, 2] = lafs[:, 1, 2] = 0.5
    for i in range(n):
        th = rng.uniform(0, 2 * np.pi)
        tilt = rng.uniform(4.0, 8.0)
        s = rng.uniform(0.5, 4.0)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        lafs[i, :2, :2] = s * (R @ np.diag([tilt, 1.0 / tilt]))
    lafs[3, :2, :2] = np.nan
    lafs = jnp.asarray(lafs)

    ref = _extract_patches_batched_xla(imgs, lafs, ps=32)
    got = extract_patches_batched_pallas(imgs, lafs, ps=32)
    ok = np.isfinite(np.asarray(ref))
    assert np.abs(np.asarray(got)[ok] - np.asarray(ref)[ok]).max() < 5e-5

    wgt = jnp.asarray(rng.uniform(-1, 1, (n, 32, 32)).astype(np.float32))
    # Zero the NaN row's weight so the loss stays finite.
    wgt = wgt.at[3].set(0.0)

    gp_l, gp_i = jax.grad(
        lambda l, im: (extract_patches_batched_pallas(im, l, ps=32)
                       * wgt).sum(), argnums=(0, 1))(lafs, imgs)
    gx_l, gx_i = jax.grad(
        lambda l, im: (_extract_patches_batched_xla(im, l, ps=32)
                       * wgt).sum(), argnums=(0, 1))(lafs, imgs)
    okl = np.isfinite(np.asarray(gx_l))
    np.testing.assert_allclose(np.asarray(gp_l)[okl], np.asarray(gx_l)[okl],
                               rtol=5e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(gp_i), np.asarray(gx_i))


def test_warp_by_predicted_transform_crop_fusion():
    """The fused crop_size-grid rewarp equals the reference's
    full-warp-then-center-crop formulation (ac=False).  The sample
    coordinates are identical by construction (the cropped ps=h grid IS the
    half-scale ps=c grid); the tolerance covers the Pallas sampler's
    window-local-coordinate f32 rounding vs the XLA reference — on the XLA
    path the two formulations are bit-equal."""
    from affnet_tpu import augmentation
    from affnet_tpu.ops.patches import _extract_patches_batched_xla

    rng = np.random.RandomState(17)
    n, h, c = 8, 64, 32
    imgs = jnp.asarray(rng.uniform(0, 1, (n, h, h)).astype(np.float32))
    trans = jnp.asarray(
        (np.eye(2)[None] + 0.5 * rng.randn(n, 2, 2)).astype(np.float32))

    got = augmentation.warp_by_predicted_transform(imgs, trans, c)

    base = np.tile(np.array([[0.5, 0.0, 0.5], [0.0, 0.5, 0.5]], np.float32),
                   (n, 1, 1))
    lafs = jnp.asarray(base)
    lafs = jnp.concatenate([trans @ lafs[:, :2, :2], lafs[:, :, 2:]], axis=2)
    full = _extract_patches_batched_xla(imgs, lafs, ps=h)
    st = (h - c) // 2
    ref = np.asarray(full[:, st:st + c, st:st + c])
    assert np.abs(np.asarray(got) - ref).max() < 5e-5

    # XLA-path bit-equality of the two formulations.
    from affnet_tpu.ops import patches as patches_mod
    old = patches_mod.USE_PALLAS_BATCHED
    patches_mod.USE_PALLAS_BATCHED = False
    try:
        got_xla = augmentation.warp_by_predicted_transform(imgs, trans, c)
    finally:
        patches_mod.USE_PALLAS_BATCHED = old
    np.testing.assert_array_equal(np.asarray(got_xla), ref)
