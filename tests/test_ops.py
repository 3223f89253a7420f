"""Op-level parity tests: Gaussian blur, pyramid plan, Hessian, NMS,
patch sampler vs torch grid_sample fixtures."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu.ops import hessian, nms, patches, scalespace


FIX = os.path.join(os.path.dirname(__file__), "fixtures")


class TestGaussianBlur:
    def test_matches_torch_2d_conv(self):
        data = np.load(os.path.join(FIX, "gaussian_blur.npz"))
        img = jnp.asarray(data["img"])
        for sigma in (1.52, 1.227, 2.46):
            out = np.asarray(scalespace.gaussian_blur(img, sigma))
            np.testing.assert_allclose(out, data[f"blur_{sigma}"], atol=1e-5)
            out2 = np.asarray(scalespace.gaussian_blur(img, sigma, py2=True))
            np.testing.assert_allclose(out2, data[f"blur_{sigma}_py2"],
                                       atol=1e-5)


class TestPyramidPlan:
    def test_plan_matches_reference_loop(self):
        plan = scalespace.make_plan(480, 640, n_levels=3, init_sigma=1.6,
                                    border=5)
        # Reference: octaves until side <= 2*5+3 = 13.
        shapes = [(480, 640)]
        while True:
            h, w = shapes[-1]
            nh, nw = (h + 1) // 2, (w + 1) // 2
            if nh <= 13 or nw <= 13:
                break
            shapes.append((nh, nw))
        assert plan.octave_shapes == tuple(shapes)
        assert plan.levels_per_octave == 5
        s = plan.sigmas[0]
        step = 2 ** (1 / 3)
        np.testing.assert_allclose(s, [1.6 * step ** i for i in range(5)])
        np.testing.assert_allclose(plan.pix_dists[1], [2.0] * 5)

    def test_build_pyramid_shapes_and_downsample(self):
        plan = scalespace.make_plan(64, 96, border=5)
        img = jnp.asarray(np.random.RandomState(0).rand(64, 96)
                          .astype(np.float32))
        pyr = scalespace.build_pyramid(img, plan)
        assert len(pyr) == plan.n_octaves
        for o, levels in enumerate(pyr):
            assert len(levels) == plan.levels_per_octave
            for lvl in levels:
                assert lvl.shape == plan.octave_shapes[o]
        # Octave 1 level 0 is the stride-2 sampling of octave 0 level nLevels.
        np.testing.assert_allclose(np.asarray(pyr[1][0]),
                                   np.asarray(pyr[0][plan.n_levels])[::2, ::2],
                                   atol=1e-6)

    def test_flat_pyramid_tables(self):
        plan = scalespace.make_plan(64, 96, border=5)
        img = jnp.asarray(np.random.RandomState(1).rand(64, 96)
                          .astype(np.float32))
        pyr, buf = scalespace.build_flat_pyramid(img, plan)
        row_offs, hs, ws = plan.level_dims_padded()
        assert buf.shape == plan.padded_buffer_shape()
        k = plan.flat_index(1, 2)
        h, w = plan.octave_shapes[1]
        lvl = np.asarray(buf)[row_offs[k]:row_offs[k] + h, :w]
        np.testing.assert_allclose(lvl, np.asarray(pyr[1][2]), atol=1e-7)


class TestHessian:
    def test_response_analytic(self):
        # On a quadratic surface z = x^2 + y^2 the Hessian det is 2*2 - 0 = 4.
        h, w = 16, 16
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = jnp.asarray(xx * xx + yy * yy)
        resp = np.asarray(hessian.hessian_response(img, 1.0))
        np.testing.assert_allclose(resp[2:-2, 2:-2], 4.0, atol=1e-3)

    def test_sigma_power(self):
        img = jnp.asarray(np.random.RandomState(0).rand(16, 16)
                          .astype(np.float32))
        r1 = np.asarray(hessian.hessian_response(img, 1.0))
        r2 = np.asarray(hessian.hessian_response(img, 2.0))
        np.testing.assert_allclose(r2, r1 * 16.0, rtol=1e-5)


class TestNMS:
    def test_nms3d_center_isolated_peak(self):
        h, w = 12, 12
        low = np.zeros((h, w), np.float32)
        cur = np.zeros((h, w), np.float32)
        high = np.zeros((h, w), np.float32)
        cur[5, 6] = 3.0
        cur[5, 7] = 2.0     # adjacent, suppressed
        high[9, 2] = 5.0    # peak lives in high slice: suppresses cur there
        cur[9, 2] = 4.0
        out = np.asarray(nms.nms3d_center(jnp.asarray(low), jnp.asarray(cur),
                                          jnp.asarray(high)))
        assert out[5, 6] == 3.0
        assert out[5, 7] == 0.0
        assert out[9, 2] == 0.0

    def test_border_mask(self):
        m = np.asarray(nms.border_mask(8, 10, 2))
        assert m[0].sum() == 0 and m[-2].sum() == 0
        assert m[2, 2] == 1 and m[2, 1] == 0
        # Border swallowing the whole map -> all zeros.
        assert np.asarray(nms.border_mask(4, 4, 5)).sum() == 0

    def test_octave_map_truncation_semantics(self):
        octmap = jnp.zeros((4, 4))
        nmsed = jnp.asarray(np.array([[0.3, 0, 0, 0],
                                      [0, 2.5, 0, 0],
                                      [0, 0, 0, 0],
                                      [0, 0, 0, 0]], np.float32))
        masked, new_map = nms.update_octave_map(octmap, nmsed)
        np.testing.assert_allclose(np.asarray(masked), np.asarray(nmsed))
        # Only the >= 1.0 response claims the map (byte-truncation semantics).
        assert np.asarray(new_map)[1, 1] == 1.0
        assert np.asarray(new_map)[0, 0] == 0.0
        # Second level: claimed pixel suppressed.
        nmsed2 = jnp.ones((4, 4)) * 5.0
        masked2, _ = nms.update_octave_map(new_map, nmsed2)
        assert np.asarray(masked2)[1, 1] == 0.0
        assert np.asarray(masked2)[0, 0] == 5.0

    def test_softargmax_exact_peak(self):
        # Single center-slice peak with symmetric neighborhood.  NOTE the
        # reference's offset grid is [-0.5, 0.5, 1.5] (generate_2dgrid
        # centered=True, Utils.py:118), so even an isolated peak carries a
        # systematic +0.5-pixel refinement bias — preserved for parity.
        h, w = 11, 13
        sig = (1.6, 2.0, 2.5)
        low = np.zeros((h, w), np.float32)
        cur = np.zeros((h, w), np.float32)
        high = np.zeros((h, w), np.float32)
        cur[5, 7] = 2.0
        sc, y, x = nms.softargmax_scale_y_x(jnp.asarray(low), jnp.asarray(cur),
                                            jnp.asarray(high), sig)
        np.testing.assert_allclose(float(sc[5, 7]) * min(h, w), 2.0, atol=1e-5)
        np.testing.assert_allclose(float(y[5, 7]) * h, 5.5, atol=1e-5)
        np.testing.assert_allclose(float(x[5, 7]) * w, 7.5, atol=1e-5)

    def test_softargmax_subpixel_shift(self):
        h, w = 11, 13
        sig = (1.6, 2.0, 2.5)
        low = np.zeros((h, w), np.float32)
        cur = np.zeros((h, w), np.float32)
        high = np.zeros((h, w), np.float32)
        cur[5, 7] = 2.0
        cur[5, 8] = 1.0     # pulls x to the right
        sc, y, x = nms.softargmax_scale_y_x(jnp.asarray(low), jnp.asarray(cur),
                                            jnp.asarray(high), sig)
        # Weighted mean with the biased grid: own pixel offset +0.5 (weight 2),
        # right neighbor +1.5 (weight 1), denominator 3.
        np.testing.assert_allclose(float(x[5, 7]) * w,
                                   7 + (2 * 0.5 + 1 * 1.5) / 3.0, atol=1e-5)
        np.testing.assert_allclose(float(y[5, 7]) * h, 5.5, atol=1e-5)

    def test_masked_topk(self):
        v = jnp.asarray(np.array([0.0, 3.0, 0.0, 1.0, 2.0], np.float32))
        vals, idxs, valid = nms.masked_topk(v, 4)
        np.testing.assert_allclose(np.asarray(vals), [3, 2, 1, 0])
        np.testing.assert_allclose(np.asarray(idxs), [1, 4, 3, 0])
        np.testing.assert_allclose(np.asarray(valid), [1, 1, 1, 0])


class TestPatchSampler:
    def test_matches_torch_grid_sample(self):
        data = np.load(os.path.join(FIX, "grid_sample.npz"))
        img = jnp.asarray(data["img"])
        lafs = jnp.asarray(data["lafs"])
        for ps in (19, 32):
            ours = np.asarray(patches.extract_patches(
                img, lafs, ps=ps, align_corners=True))
            np.testing.assert_allclose(ours, data[f"patches{ps}"], atol=1e-5)
            ours0 = np.asarray(patches.extract_patches(
                img, lafs, ps=ps, align_corners=False))
            np.testing.assert_allclose(ours0, data[f"patches{ps}_ac0"],
                                       atol=1e-5)

    def test_flat_pyramid_matches_direct(self):
        plan = scalespace.make_plan(48, 64, border=5)
        img = jnp.asarray(np.random.RandomState(0).rand(48, 64)
                          .astype(np.float32))
        pyr, buf = scalespace.build_flat_pyramid(img, plan)
        offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
        data = np.load(os.path.join(FIX, "grid_sample.npz"))
        lafs = jnp.asarray(data["lafs"])
        # All LAFs target flat level (1, 2).
        k = plan.flat_index(1, 2)
        lvl_idx = jnp.full((lafs.shape[0],), k, jnp.int32)
        ours = np.asarray(patches.extract_patches_from_flat_pyramid(
            buf, lafs, lvl_idx, offs, hs, ws, ps=19))
        direct = np.asarray(patches.extract_patches(pyr[1][2], lafs, ps=19))
        np.testing.assert_allclose(ours, direct, atol=1e-6)

    def test_batched_extraction(self):
        rng = np.random.RandomState(1)
        imgs = jnp.asarray(rng.rand(4, 32, 40).astype(np.float32))
        lafs = jnp.asarray(np.tile(
            np.array([[[0.2, 0.0, 0.5], [0.0, 0.2, 0.5]]], np.float32),
            (4, 1, 1)))
        out = np.asarray(patches.extract_patches_batched(imgs, lafs, ps=16))
        for i in range(4):
            single = np.asarray(patches.extract_patches(imgs[i], lafs[i:i+1],
                                                        ps=16))
            # atol covers the Pallas sampler's window-local-coordinate f32
            # rounding (USE_PALLAS_BATCHED default; ~1.6e-6 max observed).
            np.testing.assert_allclose(out[i], single[0], atol=5e-5)

    def test_level_selection(self):
        plan = scalespace.make_plan(480, 640, border=5)
        table = jnp.asarray(plan.sigma_pixdist_table())
        # A LAF with scale = PS * table[k] must select level k.
        ps = 32
        tbl = plan.sigma_pixdist_table()
        for k in (0, 1, 2):
            s = ps * tbl[k]
            dlaf = jnp.asarray([[[s, 0, 100.0], [0, s, 100.0]]])
            lvl = patches.select_levels_for_lafs(dlaf, table, ps)
            assert int(lvl[0]) == k
        # sigma*pixdist values repeat across octaves (level 4 of octave 0 ==
        # level 1 of octave 1); both the reference cdist.argmin and ours pick
        # the FIRST occurrence.
        assert abs(tbl[4] - tbl[6]) < 1e-6
        s = ps * tbl[6]
        dlaf = jnp.asarray([[[s, 0, 100.0], [0, s, 100.0]]])
        assert int(patches.select_levels_for_lafs(dlaf, table, ps)[0]) == 4
