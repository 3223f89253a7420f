"""OnePassSIR (dense AffNet) parity + shape-optimizer tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu.detector import DetectorConfig
from affnet_tpu.models import AffNetFastFullConv, SIFTNet
from affnet_tpu.models.convert import load_pretrained
from affnet_tpu.onepass import OnePassSIR

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(FIX, "onepass_golden.npz"))


@pytest.fixture(scope="module")
def aff_params():
    return load_pretrained("AffNetFast")


class TestOnePass:
    def test_dense_affnet_matches_reference(self, golden, aff_params):
        dense = AffNetFastFullConv()
        out = np.asarray(dense(aff_params, jnp.asarray(golden["img"])))
        np.testing.assert_allclose(out, golden["dense_map"], atol=1e-4)

    def test_onepass_detector_parity(self, golden, aff_params):
        cfg = DetectorConfig(num_features=50, border=15, mr_size=5.192, fused_detect=False,
                             num_baum_iters=0, th=None)
        det = OnePassSIR(cfg)
        out = det(golden["img"], params={"aff": aff_params})
        assert len(out["resp"]) == len(golden["resp"]) == 50
        np.testing.assert_allclose(out["resp"], golden["resp"],
                                   atol=0.1, rtol=1e-4)
        np.testing.assert_allclose(out["lafs"], golden["lafs"], atol=1e-2)

    def test_onepass_describe(self, golden, aff_params):
        cfg = DetectorConfig(num_features=30, border=15, mr_size=5.192, fused_detect=False,
                             num_baum_iters=0, th=None, patch_size=32)
        det = OnePassSIR(cfg, desc_net=SIFTNet(patch_size=32))
        out = det(golden["img"], params={"aff": aff_params}, describe=True)
        assert out["descs"].shape[1] == 128
        np.testing.assert_allclose(np.linalg.norm(out["descs"], axis=1), 1.0,
                                   atol=1e-3)


class TestShapeOptimizer:
    def test_loss_decreases(self, golden):
        """Adam on LAF shapes must reduce the positive descriptor distance
        between two views of the same content (identical image here, LAFs
        perturbed)."""
        from affnet_tpu.losses import descriptor_dist
        from affnet_tpu.models.sift import sift_describe
        from affnet_tpu.shape_opt import LAFShapeOptimizer

        img = golden["img"]
        rng = np.random.RandomState(0)
        n = 8
        lafs1 = np.zeros((n, 2, 3), np.float32)
        lafs1[:, 0, 0] = lafs1[:, 1, 1] = 16.0
        lafs1[:, 0, 2] = rng.uniform(40, 120, n)
        lafs1[:, 1, 2] = rng.uniform(40, 80, n)
        lafs2 = lafs1.copy()
        # Perturb the shapes of view 2.
        lafs2[:, :2, :2] += rng.randn(n, 2, 2).astype(np.float32) * 3.0

        opt = LAFShapeOptimizer(
            descriptor=lambda p: sift_describe(p, 32),
            loss_fn=descriptor_dist, lr=0.05)
        hist = opt.optimize(lafs1, lafs2, img, img, n_iters=12)
        assert hist["loss"][-1] < hist["loss"][0]
        assert hist["shape_diff"][-1] < hist["shape_diff"][0]

    def test_history_save_load_render(self, golden, tmp_path):
        """History persistence + animation rendering (reference:
        optimization_script.py save_data/savemp4_per_desc)."""
        from affnet_tpu.shape_opt import (load_history, render_history,
                                          save_history)

        img = golden["img"]
        n, iters = 3, 2
        rng = np.random.RandomState(1)
        frames = []
        for _ in range(iters + 1):
            lafs = np.zeros((n, 2, 3), np.float32)
            lafs[:, 0, 0] = lafs[:, 1, 1] = rng.uniform(8, 20, n)
            lafs[:, 0, 2] = rng.uniform(40, 120, n)
            lafs[:, 1, 2] = rng.uniform(40, 80, n)
            frames.append(lafs)
        hist = {"lafs1": frames, "lafs2": frames,
                "loss": [1.0, 0.5], "shape_diff": [1.0, 0.6, 0.4],
                "snn": [np.ones(n), np.ones(n)]}
        f = str(tmp_path / "hist.npz")
        save_history(hist, f)
        loaded = load_history(f)
        np.testing.assert_allclose(loaded["lafs1"][0], frames[0])
        out = render_history(loaded, img, str(tmp_path / "opt.mp4"), fps=4)
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 0
