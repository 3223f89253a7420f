"""Fused Pallas detection kernel: equivalence vs the unfused ops.

Runs in interpret mode on the CPU backend (conftest sets
pallas_detect.INTERPRET = True); the compiled TPU path is exercised by
bench.py and the CLIs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu.ops import hessian, nms
from affnet_tpu.ops.pallas_detect import detect_octave_fused


SIGMAS = [1.6, 2.0159, 2.5398, 3.2, 4.0317]


@pytest.mark.parametrize("hw", [(77, 160), (32, 40), (15, 20)])
@pytest.mark.parametrize("th", [0.0, 5.0])
def test_fused_matches_unfused(hw, th):
    h, w = hw
    rng = np.random.RandomState(hash(hw) % 2 ** 31)
    levels = [jnp.asarray(rng.rand(h, w).astype(np.float32) * 50)
              for _ in range(5)]
    fused = detect_octave_fused(levels, SIGMAS, th, tile_h=32,
                                interpret=True)
    rs = [jnp.maximum(hessian.hessian_response(levels[l], SIGMAS[l]) - th,
                      0.0) for l in range(5)]
    for lc in range(1, 4):
        nm_ref = np.asarray(nms.nms3d_center(rs[lc - 1], rs[lc], rs[lc + 1]))
        sc_ref, y_ref, x_ref = (np.asarray(m) for m in
                                nms.softargmax_scale_y_x(
                                    rs[lc - 1], rs[lc], rs[lc + 1],
                                    SIGMAS[lc - 1:lc + 2]))
        nm, sc, y, x = (np.asarray(m) for m in fused[lc - 1])
        # Identical survivor sets; values equal up to fp reassociation.
        np.testing.assert_array_equal(nm > 0, nm_ref > 0)
        np.testing.assert_allclose(nm, nm_ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(sc, sc_ref, atol=1e-6)
        np.testing.assert_allclose(y, y_ref, atol=1e-5)
        np.testing.assert_allclose(x, x_ref, atol=1e-5)


def test_fused_detector_end_to_end_matches_plain():
    """Full detector with fused_detect on/off selects the same keypoints on
    a real image crop."""
    import os
    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "detector_golden.npz"))
    outs = {}
    for fused in (False, True):
        cfg = DetectorConfig(num_features=50, border=5, mr_size=5.192,
                             num_baum_iters=0, th=None, fused_detect=fused)
        outs[fused] = ScaleSpaceAffinePatchExtractor(cfg)(fix["img"])
    a, b = outs[False], outs[True]
    assert len(a["resp"]) == len(b["resp"])
    np.testing.assert_allclose(a["lafs"], b["lafs"], atol=1e-3)
    np.testing.assert_allclose(a["resp"], b["resp"], rtol=1e-4, atol=1e-3)
