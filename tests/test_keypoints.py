"""External-keypoint API (the kornia-notebook workflow).

Reference: examples/SIFT-AffNet-HardNet-kornia-matching.ipynb cells 0-10 —
user-supplied (x, y, size[, angle]) keypoints through AffNet shape, OriNet
orientation, and a descriptor, composed like the internal pipeline.
"""

import os

import numpy as np

from affnet_tpu.keypoints import describe_keypoints, lafs_from_keypoints
from affnet_tpu.models import AffNetFast, OriNetFast32, SIFTNet
from affnet_tpu.models.convert import load_pretrained

GRAF1 = "/root/reference/test-graf/img1.png"


def _img():
    from PIL import Image
    im = Image.open(GRAF1).convert("RGB").resize((200, 160))
    return np.mean(np.asarray(im), axis=2).astype(np.float32)


def test_lafs_from_keypoints_geometry():
    lafs = np.asarray(lafs_from_keypoints(
        x=[50.0, 100.0], y=[40.0, 80.0], scale=[4.0, 8.0],
        angle=[0.0, 90.0], img_hw=(160, 200), mr_size=6.0))
    # Center normalization: t = (x/w, y/h).
    np.testing.assert_allclose(lafs[0, :, 2], [50 / 200, 40 / 160],
                               rtol=1e-6)
    # Radius: mr_size * size / 2 normalized by min(h, w).
    r0 = 6.0 * 4.0 / 2.0 / 160.0
    np.testing.assert_allclose(lafs[0, :2, :2],
                               [[r0, 0.0], [0.0, r0]], atol=1e-7)
    # 90-degree OpenCV angle -> rotation by -90deg (kornia negation).
    r1 = 6.0 * 8.0 / 2.0 / 160.0
    np.testing.assert_allclose(lafs[1, :2, :2],
                               [[0.0, -r1], [r1, 0.0]], atol=1e-6)


def test_describe_keypoints_full_stack():
    img = _img()
    rng = np.random.RandomState(0)
    n = 24
    x = rng.uniform(30, 170, n)
    y = rng.uniform(30, 130, n)
    size = rng.uniform(2.0, 6.0, n)
    params = {"aff": load_pretrained("AffNetFast"),
              "ori": load_pretrained("OriNetFast")}
    out = describe_keypoints(img, x, y, size, None, params,
                             shape_net=AffNetFast, ori_net=OriNetFast32,
                             desc_net=SIFTNet(patch_size=32))
    assert out["lafs"].shape == (n, 2, 3)
    assert out["shape"].shape == (n, 2, 2)
    assert out["angle"].shape == (n,)
    assert out["descs"].shape == (n, 128)
    # Shapes are det-1 upright: positive diagonal, zero upper-right.
    dets = np.abs(out["shape"][:, 0, 0] * out["shape"][:, 1, 1]
                  - out["shape"][:, 0, 1] * out["shape"][:, 1, 0])
    np.testing.assert_allclose(dets, 1.0, rtol=1e-4)
    np.testing.assert_allclose(out["shape"][:, 0, 1], 0.0, atol=1e-6)
    # Descriptors are L2-normalized and finite.
    norms = np.linalg.norm(out["descs"], axis=1)
    assert np.isfinite(out["descs"]).all()
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # LAF centers stay at the keypoints (shape/ori only change A).
    np.testing.assert_allclose(out["lafs"][:, 0, 2], x, rtol=1e-5)
    np.testing.assert_allclose(out["lafs"][:, 1, 2], y, rtol=1e-5)


def test_describe_keypoints_matches_pipeline_stages():
    """With shape/ori disabled the LAFs are exactly the base frames, and
    enabling only the shape stage left-multiplies a det-1 upright A — the
    same composition the internal detector uses."""
    img = _img()
    x, y, size = np.array([80.0]), np.array([70.0]), np.array([5.0])
    base = describe_keypoints(img, x, y, size)
    lafs0 = np.asarray(lafs_from_keypoints(x, y, size, None, img.shape))
    got = base["lafs"][0, :2, :2] / min(img.shape)
    np.testing.assert_allclose(got, lafs0[0, :2, :2], rtol=1e-5)

    params = {"aff": load_pretrained("AffNetFast")}
    shaped = describe_keypoints(img, x, y, size, params=params,
                                shape_net=AffNetFast)
    A = shaped["shape"][0]
    expect = A @ lafs0[0, :2, :2] * min(img.shape)
    np.testing.assert_allclose(shaped["lafs"][0, :2, :2], expect, rtol=1e-4)


def test_describe_keypoints_cli(tmp_path):
    from affnet_tpu.cli.describe_keypoints import main as cli_main
    from PIL import Image
    img = _img()
    ip = os.path.join(tmp_path, "img.png")
    Image.fromarray(img.astype(np.uint8)).save(ip)
    kp = os.path.join(tmp_path, "kpts.txt")
    np.savetxt(kp, np.array([[60.0, 50.0, 4.0], [120.0, 90.0, 6.0]]))
    outp = os.path.join(tmp_path, "lafs.txt")
    descp = os.path.join(tmp_path, "descs.npy")
    cli_main([ip, kp, outp, "--descs", descp, "--descriptor", "SIFT"])
    lafs = np.loadtxt(outp)
    assert lafs.shape == (2, 7)
    descs = np.load(descp)
    assert descs.shape == (2, 128)
