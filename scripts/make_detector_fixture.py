"""Golden detector fixtures: run the ACTUAL reference pipeline (from
/root/reference, py3 + modern torch) on test images and dump its outputs.

This is the strongest parity oracle available: the reference's own code with
the shipped weights.  Note the modern-torch semantics it runs under (and that
our defaults therefore match): grid_sample/affine_grid align_corners=False,
python-3 float division in CircularGaussKernel.

torch-only process (no jax).  Run:  python scripts/make_detector_fixture.py
"""

import os
import sys
import types

sys.path.insert(0, "/root/reference")
# torchvision is imported but unused on the inference path — stub it.
tv = types.ModuleType("torchvision")
tvt = types.ModuleType("torchvision.transforms")
tv.transforms = tvt
sys.modules["torchvision"] = tv
sys.modules["torchvision.transforms"] = tvt

import numpy as np
import torch
from PIL import Image

from SparseImgRepresenter import ScaleSpaceAffinePatchExtractor  # noqa: E402
from HandCraftedModules import AffineShapeEstimator, OrientationDetector  # noqa: E402
from architectures import AffNetFast, OriNetFast  # noqa: E402
from LAF import LAFs2ell  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")


def load_graf(idx=1, crop=None):
    img = Image.open(f"/root/reference/test-graf/img{idx}.png").convert("RGB")
    img = np.mean(np.array(img), axis=2).astype(np.float32)
    if crop:
        img = img[:crop[0], :crop[1]]
    return img


load_graf1 = load_graf


def make_affnet():
    net = AffNetFast(PS=32)
    ckpt = torch.load("/root/reference/pretrained/AffNet.pth",
                      map_location="cpu", weights_only=False)
    net.load_state_dict(ckpt["state_dict"])
    net.eval()
    return net


def make_orinet():
    # The shipped OriNet.pth has an 8x8 final conv => trained with PS=32.
    net = OriNetFast(PS=32)
    ckpt = torch.load("/root/reference/pretrained/OriNet.pth",
                      map_location="cpu", weights_only=False)
    net.load_state_dict(ckpt["state_dict"])
    net.eval()
    return net


def run(img, det, do_ori=False):
    t = torch.from_numpy(img)[None, None]
    with torch.no_grad():
        lafs, resp = det(t, do_ori=do_ori)
    return lafs.numpy(), resp.numpy()


def main():
    os.makedirs(FIX, exist_ok=True)
    img = load_graf1(crop=(120, 160))
    out = {"img": img}

    # 1. Detection only (top-k mode), no shape/orientation.
    det = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=50, border=5, num_Baum_iters=0, th=None)
    lafs, resp = run(img, det)
    out["det_lafs"], out["det_resp"] = lafs, resp

    # 2. + one AffNet shape iteration (the hesaffnet config, top-k mode).
    det2 = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=50, border=5, num_Baum_iters=1, th=None,
        AffNet=make_affnet())
    lafs2, resp2 = run(img, det2)
    out["aff_lafs"], out["aff_resp"] = lafs2, resp2

    # 3. + OriNet orientation.
    det3 = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=50, border=5, num_Baum_iters=1, th=None,
        AffNet=make_affnet(), OriNet=make_orinet())
    lafs3, resp3 = run(img, det3, do_ori=True)
    out["ori_lafs"], out["ori_resp"] = lafs3, resp3

    # 4. Handcrafted Baumberg, 16 iterations (hesaffBaum config).  NOTE: the
    # reference's batched_forward passes a spurious positional kwargs dict
    # that AffineShapeEstimator.forward does not accept (broken in the
    # reference as shipped, under py2 and py3 alike); adapt to the evident
    # intent.
    class BaumAdapter(AffineShapeEstimator):
        def forward(self, x, *args):
            return AffineShapeEstimator.forward(self, x)

    det4 = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=50, border=5, num_Baum_iters=16, th=None,
        AffNet=BaumAdapter(patch_size=19))
    lafs4, resp4 = run(img, det4)
    out["baum_lafs"], out["baum_resp"] = lafs4, resp4

    # 5. Threshold mode (th=-1, the hesaffnet.py CLI default) — all survivors.
    det5 = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=50, border=5, num_Baum_iters=1, th=-1,
        AffNet=make_affnet())
    lafs5, resp5 = run(img, det5)
    out["th_lafs"], out["th_resp"] = lafs5, resp5

    # 6. Descriptor patches for the final LAFs of config 2 (PS=32).
    patches = det2.extract_patches_from_pyr(
        torch.from_numpy(lafs2), PS=32).detach().numpy()
    out["desc_patches"] = patches[:, 0]

    # 7. Second image (graf img6 crop), detection + AffNet shape — guards
    # against overfitting parity to a single image.
    img6 = load_graf(6, crop=(128, 152))
    out["img6"] = img6
    det6 = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=40, border=5, num_Baum_iters=1, th=None,
        AffNet=make_affnet())
    lafs6, resp6 = run(img6, det6)
    out["img6_lafs"], out["img6_resp"] = lafs6, resp6

    np.savez(os.path.join(FIX, "detector_golden.npz"), **out)
    for k, v in out.items():
        print(k, getattr(v, "shape", None))


if __name__ == "__main__":
    main()
