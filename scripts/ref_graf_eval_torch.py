"""Run the ACTUAL torch reference pipeline on graf 1-2..1-6 and log its
quality numbers (tentatives / true matches / inlier ratio) so BASELINE.md's
"inlier ratio >= reference with shipped weights" gate is checkable from a
committed artifact (VERDICT r4 missing #3).

Replicates test() in /root/reference/train_AffNet_test_on_graffity.py:262-339
(2000 features, SNN 0.8, GT center distance <= 6 px under H1to{k}p) but over
all five pairs and with the descriptors available in the mount (HardNet++.pth
is absent per .MISSING_LARGE_BLOBS): the differentiable SIFT descriptor
(pytorch_sift.py) and the shipped HardTFeat (HardNet.py:30-59 +
HardTFeat.pth) — the same two configs as our README shipped-weights tables.
Detector config matches ours: AffNet = shipped AffNet.pth, OriNet = shipped
OriNet.pth (PS=32), mrSize 5.192, border 5, 1 Baumberg/AffNet iter, topk
2000, do_ori True.

torch-only process (torch and jax deadlock if they share a process).
Run:  python scripts/ref_graf_eval_torch.py | tee runs/ref_graf_torch.log
"""

import sys
import time
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
from architectures import AffNetFast, OriNetFast  # noqa: E402
from HardNet import HardTFeatNet  # noqa: E402
from pytorch_sift import SIFTNet  # noqa: E402
from Losses import distance_matrix_vector  # noqa: E402
from ReprojectionStuff import get_GT_correspondence_indexes  # noqa: E402

NFEATS = 2000
SNN = 0.8
DIST = 6.0


def load_img(idx):
    img = Image.open(f"/root/reference/test-graf/img{idx}.png").convert("RGB")
    img = np.mean(np.array(img), axis=2).astype(np.float32)
    return torch.from_numpy(img)[None, None]


def load_net(cls, path, **kw):
    net = cls(**kw)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net.load_state_dict(ckpt["state_dict"])
    net.eval()
    return net


def match_and_score(d1, d2, lafs1, lafs2, H):
    # train_AffNet_test_on_graffity.py:292-306 verbatim semantics.
    dm = distance_matrix_vector(d1, d2)
    min_dist, idxs_in_2 = torch.min(dm, 1)
    dm[:, idxs_in_2] = 100000
    min_2nd, _ = torch.min(dm, 1)
    mask = (min_dist / (min_2nd + 1e-8)) <= SNN
    t1 = torch.arange(0, idxs_in_2.size(0))[mask].long()
    t2 = idxs_in_2[mask].long()
    l1t, l2t = lafs1[t1], lafs2[t2]
    _, in1, _ = get_GT_correspondence_indexes(
        l1t, l2t, H, dist_threshold=DIST)
    n_t, n_in = int(t1.size(0)), int(in1.size(0))
    return n_t, n_in, (n_in / max(n_t, 1))


def main():
    torch.set_grad_enabled(False)
    aff = load_net(AffNetFast, "/root/reference/pretrained/AffNet.pth", PS=32)
    ori = load_net(OriNetFast, "/root/reference/pretrained/OriNet.pth", PS=32)
    det = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=NFEATS, border=5, num_Baum_iters=1,
        AffNet=aff, OriNet=ori)
    sift = SIFTNet(patch_size=32)
    tfeat = load_net(HardTFeatNet, "/root/reference/HardTFeat.pth",
                     sm=SIFTNet(patch_size=32))

    feats = {}
    for i in range(1, 7):
        t0 = time.time()
        img = load_img(i)
        lafs, resp = det(img, do_ori=True)
        patches = det.extract_patches_from_pyr(lafs, PS=32)
        d_sift = sift(patches)
        d_tfeat = tfeat(patches)
        feats[i] = (lafs, d_sift, d_tfeat)
        print(f"img{i}: {lafs.shape[0]} lafs, {time.time()-t0:.1f}s",
              flush=True)

    print(f"\nreference torch pipeline, shipped AffNet.pth + OriNet.pth, "
          f"{NFEATS} feats, do_ori, SNN {SNN}, dist<={DIST}")
    for name, col in (("SIFT", 1), ("HardTFeat", 2)):
        print(f"descriptor = {name}")
        print("pair tentatives true_matches inl_ratio")
        for k in range(2, 7):
            H = torch.from_numpy(
                np.loadtxt(f"/root/reference/test-graf/H1to{k}p")).float()
            nt, ni, r = match_and_score(
                feats[1][col], feats[k][col], feats[1][0], feats[k][0], H)
            print(f"1-{k} {nt} {ni} {r:.3f}", flush=True)


if __name__ == "__main__":
    main()
