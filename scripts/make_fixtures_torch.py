"""Generate parity-test fixtures from torch oracles (torch-only process).

Outputs tests/fixtures/*.npz consumed by the JAX test suite (which never
imports torch).  Oracles:
  - convertJIT/AffNetJIT.pt, OriNetJIT.pt: the reference's own traced exports
    of AffNetFast / OriNetFast with the shipped weights (raw head features).
  - torch F.affine_grid + F.grid_sample with align_corners=True replicating
    the reference patch sampler (LAF.py:313-372; torch-0.4 semantics).

Run:  python scripts/make_fixtures_torch.py
"""

import os

import numpy as np
import torch
import torch.nn.functional as F

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")
REF = "/root/reference"


def jit_oracles(rng):
    patches = rng.rand(16, 1, 32, 32).astype(np.float32)
    aff = torch.jit.load(f"{REF}/convertJIT/AffNetJIT.pt", map_location="cpu")
    ori = torch.jit.load(f"{REF}/convertJIT/OriNetJIT.pt", map_location="cpu")
    with torch.no_grad():
        a = aff(torch.from_numpy(patches)).numpy()
        o = ori(torch.from_numpy(patches)).numpy()
    np.savez(os.path.join(FIX, "jit_oracles.npz"),
             patches=patches[:, 0], affnet_feats=a, orinet_feats=o)
    print("jit_oracles:", a.shape, o.shape)


def grid_sample_oracle(rng):
    """Reference extract_patches math on a random image."""
    h, w = 48, 64
    img = rng.rand(h, w).astype(np.float32)
    n = 8
    lafs = np.zeros((n, 2, 3), np.float32)
    # Random well-conditioned normalized LAFs.
    for i in range(n):
        s = 0.02 + 0.2 * rng.rand()
        th = rng.rand() * 2 * np.pi
        t = 1.0 + rng.rand()
        R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
        lafs[i, :2, :2] = s * (R @ np.diag([t, 1.0 / t]))
        lafs[i, 0, 2] = 0.15 + 0.7 * rng.rand()
        lafs[i, 1, 2] = 0.15 + 0.7 * rng.rand()
    timg = torch.from_numpy(img)[None, None]
    tlafs = torch.from_numpy(lafs)
    outs = {}
    for ps in (19, 32):
        for ac in (True, False):
            min_size = min(h, w)
            coef = torch.ones(1, 2, 3) * min_size
            coef[0, 0, 2] = w
            coef[0, 1, 2] = h
            grid = F.affine_grid(tlafs * coef.expand(n, 2, 3),
                                 torch.Size((n, 1, ps, ps)), align_corners=ac)
            grid[:, :, :, 0] = 2.0 * grid[:, :, :, 0] / float(w) - 1.0
            grid[:, :, :, 1] = 2.0 * grid[:, :, :, 1] / float(h) - 1.0
            out = F.grid_sample(timg.expand(n, 1, h, w), grid,
                                align_corners=ac, padding_mode="zeros")
            suffix = "" if ac else "_ac0"
            outs[f"patches{ps}{suffix}"] = out[:, 0].numpy()
    np.savez(os.path.join(FIX, "grid_sample.npz"),
             img=img, lafs=lafs, **outs)
    print("grid_sample:", {k: v.shape for k, v in outs.items()})


def gaussian_blur_oracle(rng):
    """Reference GaussianBlur: full 2-D CircularGaussKernel conv with
    replicate padding (Utils.py:92-114,150-166; py2 integer halfSize)."""
    img = rng.rand(40, 56).astype(np.float32)
    out = {}
    for sigma, py2 in [(1.52, True), (1.227, True), (2.46, True),
                       (1.52, False), (1.227, False), (2.46, False)]:
        kernlen = int(2.0 * 3.0 * sigma + 1.0)
        if kernlen % 2 == 0:
            kernlen += 1
        half = kernlen // 2 if py2 else kernlen / 2.0
        x = np.linspace(-half, half, kernlen)
        xv, yv = np.meshgrid(x, x, indexing="xy")
        k = np.exp(-((xv ** 2 + yv ** 2) / (2.0 * sigma * sigma)))
        k = (k / k.sum()).astype(np.float32)
        pad = int(np.floor(kernlen / 2.0))
        t = torch.from_numpy(img)[None, None]
        t = F.pad(t, (pad, pad, pad, pad), "replicate")
        o = F.conv2d(t, torch.from_numpy(k)[None, None]).numpy()[0, 0]
        out[f"blur_{sigma}" + ("_py2" if py2 else "")] = o
    np.savez(os.path.join(FIX, "gaussian_blur.npz"), img=img, **out)
    print("gaussian_blur:", list(out.keys()))


def descriptor_oracles(rng):
    """Descriptor-CNN parity oracles (VERDICT r3 Missing #1): run the
    reference's OWN HardNet.py classes — HardTFeatNet with the shipped
    HardTFeat.pth weights, HardNet with seeded-random init (HardNet++.pth is
    absent from the mount) — on fixed random patches.  The HardNet torch
    state_dict is embedded in the npz so the JAX test converts + compares
    without torch."""
    import sys
    sys.path.insert(0, REF)
    from HardNet import HardNet, HardTFeatNet  # noqa: E402

    patches = rng.rand(16, 1, 32, 32).astype(np.float32)
    t = torch.from_numpy(patches)
    out = {"patches": patches[:, 0]}

    tfeat = HardTFeatNet(None)  # sm (SIFT) unused by the descriptor forward
    sd = torch.load(f"{REF}/HardTFeat.pth", map_location="cpu",
                    weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    tfeat.load_state_dict(sd, strict=False)
    tfeat.eval()
    with torch.no_grad():
        out["hardtfeat_descs"] = tfeat(t).numpy()

    torch.manual_seed(1234)
    hn = HardNet()
    hn.eval()
    with torch.no_grad():
        out["hardnet_descs"] = hn(t).numpy()
    for k, v in hn.state_dict().items():
        out[f"hardnet_sd::{k}"] = v.numpy()

    np.savez(os.path.join(FIX, "descriptor_oracles.npz"), **out)
    print("descriptor_oracles:", out["hardtfeat_descs"].shape,
          out["hardnet_descs"].shape)


def main():
    os.makedirs(FIX, exist_ok=True)
    rng = np.random.RandomState(42)
    jit_oracles(rng)
    grid_sample_oracle(rng)
    gaussian_blur_oracle(rng)
    descriptor_oracles(rng)


if __name__ == "__main__":
    main()
