"""Golden fixture for the OnePassSIR (dense AffNet) pipeline.

OnePassSIR.py is python-2 only (print statements), so we exec a
mechanically-patched copy (py2 prints stripped — no semantic change) with
the real reference modules, using AffNetFastFullConv + the shipped
AffNet.pth weights (the 'AffNetFastFullAff' the example scripts import does
not exist in the reference; FullConv is the intended dense model, see
SURVEY.md section 0).

torch-only process.  Run:  python scripts/make_onepass_fixture.py
"""

import os
import re
import sys
import types

sys.path.insert(0, "/root/reference")
tv = types.ModuleType("torchvision")
tv.transforms = types.ModuleType("t")
sys.modules["torchvision"] = tv
sys.modules["torchvision.transforms"] = tv.transforms

import numpy as np
import torch
import torch.nn.functional as F

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")


def load_onepass_class():
    src = open("/root/reference/OnePassSIR.py").read()
    # Strip py2 print statements (pure logging; no data flow).
    src = re.sub(r"^(\s*)print .*$", r"\1pass", src, flags=re.M)
    ns: dict = {}
    exec(compile(src, "OnePassSIR_py3", "exec"), ns)
    return ns["OnePassSIR"]


def main():
    os.makedirs(FIX, exist_ok=True)
    from architectures import AffNetFastFullConv
    from PIL import Image

    OnePassSIR = load_onepass_class()
    img = Image.open("/root/reference/test-graf/img1.png").convert("RGB")
    arr = np.mean(np.array(img), axis=2).astype(np.float32)[:120, :160]
    t = torch.from_numpy(arr)[None, None]

    dense = AffNetFastFullConv(PS=32)
    ckpt = torch.load("/root/reference/pretrained/AffNet.pth",
                      map_location="cpu", weights_only=False)
    dense.load_state_dict(ckpt["state_dict"])
    dense.eval()

    det = OnePassSIR(mrSize=5.192, num_features=50, border=15,
                     num_Baum_iters=0, th=None, AffNet=dense)
    with torch.no_grad():
        lafs, resp = det(t, do_ori=False)
        dense_map = dense(t).numpy()           # (1, 4, h, w)
    np.savez(os.path.join(FIX, "onepass_golden.npz"), img=arr,
             lafs=lafs.numpy(), resp=resp.numpy(),
             dense_map=np.transpose(dense_map, (0, 2, 3, 1)))
    print("onepass lafs:", lafs.shape, "resp:", resp.shape)


if __name__ == "__main__":
    main()
