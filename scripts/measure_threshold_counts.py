"""Measure threshold-mode NMS survivor counts (VERDICT r3 item 8).

Runs detection-only at the classical threshold th=28.41
(examples/hesaffnet/extract_geomOriTh.py:30) on the six graf images and a
1080p upscale of img1, and reports n_detected (NMS survivors before any
cap/gate) so DetectorConfig.max_keypoints and the CLI defaults can be sized
from data instead of guesses.

Run: python scripts/measure_threshold_counts.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
from PIL import Image

import affnet_tpu  # noqa: F401
from affnet_tpu.detector import DetectorConfig, ScaleSpaceAffinePatchExtractor
from affnet_tpu.models import AffNetFast
from affnet_tpu.models.convert import load_pretrained

GRAF = "/root/reference/test-graf"


def load_gray(path, size=None):
    im = Image.open(path).convert("RGB")
    if size is not None:
        im = im.resize(size, Image.BILINEAR)
    return np.mean(np.asarray(im), axis=2).astype(np.float32)


def main():
    params = {"aff": load_pretrained("AffNetFast")}
    cfg = DetectorConfig(num_features=-1, border=5, mr_size=5.192,
                         num_baum_iters=1, th=28.41, max_keypoints=16384,
                         fast=True)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast)

    results = {}
    for i in range(1, 7):
        img = load_gray(os.path.join(GRAF, f"img{i}.png"))
        out = det(img, params=params)
        results[f"graf_img{i}_{img.shape[1]}x{img.shape[0]}"] = {
            "n_detected": int(out["n_detected"]),
            "n_kept_after_gates": int(len(out["resp"])),
        }
        print(json.dumps({f"img{i}": results[f"graf_img{i}_{img.shape[1]}x{img.shape[0]}"]}),
              flush=True)

    img = load_gray(os.path.join(GRAF, "img1.png"), size=(1920, 1080))
    out = det(img, params=params)
    results["graf_img1_1920x1080"] = {
        "n_detected": int(out["n_detected"]),
        "n_kept_after_gates": int(len(out["resp"])),
    }
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
