"""Full-resolution detector golden: the EXECUTED reference pipeline on graf
img1 at native size (800x640) with 500 features + 1 AffNet shape iteration
(the hesaffnet CLI config) — pins 1080p-class parity in CI instead of only
in quality evals (VERDICT r4 weak #5; the other detector fixtures are
120x160 crops at 50 features).

torch-only process.  Run:  python scripts/make_fullres_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from make_detector_fixture import FIX, load_graf, make_affnet, run


def main():
    from SparseImgRepresenter import ScaleSpaceAffinePatchExtractor

    img = load_graf(1)  # native 800x640, no crop
    det = ScaleSpaceAffinePatchExtractor(
        mrSize=5.192, num_features=500, border=5, num_Baum_iters=1, th=None,
        AffNet=make_affnet())
    lafs, resp = run(img, det)
    np.savez_compressed(
        os.path.join(FIX, "detector_golden_fullres.npz"),
        img=img.astype(np.float32), lafs=lafs, resp=resp)
    print("fullres golden:", img.shape, lafs.shape, resp.shape)


if __name__ == "__main__":
    main()
