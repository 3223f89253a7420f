"""One-pass dense-AffNet extraction: image -> ells (+ optional descriptors),
with per-stage timing prints.

Reference: examples/hesaffnet/extract_geom_and_desc_upisup.py:35-81
(OnePassSIR, dense AffNet loaded from the shipped AffNet.pth — the dense
trunk is layer-compatible — border 15, mrSize 5.192) and
extract_geomOriTh.py:30-92 (--th 28.41 --do-ori mode, saves LAFs .npy).

Usage: python -m affnet_tpu.cli.extract_geom img.png out.txt 2000
       python -m affnet_tpu.cli.extract_geom img.png out.txt --th 28.41 \
           --do-ori --save-lafs lafs1.npy
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from .hesaffnet import load_gray


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_image")
    parser.add_argument("output_fname")
    parser.add_argument("nfeats", type=int, nargs="?", default=2000)
    parser.add_argument("--th", type=float, default=None,
                        help="threshold mode (e.g. 28.41, the classical "
                             "HessianAffine default)")
    parser.add_argument("--do-ori", action="store_true")
    parser.add_argument("--descriptor", default=None,
                        choices=[None, "SIFT", "HardNet"])
    parser.add_argument("--desc-weights", default=None)
    parser.add_argument("--fast", action="store_true",
                        help="bf16 gather/CNN fast mode (f32 detection)")
    parser.add_argument("--save-lafs", default=None)
    parser.add_argument("--save-descs", default=None)
    parser.add_argument("--max-keypoints", type=int, default=16384,
                        help="static cap on survivors in threshold mode; a "
                             "warning is printed (with the true detected "
                             "count) if it binds")
    args = parser.parse_args(argv)

    import jax
    from ..detector import DetectorConfig
    from ..onepass import OnePassSIR
    from ..laf import lafs_to_ells_host
    from ..models import HardNet, OriNetFast32, SIFTNet
    from ..models.convert import load_params_npz, load_pretrained
    from ..io_formats import write_ells

    img = load_gray(args.input_image)
    params = {"aff": load_pretrained("AffNetFast")}

    desc_net = None
    if args.descriptor == "SIFT":
        desc_net = SIFTNet(patch_size=32)
    elif args.descriptor == "HardNet":
        desc_net = HardNet
        params["desc"] = (load_params_npz(args.desc_weights)
                          if args.desc_weights
                          else HardNet.init(jax.random.PRNGKey(0)))
    ori_net = None
    if args.do_ori:
        ori_net = OriNetFast32
        params["ori"] = load_pretrained("OriNetFast")

    cfg = DetectorConfig(num_features=args.nfeats, border=15, mr_size=5.192,
                         num_baum_iters=0, th=args.th,
                         max_keypoints=args.max_keypoints, patch_size=32,
                         fast=args.fast)
    det = OnePassSIR(cfg, ori_net=ori_net, desc_net=desc_net)

    t0 = time.time()
    out = det(img, params=params, do_ori=args.do_ori,
              describe=desc_net is not None)
    print(f"det time = {time.time() - t0:.3f}")
    t0 = time.time()
    ells = np.asarray(lafs_to_ells_host(out["lafs"]))
    print(f"LAFs2ell time = {time.time() - t0:.3f}")
    write_ells(args.output_fname, ells)
    if args.save_lafs:
        np.save(args.save_lafs, out["lafs"])
    if args.save_descs and "descs" in out:
        np.save(args.save_descs, out["descs"])
    print(f"{len(ells)} regions -> {args.output_fname}")


if __name__ == "__main__":
    main()
