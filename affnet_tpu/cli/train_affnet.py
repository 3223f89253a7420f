"""Train AffNet on Brown/PhotoTour patch pairs (with per-epoch graf eval).

Reference: train_AffNet_test_on_graffity.py (flags :49-97, run_me.sh:9).
Same knobs: --dataroot --log-dir --epochs --batch-size --n-pairs --lr --wd
--descriptor {pixels,SIFT,HardNet,TFeat} --loss {HardNet,HardNegC,PosDist}
--arch <11 AffNet variants> --resume --seed.

Extra (TPU): --mesh N shards the batch over N devices; --synthetic trains on
offline homography-warped crops of test-graf img1 when no dataset exists.

Usage: python -m affnet_tpu.cli.train_affnet --dataroot dataset/6Brown \
          --lr 0.005 --n-pairs 10000000 --batch-size 1024 \
          --descriptor HardNet --arch AffNetFast --loss HardNegC --epochs 20
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataroot", type=str, default="datasets/")
    p.add_argument("--log-dir", default="./logs")
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--total-epochs", type=int, default=0,
                   help="epochs spanned by the LR decay when a run is "
                        "split into resumed chunks (0 = --epochs)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--n-pairs", type=int, default=500000)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--wd", default=1e-4, type=float)
    p.add_argument("--expname", default="", type=str)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--descriptor", type=str, default="pixels",
                   choices=["pixels", "SIFT", "HardNet", "TFeat"])
    p.add_argument("--desc-weights", default=None)
    p.add_argument("--loss", type=str, default="HardNet",
                   choices=["HardNet", "HardNegC", "PosDist",
                            "random_sampling"])
    p.add_argument("--arch", type=str, default="AffNetFast")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the batch over N devices (0 = single device)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on offline synthetic pairs (no dataset needed)")
    p.add_argument("--gen-tilt", type=float, default=3.0,
                   help="synthetic generator: max anisotropic view tilt")
    p.add_argument("--gen-mesh", type=float, default=0.0,
                   help="synthetic generator: non-planar mesh-warp "
                        "amplitude in px (curved-surface parallax)")
    p.add_argument("--gen-blur", type=float, default=0.0,
                   help="synthetic generator: max per-view Gaussian blur "
                        "sigma (cross-view defocus mismatch)")
    p.add_argument("--gen-classes", type=int, default=8192,
                   help="synthetic generator: number of patch classes "
                        "(distinct anchor locations across source images)")
    p.add_argument("--gen-views", type=int, default=6,
                   help="synthetic generator: views per class (more views "
                        "= more distinct correspondences per anchor)")
    p.add_argument("--conv-vjp", choices=["xla", "explicit"], default="xla",
                   help="conv backward strategy: 'explicit' compiles the "
                        "train step far faster on the remote compile "
                        "service (bit-exact gradients; see models/cnn.py)")
    p.add_argument("--host-data", action="store_true",
                   help="build batches on the host (upload 33 MB/step) "
                        "instead of the device-resident store")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--no-vis", action="store_true",
                   help="skip per-epoch LAF overlay PNGs in the log dir "
                        "(reference saves them every epoch, "
                        "train_AffNet_test_on_graffity.py:290-309)")
    return p


def make_dataset(args):
    import numpy as np
    from .. import data as D
    if args.synthetic:
        imgs = D.load_train_images()
        if imgs:
            # Multi-image, tilt-diverse, photometrically-jittered classes
            # from NON-test reference images (no graf leakage).
            patches, labels = D.synthetic_pairs_from_images(
                imgs, n_classes=getattr(args, "gen_classes", 8192),
                views_per_class=getattr(args, "gen_views", 6),
                seed=args.seed,
                max_tilt=getattr(args, "gen_tilt", 3.0),
                mesh_warp=getattr(args, "gen_mesh", 0.0),
                blur_jitter=getattr(args, "gen_blur", 0.0))
        else:
            from PIL import Image
            img = np.mean(np.asarray(Image.open(
                "/root/reference/test-graf/img1.png").convert("RGB")),
                axis=2)
            patches, labels = D.synthetic_pairs_from_image(
                img, n_classes=2048, views_per_class=4, seed=args.seed)
    else:
        patches, labels = D.load_total_datasets(args.dataroot)
    # random_sampling needs explicit negatives -> triplet batches
    # (reference TripletPhotoTour + loss_random_sampling).
    cls = (D.TripletDataset if args.loss == "random_sampling"
           else D.PairDataset)
    ds = cls(patches, labels, args.n_pairs,
             batch_size=args.batch_size, seed=args.seed)
    if cls is D.PairDataset and not getattr(args, "host_data", False):
        # Device-resident batches: one-time store upload, 8 KB/step index
        # transfers instead of 33 MB/step pair uploads (see data.py).
        ds = D.DevicePairDataset(ds)
    return ds


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.conv_vjp != "xla":
        from ..models import cnn
        cnn.CONV_VJP = args.conv_vjp

    from ..models import REGISTRY
    from ..models.convert import load_params_npz
    from ..train import TrainConfig, load_checkpoint, train_loop

    model = REGISTRY[args.arch]
    cfg = TrainConfig(arch=args.arch, descriptor=args.descriptor,
                      loss=args.loss, lr=args.lr, wd=args.wd,
                      batch_size=args.batch_size, n_pairs=args.n_pairs,
                      epochs=args.epochs, log_interval=args.log_interval,
                      seed=args.seed,
                      total_epochs=args.total_epochs or None)
    suffix = (f"{args.expname}_{args.arch}_6Brown_{args.descriptor}_"
              f"{args.lr}_{args.n_pairs}_{args.loss}")
    log_dir = os.path.join(args.log_dir, suffix)
    os.makedirs(log_dir, exist_ok=True)

    desc_params = None
    if args.descriptor in ("HardNet", "TFeat"):
        if args.desc_weights:
            desc_params = load_params_npz(args.desc_weights)
        elif args.descriptor == "TFeat":
            from ..models.convert import load_pretrained
            desc_params = load_pretrained("HardTFeatNet")
        else:
            raise SystemExit("HardNet descriptor training needs "
                             "--desc-weights (HardNet++.pth is not shipped)")

    start_params, start_epoch = None, args.start_epoch
    if args.resume:
        start_params, start_epoch = load_checkpoint(args.resume)

    mesh = None
    if args.mesh:
        from ..parallel import make_mesh
        mesh = make_mesh(args.mesh)

    eval_fn = None
    if not args.no_eval:
        def eval_fn(params, epoch):
            # Per-epoch graf test with the TRAINED AffNet injected as the
            # detector's shape net (reference test(), :262-339).
            from .eval_graf import main as eval_main
            from ..train import save_checkpoint
            ckpt = os.path.join(log_dir, f"checkpoint_{epoch}.npz")
            # epoch+1 = resume start (same convention as the
            # train-loop checkpoint this overwrites).
            save_checkpoint(ckpt, params, epoch + 1)
            print(f"[graf eval epoch {epoch}]")
            eval_argv = ["--nfeats", "1000", "--img2-idx", "3",
                         "--descriptor", "SIFT",
                         "--shape-arch", args.arch,
                         "--shape-weights", ckpt]
            if not args.no_vis:
                # Per-epoch LAF overlays like the reference's test()
                # (train_AffNet_test_on_graffity.py:290-309).
                eval_argv += ["--save-vis",
                              os.path.join(log_dir, f"vis_epoch_{epoch}")]
            eval_main(eval_argv)

    dataset = make_dataset(args)
    train_loop(model, dataset, cfg, log_dir=log_dir,
               desc_params=desc_params, start_params=start_params,
               start_epoch=start_epoch, mesh=mesh, eval_fn=eval_fn)


if __name__ == "__main__":
    main()
