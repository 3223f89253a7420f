"""Train a descriptor CNN (HardNet-from-scratch) on patch pairs.

The reference's canonical AffNet config trains against a pretrained
HardNet++ (run_me.sh:9) whose weights are absent from this mount
(.MISSING_LARGE_BLOBS); this trainer closes that gap by training the
HardNet architecture (reference HardNet.py:61-101) with loss_HardNet
(Losses.py:113-180) on the same pair data the other trainers use —
hardest-in-batch margin loss, torch-exact SGD, linear LR decay.

Per-epoch eval runs the full graf pipeline with the trained descriptor
(shipped AffNet shape net), mirroring the AffNet trainer's test() loop.

Usage:
  python -m affnet_tpu.cli.train_descriptor --synthetic --epochs 4 \
      --n-pairs 500000 --batch-size 1024 [--arch HardNet] [--lr 0.1]
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
                   help="epochs spanned by the LR schedule (chunked runs)")
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--n-pairs", type=int, default=500000)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--wd", default=1e-4, type=float)
    p.add_argument("--expname", default="", type=str)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--loss", type=str, default="HardNet",
                   choices=["HardNet", "HardNegC", "PosDist"])
    p.add_argument("--arch", type=str, default="HardNet",
                   choices=["HardNet", "HardTFeatNet"])
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the batch over an N-device mesh")
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
    p.add_argument("--conv-vjp", choices=["xla", "explicit"], default="xla",
                   help="conv backward strategy: 'explicit' compiles the "
                        "train step far faster on the remote compile "
                        "service (bit-exact gradients; see models/cnn.py)")
    p.add_argument("--host-data", action="store_true",
                   help="build batches on the host (upload 33 MB/step) "
                        "instead of the device-resident store")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--no-vis", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.conv_vjp != "xla":
        from ..models import cnn
        cnn.CONV_VJP = args.conv_vjp

    from ..models import REGISTRY
    from ..train import TrainConfig, load_checkpoint, train_loop
    from .train_affnet import make_dataset

    model = REGISTRY[args.arch]
    cfg = TrainConfig(arch=args.arch, descriptor="pixels", loss=args.loss,
                      lr=args.lr, wd=args.wd, batch_size=args.batch_size,
                      n_pairs=args.n_pairs, epochs=args.epochs,
                      log_interval=args.log_interval, seed=args.seed,
                      total_epochs=args.total_epochs or None)
    suffix = (f"{args.expname}_{args.arch}_desc_{args.lr}_{args.n_pairs}_"
              f"{args.loss}")
    log_dir = os.path.join(args.log_dir, suffix)
    os.makedirs(log_dir, exist_ok=True)

    dataset = make_dataset(args)

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
            # Full-pipeline graf test with the TRAINED descriptor (shipped
            # AffNet shape net) — the descriptor analog of the reference's
            # per-epoch test().
            from ..train import save_checkpoint
            from .eval_graf import main as eval_main
            ckpt = os.path.join(log_dir, f"checkpoint_{epoch}.npz")
            save_checkpoint(ckpt, params, epoch + 1)
            print(f"[graf eval epoch {epoch}]")
            desc_flag = ("HardNet" if args.arch == "HardNet" else "TFeat")
            eval_argv = ["--nfeats", "1000", "--img2-idx", "3",
                         "--descriptor", desc_flag,
                         "--desc-weights", ckpt]
            if not args.no_vis:
                vis = os.path.join(log_dir, f"vis_epoch_{epoch}")
                eval_argv += ["--save-vis", vis]
            eval_main(eval_argv)

    train_loop(model, dataset, cfg, log_dir=log_dir,
               start_params=start_params, start_epoch=start_epoch,
               mesh=mesh, mode="descriptor", eval_fn=eval_fn)


if __name__ == "__main__":
    main()
