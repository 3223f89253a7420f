"""Train OriNet on Brown/PhotoTour patch pairs.

Reference: train_OriNet_test_on_graffity.py — random rotation + scale
0.9-1.2 + +-2px shifts; losses HardNet / PosDist / Geom (angle matrices).

Usage mirrors train_affnet; see its docstring.
"""

from __future__ import annotations

import os

from .train_affnet import build_parser, make_dataset


def main(argv=None):
    parser = build_parser()
    parser.set_defaults(arch="OriNetFast32", loss="HardNet")
    args = parser.parse_args(argv)

    from ..models import REGISTRY
    from ..models.convert import load_params_npz
    from ..train import TrainConfig, load_checkpoint, train_loop

    model = REGISTRY[args.arch]
    cfg = TrainConfig(arch=args.arch, descriptor=args.descriptor,
                      loss=args.loss, lr=args.lr, wd=args.wd,
                      batch_size=args.batch_size, n_pairs=args.n_pairs,
                      epochs=args.epochs, log_interval=args.log_interval,
                      seed=args.seed)
    suffix = (f"{args.expname}_OriNet_6Brown_{args.descriptor}_"
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
            raise SystemExit("HardNet descriptor needs --desc-weights")

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
            # Per-epoch graf test with the shipped AffNet + the TRAINED
            # OriNet injected (reference test(),
            # train_OriNet_test_on_graffity.py:304-312).
            from .eval_graf import main as eval_main
            from ..train import save_checkpoint
            ckpt = os.path.join(log_dir, f"checkpoint_{epoch}.npz")
            # epoch+1 = resume start (same convention as the
            # train-loop checkpoint this overwrites).
            save_checkpoint(ckpt, params, epoch + 1)
            print(f"[graf eval epoch {epoch}]")
            eval_argv = ["--nfeats", "1000", "--img2-idx", "3",
                         "--descriptor", "SIFT", "--do-ori",
                         "--ori-weights", ckpt]
            if not args.no_vis:
                eval_argv += ["--save-vis",
                              os.path.join(log_dir, f"vis_epoch_{epoch}")]
            eval_main(eval_argv)

    dataset = make_dataset(args)
    train_loop(model, dataset, cfg, log_dir=log_dir,
               desc_params=desc_params, start_params=start_params,
               start_epoch=start_epoch, mesh=mesh, ori=True, eval_fn=eval_fn)


if __name__ == "__main__":
    main()
