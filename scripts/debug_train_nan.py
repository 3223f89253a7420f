"""Isolate the r4 training NaN: run N train steps on the real TPU with the
Pallas batched warp ON or OFF and report the first non-finite step.

  python scripts/debug_train_nan.py [--no-pallas] [--steps 40] [--bs 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--loss", default="HardNegC")
    ap.add_argument("--descriptor", default="TFeat")
    ap.add_argument("--tilt", type=float, default=3.0)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import affnet_tpu  # noqa: F401
    from affnet_tpu.ops import patches as patches_mod
    patches_mod.USE_PALLAS_BATCHED = not args.no_pallas

    from affnet_tpu import data as D
    from affnet_tpu.models import AffNetFast
    from affnet_tpu.models.convert import load_pretrained
    from affnet_tpu.train import (TrainConfig, TrainState, init_momentum,
                                  make_affnet_train_step, make_descriptor)

    imgs = D.load_train_images()
    patches, labels = D.synthetic_pairs_from_images(
        imgs, n_classes=8192, views_per_class=6, seed=0)
    print(f"data: {patches.shape} finite={np.isfinite(patches).all()}",
          flush=True)
    ds = D.PairDataset(patches, labels, 500000,
                       batch_size=args.bs, seed=0)

    cfg = TrainConfig(batch_size=args.bs, n_pairs=500000, epochs=20,
                      descriptor=args.descriptor, loss=args.loss, lr=0.005)
    desc_params = load_pretrained("HardTFeatNet") \
        if args.descriptor == "TFeat" else None
    step = jax.jit(make_affnet_train_step(
        AffNetFast, make_descriptor(args.descriptor, desc_params), cfg))
    params = AffNetFast.init(jax.random.PRNGKey(0))
    state = TrainState(params, init_momentum(params),
                       jnp.asarray(0, jnp.int32))
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(ds.batches()):
        key, sub = jax.random.split(key)
        state, m = step(state, tuple(jnp.asarray(x) for x in batch), sub,
                        args.tilt)
        loss = float(m["loss"])
        print(f"step {i} loss {loss:.4f} dd {float(m['descr_dist']):.4f}",
              flush=True)
        if i >= args.steps or not np.isfinite(loss):
            gnorm = jax.tree_util.tree_map(
                lambda x: float(jnp.abs(x).max()), state.params)
            bad = [k for k, v in gnorm.items()
                   if not all(np.isfinite(list(vv for vv in v.values()))
                              for v in [v])]
            print("first NaN at step", i, flush=True)
            break


if __name__ == "__main__":
    main()
