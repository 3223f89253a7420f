"""Measure train-step COMPILE time under conv-backward strategies on the
remote TPU compile service (the r3/r4 pathology: NCHW conv backward 1.6 s
bare but 15-20 s fused with BN/relu; full AffNet+HardNet step ~45 min).

  python scripts/bench_compile.py --what desc --strategy explicit [--bs 512]
  python scripts/bench_compile.py --what affnet --strategy xla --descriptor HardNet

Prints compile seconds (AOT .lower().compile(), no execution) and one
executed-step time.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["desc", "affnet"], default="desc")
    ap.add_argument("--strategy", choices=["xla", "explicit"],
                    default="xla")
    ap.add_argument("--descriptor", default="HardNet")
    ap.add_argument("--arch", default="HardNet",
                    help="descriptor arch for --what desc")
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--run", action="store_true",
                    help="also execute one step and time it")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import affnet_tpu  # noqa: F401
    from affnet_tpu.models import cnn

    if args.strategy == "explicit":
        cnn.CONV_VJP = "explicit"

    from affnet_tpu import train as T
    from affnet_tpu.models import REGISTRY
    from affnet_tpu.models.convert import load_pretrained

    bs = args.bs
    cfg = T.TrainConfig(batch_size=bs, n_pairs=bs * 100, epochs=1,
                        descriptor=args.descriptor,
                        loss="HardNegC" if args.what == "affnet" else "HardNet",
                        lr=0.005)

    if args.what == "desc":
        model = REGISTRY[args.arch]
        step = T.make_descriptor_train_step(model, None, cfg)
    else:
        model = REGISTRY["AffNetFast"]
        if args.descriptor == "TFeat":
            desc_params = load_pretrained("HardTFeatNet")
        else:
            # HardNet++ weights are absent from the mount; compile time does
            # not depend on the values.
            desc_params = REGISTRY["HardNet"].init(jax.random.PRNGKey(7))
        desc_fn = T.make_descriptor(args.descriptor, desc_params)
        step = T.make_affnet_train_step(model, desc_fn, cfg)

    params = model.init(jax.random.PRNGKey(0))
    state = T.TrainState(params, T.init_momentum(params),
                         jnp.asarray(0, jnp.int32))
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(bs, 64, 64).astype(np.float32))
    p = jnp.asarray(rng.rand(bs, 64, 64).astype(np.float32))
    key = jax.random.PRNGKey(1)

    jit_step = jax.jit(step)
    t0 = time.time()
    if args.what == "affnet":
        lowered = jit_step.lower(state, (a, p), key, 3.0)
    else:
        lowered = jit_step.lower(state, (a, p), key)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"what={args.what} strategy={args.strategy} bs={bs} "
          f"descriptor={cfg.descriptor}: lower {t_lower:.1f} s, "
          f"COMPILE {t_compile:.1f} s", flush=True)

    if args.run:
        from affnet_tpu.utils import fence
        if args.what == "affnet":
            st, m = compiled(state, (a, p), key, 3.0)
        else:
            st, m = compiled(state, (a, p), key)
        fence(m["loss"])
        t0 = time.time()
        for _ in range(5):
            if args.what == "affnet":
                st, m = compiled(st, (a, p), key, 3.0)
            else:
                st, m = compiled(st, (a, p), key)
        loss = float(np.asarray(m["loss"]))
        dt = (time.time() - t0) / 5
        print(f"step {dt*1e3:.1f} ms, loss {loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
