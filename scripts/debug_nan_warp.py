"""Isolate the rewarp VJP NaN: gradient of the predicted-transform warp
wrt the transform, Pallas custom-VJP vs XLA AD, on the exact step-0 batch.

  python scripts/debug_nan_warp.py [--cpu]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import affnet_tpu  # noqa: F401
    from affnet_tpu.ops import pallas_patches, patches as patches_mod

    if args.cpu:
        pallas_patches.INTERPRET = True

    from affnet_tpu import augmentation, data as D
    from affnet_tpu.models import AffNetFast
    from affnet_tpu.train import TrainConfig  # noqa: F401

    imgs = D.load_train_images()
    patches, labels = D.synthetic_pairs_from_images(
        imgs, n_classes=8192, views_per_class=6, seed=0)
    ds = D.PairDataset(patches, labels, 500000, batch_size=1024, seed=0)
    batch = next(iter(ds.batches()))

    dev = jax.devices("cpu")[0] if args.cpu else jax.devices()[0]
    with jax.default_device(dev):
        data_a = jnp.asarray(batch[0])
        key = jax.random.PRNGKey(0)
        _, sub = jax.random.split(key)
        k1, k2, k3, k4 = jax.random.split(sub, 6)[:4]
        crop_a, full_a, rot_a, _ = augmentation.extract_random_laf(
            k1, data_a, math.pi, 3.0, 32)
        params = AffNetFast.init(jax.random.PRNGKey(0))
        A_a, _ = AffNetFast.apply_with_state(params, crop_a, rng=k3)
        print("A_a absmax", float(jnp.abs(A_a).max()), flush=True)

        g = jnp.asarray(np.random.RandomState(3).randn(1024, 32, 32)
                        .astype(np.float32))

        def run(use_pallas):
            patches_mod.USE_PALLAS_BATCHED = use_pallas

            def f(A):
                out = augmentation.warp_by_predicted_transform(full_a, A, 32)
                return (out * g).sum()

            val, grad = jax.jit(jax.value_and_grad(f))(A_a)
            grad = np.asarray(grad)
            print(("pallas" if use_pallas else "xla"),
                  "val", float(val),
                  "grad finite:", bool(np.isfinite(grad).all()),
                  "absmax", float(np.abs(grad).max()),
                  "n_bad_rows", int((~np.isfinite(grad).reshape(
                      grad.shape[0], -1).all(axis=1)).sum()),
                  flush=True)
            return grad

        gp = run(True)
        gx = run(False)
        bad = ~np.isfinite(gp).reshape(gp.shape[0], -1).all(axis=1)
        if bad.any():
            idx = np.nonzero(bad)[0][:8]
            print("bad rows:", idx.tolist(), flush=True)
            print("their A:", np.asarray(A_a)[idx].tolist(), flush=True)


if __name__ == "__main__":
    main()
