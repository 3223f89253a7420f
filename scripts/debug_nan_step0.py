"""Dissect the r4 step-0 NaN gradient: same batch + key as the failing run,
gradient finiteness with the Pallas batched warp ON vs OFF, and per-stage
intermediate checks.

  python scripts/debug_nan_step0.py [--no-pallas] [--cpu]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import affnet_tpu  # noqa: F401
    from affnet_tpu.ops import patches as patches_mod
    from affnet_tpu.ops import pallas_patches
    patches_mod.USE_PALLAS_BATCHED = not args.no_pallas

    ctx = (jax.default_device(jax.devices("cpu")[0]) if args.cpu
           else jax.default_device(jax.devices()[0]))
    if args.cpu:
        pallas_patches.INTERPRET = True

    from affnet_tpu import augmentation, data as D, losses
    from affnet_tpu.models import AffNetFast
    from affnet_tpu.models.convert import load_pretrained
    from affnet_tpu.train import (TrainConfig, make_descriptor)

    imgs = D.load_train_images()
    patches, labels = D.synthetic_pairs_from_images(
        imgs, n_classes=8192, views_per_class=6, seed=0)
    ds = D.PairDataset(patches, labels, 500000, batch_size=1024, seed=0)
    batch = next(iter(ds.batches()))

    cfg = TrainConfig(batch_size=1024, n_pairs=500000, epochs=20,
                      descriptor="TFeat", loss="HardNegC", lr=0.005)
    desc_fn = make_descriptor("TFeat", load_pretrained("HardTFeatNet"))
    model = AffNetFast

    key = jax.random.PRNGKey(0)
    _, sub = jax.random.split(key)         # train_loop's first step key
    ps = cfg.patch_size

    with ctx:
        params = model.init(jax.random.PRNGKey(0))
        data_a = jnp.asarray(batch[0])
        data_p = jnp.asarray(batch[1])

        def stages(params, data_a, data_p, key):
            k1, k2, k3, k4 = jax.random.split(key, 6)[:4]
            crop_a, full_a, rot_a, _ = augmentation.extract_random_laf(
                k1, data_a, math.pi, 3.0, ps)
            crop_p, full_p, _, _ = augmentation.extract_random_laf(
                k2, data_p, rot_a, 3.0, ps)
            A_a, _ = model.apply_with_state(params, crop_a, rng=k3)
            A_p, _ = model.apply_with_state(params, crop_p, rng=k4)
            patch_a = augmentation.warp_by_predicted_transform(full_a, A_a, ps)
            patch_p = augmentation.warp_by_predicted_transform(full_p, A_p, ps)
            desc_a = desc_fn(patch_a)
            desc_p = desc_fn(patch_p)
            loss = losses.loss_hardnegc(desc_a, desc_p)
            return {"crop_a": crop_a, "A_a": A_a, "A_p": A_p,
                    "patch_a": patch_a, "patch_p": patch_p,
                    "desc_a": desc_a, "desc_p": desc_p, "loss": loss}

        out = jax.jit(stages)(params, data_a, data_p, sub)
        for k, v in out.items():
            v = np.asarray(v)
            print(f"{k}: finite={np.isfinite(v).all()}"
                  f" max={np.abs(v).max():.4g}", flush=True)
        A = np.asarray(out["A_a"])
        dets = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
        print("A_a det min/max:", dets.min(), dets.max(), flush=True)
        print("A_a absmax:", np.abs(A).max(), flush=True)

        def loss_only(params):
            return stages(params, data_a, data_p, sub)["loss"]

        g = jax.jit(jax.grad(loss_only))(params)
        bad = []
        for lname, leaf in g.items():
            for pname, arr in leaf.items():
                a = np.asarray(arr)
                if not np.isfinite(a).all():
                    bad.append((lname, pname, float(np.abs(a).max())))
        print("pallas" if not args.no_pallas else "xla",
              "grad non-finite leaves:", bad or "NONE", flush=True)


if __name__ == "__main__":
    main()
