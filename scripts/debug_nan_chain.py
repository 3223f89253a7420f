"""Bisect the r4 step-0 NaN along the backward chain (Pallas batched warp
ON): gradient finiteness of loss wrt descriptors, patches, predicted A, and
CNN params, each as an explicit input cut.

  python scripts/debug_nan_chain.py [--no-pallas] [--cpu]
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
    from affnet_tpu.train import TrainConfig, make_descriptor

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
    _, sub = jax.random.split(key)
    ps = cfg.patch_size

    def report(name, tree):
        leaves = jax.tree_util.tree_leaves(tree)
        bad = [float(np.abs(np.asarray(l)).max()) for l in leaves
               if not np.isfinite(np.asarray(l)).all()]
        mx = max(float(np.abs(np.asarray(l)).max()) for l in leaves)
        n_nan = sum(int((~np.isfinite(np.asarray(l))).sum()) for l in leaves)
        print(f"{name}: finite={not bad} absmax={mx:.4g} n_nonfinite={n_nan}",
              flush=True)

    with ctx:
        params = model.init(jax.random.PRNGKey(0))
        data_a = jnp.asarray(batch[0])
        data_p = jnp.asarray(batch[1])

        k1, k2, k3, k4 = jax.random.split(sub, 6)[:4]

        @jax.jit
        def fwd_chain(params):
            crop_a, full_a, rot_a, _ = augmentation.extract_random_laf(
                k1, data_a, math.pi, 3.0, ps)
            crop_p, full_p, _, _ = augmentation.extract_random_laf(
                k2, data_p, rot_a, 3.0, ps)
            A_a, _ = model.apply_with_state(params, crop_a, rng=k3)
            A_p, _ = model.apply_with_state(params, crop_p, rng=k4)
            return crop_a, crop_p, full_a, full_p, A_a, A_p

        crop_a, crop_p, full_a, full_p, A_a, A_p = fwd_chain(params)

        def from_A(A_a, A_p):
            patch_a = augmentation.warp_by_predicted_transform(full_a, A_a, ps)
            patch_p = augmentation.warp_by_predicted_transform(full_p, A_p, ps)
            return patch_a, patch_p

        def from_patch(patch_a, patch_p):
            return desc_fn(patch_a), desc_fn(patch_p)

        def loss_of_desc(desc_a, desc_p):
            return losses.loss_hardnegc(desc_a, desc_p)

        patch_a, patch_p = jax.jit(from_A)(A_a, A_p)
        desc_a, desc_p = jax.jit(from_patch)(patch_a, patch_p)

        # cut 1: grad wrt descriptors
        gdesc = jax.jit(jax.grad(lambda da, dp: loss_of_desc(da, dp),
                                 argnums=(0, 1)))(desc_a, desc_p)
        report("d loss / d desc", gdesc)

        # cut 2: grad wrt patches (desc backward)
        gpatch = jax.jit(jax.grad(
            lambda pa, pp: loss_of_desc(*from_patch(pa, pp)),
            argnums=(0, 1)))(patch_a, patch_p)
        report("d loss / d patch", gpatch)

        # cut 3: grad wrt A (rewarp backward with the real cotangent)
        gA = jax.jit(jax.grad(
            lambda Aa, Ap: loss_of_desc(*from_patch(*from_A(Aa, Ap))),
            argnums=(0, 1)))(A_a, A_p)
        report("d loss / d A", gA)

        # cut 3b: rewarp backward with the explicit cotangent from cut 2
        _, vjp_a = jax.vjp(lambda Aa: augmentation.
                           warp_by_predicted_transform(full_a, Aa, ps), A_a)
        report("rewarp_a vjp(real g)", vjp_a(gpatch[0]))

        # cut 4: full param grad
        def full(params):
            crop_a, full_a2, rot_a, _ = augmentation.extract_random_laf(
                k1, data_a, math.pi, 3.0, ps)
            crop_p, full_p2, _, _ = augmentation.extract_random_laf(
                k2, data_p, rot_a, 3.0, ps)
            A_a2, _ = model.apply_with_state(params, crop_a, rng=k3)
            A_p2, _ = model.apply_with_state(params, crop_p, rng=k4)
            pa = augmentation.warp_by_predicted_transform(full_a2, A_a2, ps)
            pp = augmentation.warp_by_predicted_transform(full_p2, A_p2, ps)
            return loss_of_desc(desc_fn(pa), desc_fn(pp))

        gfull = jax.jit(jax.grad(full))(params)
        report("d loss / d params", gfull)


if __name__ == "__main__":
    main()
