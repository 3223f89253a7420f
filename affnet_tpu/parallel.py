"""Multi-chip parallelism: device meshes + sharded training / extraction.

The reference has NO distributed code (SURVEY.md section 2.7) — parallelism
here is a TPU-native addition.  For 32x32-patch CNNs the meaningful axis is
the batch, so the design is pure data parallelism expressed through
jax.sharding + jit (GSPMD): annotate the batch axis, let XLA insert the
collectives (psum for loss/grad reductions and the cross-shard gathers the
hardest-in-batch losses need).  Semantics are IDENTICAL to single-chip: the
hard-negative mining still sees the full global batch.

Scaling axes:
  - training: batch-sharded train step (`shard_train_step`)
  - bulk patch inference (AffNet/HardNet over thousands of patches):
    `shard_apply`
  - bulk image extraction: one detector program per image shape, vmapped and
    batch-sharded (`make_sharded_image_pipeline`)
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, devices=None,
              axis: str = BATCH_AXIS) -> Mesh:
    """1-D device mesh over the batch axis.  Prefers the default backend;
    falls back to the (virtual) CPU backend when more devices are requested
    than the default backend has."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            cpus = jax.devices("cpu")
            if len(cpus) >= n_devices:
                devices = cpus
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(BATCH_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a train step (state, batch, key, max_tilt) -> (state, metrics)
    so the patch batch (a pair OR triplet tuple of (N, H, W) arrays) is
    sharded over the mesh and params/optimizer state are replicated.  XLA
    inserts all collectives (GSPMD)."""
    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P(BATCH_AXIS, None, None))

    def constrained(state, batch, key, max_tilt=None):
        batch = tuple(jax.lax.with_sharding_constraint(x, bsh)
                      for x in batch)
        new_state, metrics = step_fn(state, batch, key, max_tilt)
        return new_state, metrics

    # `bsh` as the batch in_sharding is a pytree prefix: it applies to every
    # leaf of the tuple, so pair AND triplet batches both shard.
    return jax.jit(constrained,
                   in_shardings=(rep, bsh, rep, None),
                   out_shardings=(rep, rep),
                   static_argnums=(),
                   donate_argnums=(0,))


def shard_apply(net, mesh: Mesh) -> Callable:
    """Data-parallel patch-CNN inference: (params, patches (N, PS, PS)) with
    N sharded over the mesh.  Replaces the reference's batched_forward
    memory chunking (Utils.py:37-66) with cross-chip scaling."""
    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P(BATCH_AXIS, None, None))

    def apply(params, patches):
        patches = jax.lax.with_sharding_constraint(patches, bsh)
        return net(params, patches)

    return jax.jit(apply, in_shardings=(rep, bsh))


def make_sharded_image_pipeline(detector, h: int, w: int, mesh: Mesh,
                                do_ori: bool = False, describe: bool = True):
    """Bulk extraction: a batch of same-shape images sharded over chips, each
    running the full single-image program (throughput mode over ICI/DCN).
    Returns jitted (params, imgs (B, H, W)) -> per-image stacked outputs;
    B must be a multiple of the mesh size.  Used by the hesaffnet CLI's
    multi-image mode (--mesh); equivalence vs per-image single-device runs is
    tested on the 8-CPU mesh (tests/test_train.py)."""
    raw, _plan = detector._build(h, w, do_ori, describe)
    img_sh = NamedSharding(mesh, P(BATCH_AXIS, None, None))

    def batched(params, imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, img_sh)
        return jax.vmap(lambda im: raw(params, im))(imgs)

    return jax.jit(batched, in_shardings=(replicated(mesh), img_sh))
