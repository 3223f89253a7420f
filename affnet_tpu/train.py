"""Training harness for AffNet and OriNet.

Reference: train_AffNet_test_on_graffity.py and
train_OriNet_test_on_graffity.py.  The whole optimization step — augmentation
warps, model forward (train-mode BN + dropout), predicted-transform rewarp,
descriptor, loss, SGD update, linear LR decay — is ONE jitted function, and
shards over a device mesh via `affnet_tpu.parallel` (batch-axis data
parallelism: the only meaningful axis for 32x32-patch CNNs).

Optimizer semantics match torch SGD exactly (momentum 0.9, dampening 0.9,
weight decay 1e-4 on conv params; train_AffNet...py:354-358) with the
reference's per-step linear LR decay (:341-352).  BatchNorm running stats
ride inside the param tree and are updated by the train-mode forward.
Checkpoints keep the reference's {'epoch', 'state_dict'} *semantics* as
{'epoch', flat params} npz files loadable by models/convert.load_params_npz.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import augmentation, losses
from .models.cnn import Params, l2norm

Array = jax.Array

TILT_SCHEDULE = {0: 3.0, 1: 4.0, 3: 4.5, 5: 4.8, 6: 5.2, 8: 5.8}


def tilt_for_epoch(epoch: int) -> float:
    """Curriculum lookup with backward fill (train_AffNet...py:200-205)."""
    e = epoch
    while e not in TILT_SCHEDULE and e >= 0:
        e -= 1
    return TILT_SCHEDULE.get(max(e, 0), 3.0)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference argparse flags (train_AffNet...py:49-97)."""
    arch: str = "AffNetFast"
    descriptor: str = "pixels"        # pixels | SIFT | HardNet | TFeat
    loss: str = "HardNegC"            # HardNet | HardNegC | PosDist | Geom
    lr: float = 0.005
    wd: float = 1e-4
    momentum: float = 0.9
    dampening: float = 0.9
    batch_size: int = 128
    n_pairs: int = 500000
    epochs: int = 10
    log_interval: int = 10
    seed: int = 0
    patch_size: int = 32
    # Epochs spanned by the linear LR decay; defaults to ``epochs``.  Set
    # when a long run is split into several resumed processes (the axon
    # runtime leaks ~33 MB of host staging per train-step dispatch —
    # measured OOM at 130 GB after ~3900 steps — so long runs restart every
    # few epochs) so the GLOBAL schedule is preserved across chunks.
    total_epochs: Optional[int] = None


# ---------------------------------------------------------------------------
# Param partitioning: trainable conv weights vs BN running stats
# ---------------------------------------------------------------------------

def is_bn_leaf(path: Tuple[str, ...]) -> bool:
    return path[-1] in ("mean", "var")


def _tree_map_with_name(f, params: Params):
    return {k: {kk: f((k, kk), vv) for kk, vv in v.items()}
            for k, v in params.items()}


def trainable_mask(params: Params):
    """1.0 for conv params, 0.0 for BN stats — as a same-shape tree."""
    return _tree_map_with_name(
        lambda path, v: 0.0 if is_bn_leaf(path) else 1.0, params)


def init_momentum(params: Params) -> Params:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd_update(params: Params, grads: Params, momentum_buf: Params,
               lr, cfg: TrainConfig, step=1):
    """torch.optim.SGD(momentum=0.9, dampening=0.9, weight_decay=wd):
      g <- g + wd * p
      buf <- g                      on FIRST use (undamped; torch initializes
                                    the momentum buffer with the raw gradient)
      buf <- m * buf + (1 - d) * g  thereafter
      p <- p - lr * buf.
    ``step`` is the global step counter (0 on the first update); all params
    receive grads every step here, so step==0 is exactly torch's per-param
    first-use.  Golden-tested against a torch.optim.SGD subprocess run
    (tests/fixtures/sgd_golden.npz).  BN stat leaves are carried through
    untouched (their 'grads' are the new running stats from the train-mode
    forward)."""
    mask = trainable_mask(params)
    first = jnp.asarray(step) == 0

    def upd(p, g, buf, m):
        g = g + cfg.wd * p
        new_buf = jnp.where(first, g,
                            cfg.momentum * buf + (1.0 - cfg.dampening) * g)
        new_p = p - lr * new_buf
        return jnp.where(m > 0, new_p, p), jnp.where(m > 0, new_buf, buf)

    flat = jax.tree_util.tree_map(upd, params, grads, momentum_buf, mask)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree_util.tree_map(lambda t: t[1], flat,
                                     is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_buf


def lr_at_step(step, cfg: TrainConfig):
    """Linear decay: lr0 * (1 - step * bs / (n_pairs * epochs))
    (train_AffNet...py:341-352)."""
    span = float(cfg.total_epochs or cfg.epochs)
    frac = step.astype(jnp.float32) * cfg.batch_size / (cfg.n_pairs * span)
    # Clamp: a chunked resume launched past the schedule end (start_epoch +
    # epochs > total_epochs) would otherwise flip SGD into gradient ascent.
    return cfg.lr * jnp.maximum(0.0, 1.0 - frac)


# ---------------------------------------------------------------------------
# Descriptors for training
# ---------------------------------------------------------------------------

def make_descriptor(name: str, desc_params: Optional[Params] = None
                    ) -> Callable[[Array], Array]:
    """Returns patches (N, PS, PS) -> (N, D) descriptors; eval-mode nets
    (weights frozen; gradients flow through to the patches)."""
    if name == "pixels":
        def desc(patches):
            flat = patches.reshape(patches.shape[0], -1)
            mean = jax.lax.stop_gradient(flat.mean(axis=1, keepdims=True))
            return l2norm(flat - mean)
        return desc
    if name == "SIFT":
        from .models.sift import sift_describe
        return lambda patches: sift_describe(patches, patches.shape[-1])
    if name == "HardNet":
        from .models import HardNet
        assert desc_params is not None, "HardNet descriptor needs weights"
        return lambda patches: HardNet(desc_params, patches)
    if name == "TFeat":
        from .models import HardTFeatNet
        assert desc_params is not None
        return lambda patches: HardTFeatNet(desc_params, patches)
    raise ValueError(f"Unknown descriptor {name}")


def apply_loss(name: str, desc_a: Array, desc_p: Array,
               geom_dist=None, desc_n: Optional[Array] = None) -> Array:
    if name == "HardNet":
        return losses.loss_hardnet(desc_a, desc_p)
    if name == "HardNegC":
        return losses.loss_hardnegc(desc_a, desc_p)
    if name == "PosDist":
        return losses.descriptor_dist(desc_a, desc_p)
    if name == "random_sampling":
        assert desc_n is not None, \
            "random_sampling needs triplet batches (TripletDataset)"
        return losses.loss_random_sampling(desc_a, desc_p, desc_n)
    if name == "Geom":
        assert geom_dist is not None
        return geom_dist
    raise ValueError(f"Unknown loss {name}")


# ---------------------------------------------------------------------------
# AffNet training step (train_AffNet...py:189-245)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainState:
    params: Params
    momentum: Params
    step: Array          # int32 scalar

    def tree(self):
        return (self.params, self.momentum, self.step)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.momentum, s.step), None),
    lambda _, t: TrainState(*t))


def make_affnet_train_step(model, descriptor_fn, cfg: TrainConfig):
    """Returns step(state, batch, key) -> (state, metrics).
    batch: (data_a, data_p) pairs or (data_a, data_p, data_n) triplets
    (random_sampling loss); data_*: (N, 64, 64) float in [0, 1]."""
    shared_rot = "Rot" not in cfg.arch
    ps = cfg.patch_size

    def loss_fn(params, batch, key, max_tilt):
        data_a, data_p = batch[0], batch[1]
        data_n = batch[2] if len(batch) > 2 else None
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        crop_a, full_a, rot_a, _ = augmentation.extract_random_laf(
            k1, data_a, math.pi, max_tilt, ps)
        rot_arg = rot_a if shared_rot else math.pi
        crop_p, full_p, _, _ = augmentation.extract_random_laf(
            k2, data_p, rot_arg, max_tilt, ps)

        A_a, np1 = model.apply_with_state(params, crop_a, rng=k3)
        A_p, np2 = model.apply_with_state(np1, crop_p, rng=k4)

        patch_a = augmentation.warp_by_predicted_transform(full_a, A_a, ps)
        patch_p = augmentation.warp_by_predicted_transform(full_p, A_p, ps)
        desc_a = descriptor_fn(patch_a)
        desc_p = descriptor_fn(patch_p)
        desc_n = None
        if data_n is not None:
            # The negative is a different 3D point: its own random rotation.
            crop_n, full_n, _, _ = augmentation.extract_random_laf(
                k5, data_n, math.pi, max_tilt, ps)
            A_n, np2 = model.apply_with_state(np2, crop_n, rng=k6)
            patch_n = augmentation.warp_by_predicted_transform(full_n, A_n,
                                                               ps)
            desc_n = descriptor_fn(patch_n)
        descr_dist = losses.descriptor_dist(desc_a, desc_p)
        loss = apply_loss(cfg.loss, desc_a, desc_p, desc_n=desc_n)
        return loss, (descr_dist, np2)

    def step_fn(state: TrainState, batch, key, max_tilt):
        (loss, (descr_dist, new_params)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key, max_tilt)
        lr = lr_at_step(state.step, cfg)
        params, momentum = sgd_update(state.params, grads, state.momentum,
                                      lr, cfg, step=state.step)
        # Carry the BN running stats computed in the forward pass.
        mask = trainable_mask(params)
        params = jax.tree_util.tree_map(
            lambda m, trained, stats: trained if m > 0 else stats,
            mask, params, new_params)
        return (TrainState(params, momentum, state.step + 1),
                {"loss": loss, "descr_dist": descr_dist, "lr": lr})

    return step_fn


# ---------------------------------------------------------------------------
# Descriptor training step (HardNet-from-scratch; the reference's canonical
# config trains AffNet AGAINST a pretrained HardNet++ whose weights are
# absent from this mount — this step trains the descriptor itself on patch
# pairs so the full parity story needs no substitute.  Harness semantics:
# HardNet arch (HardNet.py:61-101) + loss_HardNet (Losses.py:113-180),
# same torch-exact SGD as the AffNet trainer.
# ---------------------------------------------------------------------------

def make_descriptor_train_step(model, descriptor_fn, cfg: TrainConfig):
    """The MODEL is the descriptor being trained; ``descriptor_fn`` (the
    frozen-descriptor slot of the other trainers) is unused.  batch =
    (data_a, data_p) matching 64x64 views of the same surface point;
    augmentation is a pair-shared dihedral fliprot (the reference's
    TotalDatasetsLoader augmentation, dataset.py:262-286) + center crop."""
    del descriptor_fn
    ps = cfg.patch_size

    def loss_fn(params, batch, key):
        data_a, data_p = batch[0], batch[1]
        k1, k2, k3 = jax.random.split(key, 3)
        a, p = augmentation.fliprot(k1, data_a, data_p)
        h = a.shape[1]
        st = (h - ps) // 2
        crop_a = a[:, st:st + ps, st:st + ps]
        crop_p = p[:, st:st + ps, st:st + ps]
        feats_a, np1 = model.features(params, crop_a, train=True, rng=k2)
        feats_p, np2 = model.features(np1, crop_p, train=True, rng=k3)
        desc_a = l2norm(feats_a)
        desc_p = l2norm(feats_p)
        descr_dist = losses.descriptor_dist(desc_a, desc_p)
        loss = apply_loss(cfg.loss, desc_a, desc_p)
        return loss, (descr_dist, np2)

    def step_fn(state: TrainState, batch, key, max_tilt=None):
        (loss, (descr_dist, new_params)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key)
        lr = lr_at_step(state.step, cfg)
        params, momentum = sgd_update(state.params, grads, state.momentum,
                                      lr, cfg, step=state.step)
        mask = trainable_mask(params)
        params = jax.tree_util.tree_map(
            lambda m, trained, stats: trained if m > 0 else stats,
            mask, params, new_params)
        return (TrainState(params, momentum, state.step + 1),
                {"loss": loss, "descr_dist": descr_dist, "lr": lr})

    return step_fn


# ---------------------------------------------------------------------------
# OriNet training step (train_OriNet...py:229-286)
# ---------------------------------------------------------------------------

def make_orinet_train_step(model, descriptor_fn, cfg: TrainConfig):
    ps = cfg.patch_size

    def loss_fn(params, data_a, data_p, key):
        from .ops.patches import extract_patches_batched
        n, h, w = data_a.shape
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        rot_lafs, inv_rotmat = augmentation.get_random_rotation_lafs(
            k1, n, math.pi)
        scale = 0.9 + 0.3 * jax.random.uniform(k2, (n, 1, 1))
        A = rot_lafs[:, 0:2, 0:2] * scale
        shift_w, shift_h = augmentation.get_random_shifts(k3, n, 2, 2)
        t = jnp.stack([rot_lafs[:, 0, 2] + shift_w / w,
                       rot_lafs[:, 1, 2] + shift_h / h], -1)[..., None]
        rot_lafs = jnp.concatenate([A, t], axis=2)
        data_a_rot = extract_patches_batched(data_a, rot_lafs, ps=h)

        st = (h - ps) // 2
        fin = st + ps
        crop_p = data_p[:, st:fin, st:fin]
        crop_a_rot = data_a_rot[:, st:fin, st:fin]

        out_a_rot, np1 = model.features(params, crop_a_rot, train=True,
                                        rng=k4)
        out_p, np2 = model.features(np1, crop_p, train=True, rng=k5)
        from .laf import rotation_matrix
        R_a = rotation_matrix(jnp.arctan2(out_a_rot[:, 0] + 1e-8,
                                          out_a_rot[:, 1] + 1e-8))
        R_p = rotation_matrix(jnp.arctan2(out_p[:, 0] + 1e-8,
                                          out_p[:, 1] + 1e-8))
        out_p_rot = inv_rotmat @ R_p

        patch_a = augmentation.warp_by_predicted_transform(data_a_rot, R_a, ps)
        patch_p = augmentation.warp_by_predicted_transform(data_p, R_p, ps)
        desc_a = descriptor_fn(patch_a)
        desc_p = descriptor_fn(patch_p)
        descr_dist = losses.descriptor_dist(desc_a, desc_p)
        geom_dist = jnp.mean(jnp.sqrt(
            jnp.sum((R_a - out_p_rot) ** 2, axis=(1, 2)) + 1e-8))
        loss = apply_loss(cfg.loss, desc_a, desc_p, geom_dist)
        return loss, (descr_dist, np2)

    def step_fn(state: TrainState, batch, key, max_tilt=None):
        data_a, data_p = batch
        (loss, (descr_dist, new_params)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, data_a, data_p, key)
        lr = lr_at_step(state.step, cfg)
        params, momentum = sgd_update(state.params, grads, state.momentum,
                                      lr, cfg, step=state.step)
        mask = trainable_mask(params)
        params = jax.tree_util.tree_map(
            lambda m, trained, stats: trained if m > 0 else stats,
            mask, params, new_params)
        return (TrainState(params, momentum, state.step + 1),
                {"loss": loss, "descr_dist": descr_dist, "lr": lr})

    return step_fn


# ---------------------------------------------------------------------------
# Checkpoints ({'epoch','state_dict'} semantics as npz)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params: Params, epoch: int) -> None:
    from .models.convert import _flatten
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    flat["__epoch__"] = np.asarray(epoch)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path: str) -> Tuple[Params, int]:
    from .models.convert import load_params_npz
    data = np.load(path)
    epoch = int(data["__epoch__"]) if "__epoch__" in data.files else 0
    params = load_params_npz(path)
    params.pop("__epoch__", None)
    return params, epoch


# ---------------------------------------------------------------------------
# Training driver
# ---------------------------------------------------------------------------

def train_loop(model, dataset, cfg: TrainConfig, log_dir: str = "./logs",
               desc_params: Optional[Params] = None,
               start_params: Optional[Params] = None, start_epoch: int = 0,
               mesh=None, ori: bool = False, mode: Optional[str] = None,
               eval_fn: Optional[Callable[[Params, int], None]] = None):
    """Epoch loop with per-epoch checkpoints (+ optional graf eval hook).
    If ``mesh`` is given, the step shards the batch over it (see parallel.py)."""
    if cfg.total_epochs is not None \
            and start_epoch + cfg.epochs > cfg.total_epochs:
        raise ValueError(
            f"chunked resume past the LR schedule end: start_epoch "
            f"{start_epoch} + epochs {cfg.epochs} > total_epochs "
            f"{cfg.total_epochs} (the linear decay would clamp to lr=0)")
    if mode is None:
        mode = "orinet" if ori else "affnet"
    if mode == "descriptor":
        # The model itself is the descriptor under training.
        descriptor_fn = None
    else:
        descriptor_fn = make_descriptor(cfg.descriptor, desc_params)
    make_step = {"affnet": make_affnet_train_step,
                 "orinet": make_orinet_train_step,
                 "descriptor": make_descriptor_train_step}[mode]
    step_fn = make_step(model, descriptor_fn, cfg)
    if mesh is not None:
        from .parallel import shard_train_step
        step_fn = shard_train_step(step_fn, mesh)
    else:
        step_fn = jax.jit(step_fn)

    params = start_params if start_params is not None \
        else model.init(jax.random.PRNGKey(cfg.seed))
    # Resume at the global step so the linear LR decay continues where the
    # previous chunk stopped; fold the start epoch into the augmentation
    # stream so resumed chunks do not replay the same random warps.
    start_step = start_epoch * (cfg.n_pairs // cfg.batch_size)
    state = TrainState(params, init_momentum(params),
                       jnp.asarray(start_step, jnp.int32))
    key = jax.random.PRNGKey(cfg.seed + 7919 * start_epoch)

    from .utils import MetricsLogger
    logger = MetricsLogger(os.path.join(log_dir, "metrics.jsonl"))
    global_step = 0
    for epoch in range(start_epoch, start_epoch + cfg.epochs):
        max_tilt = tilt_for_epoch(epoch)
        for i, batch in enumerate(dataset.batches()):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(
                state, tuple(jnp.asarray(x) for x in batch), sub, max_tilt)
            if i % cfg.log_interval == 0:
                print(f"epoch {epoch} step {i} "
                      f"loss {float(metrics['loss']):.4f} "
                      f"descr_dist {float(metrics['descr_dist']):.4f} "
                      f"lr {float(metrics['lr']):.5f}")
                logger.log(global_step, epoch=epoch,
                           loss=metrics["loss"],
                           descr_dist=metrics["descr_dist"],
                           lr=metrics["lr"])
            global_step += 1
        save_checkpoint(os.path.join(log_dir, f"checkpoint_{epoch}.npz"),
                        state.params, epoch + 1)
        if eval_fn is not None:
            eval_fn(state.params, epoch)
    logger.close()
    return state
