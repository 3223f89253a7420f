"""Training-harness tests: SGD semantics, train step, sharded step, data."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu import data as data_mod
from affnet_tpu.models import AffNetFast, OriNetFast32
from affnet_tpu.parallel import make_mesh, shard_apply, shard_train_step
from affnet_tpu.train import (TrainConfig, TrainState, init_momentum,
                              load_checkpoint, lr_at_step,
                              make_affnet_train_step, make_descriptor,
                              make_orinet_train_step, save_checkpoint,
                              tilt_for_epoch)


def make_batch(n=16, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.rand(n, 64, 64).astype(np.float32)
    p = np.clip(a + rng.randn(n, 64, 64).astype(np.float32) * 0.02, 0, 1)
    return jnp.asarray(a), jnp.asarray(p)


class TestSchedules:
    def test_tilt_curriculum(self):
        # Reference schedule with backward fill (train_AffNet...py:46,200-205).
        assert tilt_for_epoch(0) == 3.0
        assert tilt_for_epoch(2) == 4.0
        assert tilt_for_epoch(4) == 4.5
        assert tilt_for_epoch(9) == 5.8
        assert tilt_for_epoch(100) == 5.8

    def test_linear_lr_decay(self):
        cfg = TrainConfig(lr=0.005, batch_size=100, n_pairs=1000, epochs=1)
        assert float(lr_at_step(jnp.asarray(0), cfg)) == pytest.approx(0.005)
        assert float(lr_at_step(jnp.asarray(5), cfg)) == pytest.approx(0.0025)
        assert float(lr_at_step(jnp.asarray(10), cfg)) == pytest.approx(0.0)


class TestSGD:
    def test_matches_torch_sgd_golden(self, fixtures_dir):
        """3 torch.optim.SGD steps recorded by scripts/make_sgd_golden.py:
        the first step must use the UNDAMPED gradient as the momentum buffer
        (torch first-use semantics), subsequent steps the damped recurrence."""
        from affnet_tpu.train import sgd_update
        gold = np.load(os.path.join(fixtures_dir, "sgd_golden.npz"))
        cfg = TrainConfig(lr=float(gold["lr"]), wd=float(gold["wd"]),
                          momentum=float(gold["momentum"]),
                          dampening=float(gold["dampening"]))
        params = {"layer0": {"w": jnp.asarray(gold["w0"])}}
        target = jnp.asarray(gold["target"])
        buf = init_momentum(params)
        for step in range(gold["params"].shape[0]):
            g = {"layer0": {"w": 2.0 * (params["layer0"]["w"] - target)}}
            params, buf = sgd_update(params, g, buf, cfg.lr, cfg, step=step)
            np.testing.assert_allclose(np.asarray(params["layer0"]["w"]),
                                       gold["params"][step], rtol=1e-5,
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(buf["layer0"]["w"]),
                                       gold["momentum_buffers"][step],
                                       rtol=1e-5, atol=1e-7)

    def test_bn_stats_not_touched_by_sgd(self):
        from affnet_tpu.train import sgd_update
        cfg = TrainConfig()
        params = {"layer1": {"mean": jnp.asarray([5.0]),
                             "var": jnp.asarray([2.0])},
                  "layer0": {"w": jnp.asarray([1.0])}}
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        p1, _ = sgd_update(params, g, init_momentum(params), 0.1, cfg)
        assert float(p1["layer1"]["mean"][0]) == 5.0
        assert float(p1["layer1"]["var"][0]) == 2.0
        assert float(p1["layer0"]["w"][0]) != 1.0


class TestTrainStep:
    def test_affnet_step_reduces_loss(self):
        # PosDist is a plain descent objective (hard-negative losses are not
        # monotonic on noise batches); same batch + same augmentation key =>
        # repeated steps must reduce it.  lr small enough that the torch-style
        # UNDAMPED first momentum step doesn't overshoot.
        cfg = TrainConfig(batch_size=16, n_pairs=100000, epochs=1,
                          descriptor="pixels", loss="PosDist", lr=5e-5)
        step = jax.jit(make_affnet_train_step(
            AffNetFast, make_descriptor("pixels"), cfg))
        params = AffNetFast.init(jax.random.PRNGKey(0))
        state = TrainState(params, init_momentum(params),
                           jnp.asarray(0, jnp.int32))
        batch = make_batch()
        losses = []
        for i in range(6):
            state, m = step(state, batch, jax.random.PRNGKey(42), 3.0)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]    # same batch+key: loss must drop
        # BN stats moved.
        assert not np.allclose(np.asarray(state.params["layer1"]["mean"]),
                               np.asarray(params["layer1"]["mean"]))

    def test_random_sampling_triplet_step(self):
        """--loss random_sampling must be reachable end-to-end: triplet
        batches from TripletDataset through the train step."""
        cfg = TrainConfig(batch_size=8, n_pairs=10000, epochs=1,
                          descriptor="pixels", loss="random_sampling")
        step = jax.jit(make_affnet_train_step(
            AffNetFast, make_descriptor("pixels"), cfg))
        params = AffNetFast.init(jax.random.PRNGKey(0))
        state = TrainState(params, init_momentum(params),
                           jnp.asarray(0, jnp.int32))
        rng = np.random.RandomState(4)
        patches = (rng.rand(80, 64, 64) * 255).astype(np.uint8)
        labels = np.repeat(np.arange(20), 4)
        ds = data_mod.TripletDataset(patches, labels, n_triplets=16,
                                     batch_size=8)
        for batch in ds.batches():
            assert len(batch) == 3
            state, m = step(state, tuple(jnp.asarray(x) for x in batch),
                            jax.random.PRNGKey(0), 3.0)
            assert np.isfinite(float(m["loss"]))

    def test_descriptor_step_reduces_loss(self):
        """HardNet-from-scratch trainer (r4): PosDist on the same batch+key
        must descend; BN stats must move (train-mode forward)."""
        from affnet_tpu.models import HardNet
        from affnet_tpu.train import make_descriptor_train_step

        cfg = TrainConfig(batch_size=16, n_pairs=100000, epochs=1,
                          loss="PosDist", lr=5e-5)
        step = jax.jit(make_descriptor_train_step(HardNet, None, cfg))
        params = HardNet.init(jax.random.PRNGKey(0))
        state = TrainState(params, init_momentum(params),
                           jnp.asarray(0, jnp.int32))
        batch = make_batch()
        losses = []
        for _ in range(6):
            state, m = step(state, batch, jax.random.PRNGKey(42))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert not np.allclose(np.asarray(state.params["layer1"]["mean"]),
                               np.asarray(params["layer1"]["mean"]))

    def test_descriptor_step_hardnet_loss_runs(self):
        from affnet_tpu.models import HardNet
        from affnet_tpu.train import make_descriptor_train_step

        cfg = TrainConfig(batch_size=16, n_pairs=10000, epochs=1,
                          loss="HardNet", lr=0.1)
        step = jax.jit(make_descriptor_train_step(HardNet, None, cfg))
        params = HardNet.init(jax.random.PRNGKey(2))
        state = TrainState(params, init_momentum(params),
                           jnp.asarray(0, jnp.int32))
        state, m = step(state, make_batch(16, 3), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))

    def test_orinet_step_runs(self):
        cfg = TrainConfig(batch_size=8, n_pairs=10000, epochs=1,
                          descriptor="pixels", loss="Geom")
        step = jax.jit(make_orinet_train_step(
            OriNetFast32, make_descriptor("pixels"), cfg))
        params = OriNetFast32.init(jax.random.PRNGKey(1))
        state = TrainState(params, init_momentum(params),
                           jnp.asarray(0, jnp.int32))
        batch = make_batch(8, 1)
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))

    def test_checkpoint_roundtrip(self, tmp_path):
        params = AffNetFast.init(jax.random.PRNGKey(2))
        path = os.path.join(tmp_path, "ckpt.npz")
        save_checkpoint(path, params, epoch=7)
        loaded, epoch = load_checkpoint(path)
        assert epoch == 7
        for k in params:
            for kk in params[k]:
                np.testing.assert_allclose(np.asarray(loaded[k][kk]),
                                           np.asarray(params[k][kk]))


class TestParallel:
    def test_sharded_step_matches_single_device(self):
        """GSPMD must not change semantics: the sharded hardest-in-batch
        loss equals the single-device one."""
        cfg = TrainConfig(batch_size=16, n_pairs=10000, epochs=1,
                          descriptor="pixels", loss="HardNet")
        raw = make_affnet_train_step(AffNetFast, make_descriptor("pixels"),
                                     cfg)
        params = AffNetFast.init(jax.random.PRNGKey(0))
        batch = make_batch()
        state0 = TrainState(params, init_momentum(params),
                            jnp.asarray(0, jnp.int32))
        _, m_single = jax.jit(raw)(state0, batch, jax.random.PRNGKey(7), 3.0)

        mesh = make_mesh(8, devices=jax.devices("cpu"))
        sharded = shard_train_step(raw, mesh)
        state1 = TrainState(params, init_momentum(params),
                            jnp.asarray(0, jnp.int32))
        _, m_shard = sharded(state1, batch, jax.random.PRNGKey(7), 3.0)
        np.testing.assert_allclose(float(m_shard["loss"]),
                                   float(m_single["loss"]), rtol=1e-4)

    def test_sharded_image_pipeline_matches_per_image(self):
        """Bulk extraction over the 8-CPU mesh == per-image single-device
        runs (same valid sets, same LAFs)."""
        from affnet_tpu.detector import (DetectorConfig,
                                         ScaleSpaceAffinePatchExtractor)
        from affnet_tpu.parallel import make_sharded_image_pipeline
        rng = np.random.RandomState(0)
        imgs = (rng.rand(8, 64, 96) * 255).astype(np.float32)
        cfg = DetectorConfig(num_features=32, border=5, mr_size=5.192,
                             num_baum_iters=0, th=None)
        det = ScaleSpaceAffinePatchExtractor(cfg)
        mesh = make_mesh(8, devices=jax.devices("cpu"))
        fn = make_sharded_image_pipeline(det, 64, 96, mesh, do_ori=False,
                                         describe=False)
        out = fn({}, jnp.asarray(imgs))
        for i in (0, 3, 7):
            single = det(imgs[i], params={}, do_ori=False, describe=False,
                         reference_order=False)
            valid = np.asarray(out["valid"][i])
            np.testing.assert_array_equal(valid.sum(), len(single["lafs"]))
            np.testing.assert_allclose(np.asarray(out["lafs"][i])[valid],
                                       single["lafs"], atol=1e-4)

    def test_shard_apply(self):
        mesh = make_mesh(8, devices=jax.devices("cpu"))
        params = AffNetFast.init(jax.random.PRNGKey(0))
        patches = jnp.asarray(np.random.RandomState(0)
                              .rand(32, 32, 32).astype(np.float32))
        apply = shard_apply(AffNetFast, mesh)
        out_sharded = np.asarray(apply(params, patches))
        out_single = np.asarray(AffNetFast(params, patches))
        np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)


class TestData:
    def test_generate_pairs_same_class(self):
        rng = np.random.RandomState(0)
        labels = np.repeat(np.arange(50), 4)
        pairs = data_mod.generate_pairs(labels, 200, 16, rng)
        assert (labels[pairs[:, 0]] == labels[pairs[:, 1]]).all()
        assert (pairs[:, 0] != pairs[:, 1]).all()
        # per-batch-unique classes
        for st in range(0, 200 - 16, 16):
            cls = labels[pairs[st:st + 16, 0]]
            assert len(set(cls.tolist())) == 16

    def test_generate_triplets_semantics(self):
        """anchor/pos share a class, neg differs; per-batch-unique anchor
        classes (reference TripletPhotoTour.generate_pairs)."""
        rng = np.random.RandomState(0)
        labels = np.repeat(np.arange(40), 3)
        tr = data_mod.generate_triplets(labels, 160, 16, rng)
        assert (labels[tr[:, 0]] == labels[tr[:, 1]]).all()
        assert (tr[:, 0] != tr[:, 1]).all()
        assert (labels[tr[:, 0]] != labels[tr[:, 2]]).all()
        for st in range(0, 160 - 16, 16):
            cls = labels[tr[st:st + 16, 0]]
            assert len(set(cls.tolist())) == 16

    def test_pair_dataset_batches(self):
        rng = np.random.RandomState(1)
        patches = (rng.rand(120, 64, 64) * 255).astype(np.uint8)
        labels = np.repeat(np.arange(30), 4)
        ds = data_mod.PairDataset(patches, labels, n_pairs=64, batch_size=16)
        batches = list(ds.batches())
        assert len(batches) == 4
        a, p = batches[0]
        assert a.shape == (16, 64, 64) and a.dtype == np.float32
        assert a.max() <= 1.0

    def test_device_pair_dataset_matches_host(self):
        # DevicePairDataset (r4): batches built on device from the uint8
        # store must match PairDataset's host path (same RNG stream, same
        # gather/fliprot) to 1 ulp — XLA folds the /255 into a reciprocal
        # multiply, numpy divides, so the low bit can differ.
        rng = np.random.RandomState(1)
        patches = (rng.rand(120, 64, 64) * 255).astype(np.uint8)
        labels = np.repeat(np.arange(30), 4)
        host = data_mod.PairDataset(patches, labels, n_pairs=64,
                                    batch_size=16, seed=3)
        dev = data_mod.DevicePairDataset(
            data_mod.PairDataset(patches, labels, n_pairs=64,
                                 batch_size=16, seed=3))
        hb = list(host.batches())
        db = list(dev.batches())
        assert len(hb) == len(db) == 4
        for (ha, hp), (da, dp) in zip(hb, db):
            np.testing.assert_allclose(ha, np.asarray(da), rtol=0, atol=1e-7)
            np.testing.assert_allclose(hp, np.asarray(dp), rtol=0, atol=1e-7)

    def test_synthetic_pairs(self):
        img = (np.random.RandomState(2).rand(400, 400) * 255)
        patches, labels = data_mod.synthetic_pairs_from_image(
            img, n_classes=20, views_per_class=3)
        assert patches.shape == (60, 64, 64)
        assert (np.bincount(labels) == 3).all()

    def test_synthetic_pairs_mesh_warp(self):
        """Round-5 generator knobs (mesh_warp non-planar field, blur_jitter):
        valid output, and the mesh field actually changes the warped views
        while the anchor view (v=0, an unwarped center crop) stays identical
        — the non-planar displacement is pinned to zero at the class center,
        so only the surroundings move (data.py: synthetic_pairs_from_images,
        VERDICT r4 missing #1)."""
        rng = np.random.RandomState(7)
        imgs = [rng.rand(300, 300) * 255, rng.rand(280, 320) * 255]
        flat, fl = data_mod.synthetic_pairs_from_images(
            imgs, n_classes=12, views_per_class=3, seed=5,
            mesh_warp=0.0, blur_jitter=0.0, occlude_prob=0.0)
        warped, wl = data_mod.synthetic_pairs_from_images(
            imgs, n_classes=12, views_per_class=3, seed=5,
            mesh_warp=2.5, blur_jitter=1.2, occlude_prob=0.0)
        assert flat.shape == warped.shape == (36, 64, 64)
        np.testing.assert_array_equal(fl, wl)
        assert (np.bincount(wl) == 3).all()
        # The first patch (class 0's anchor, an unwarped center crop drawn
        # before any extra mesh/blur RNG consumption) is untouched: both
        # knobs apply only to v>0 warped views.
        np.testing.assert_array_equal(flat[0], warped[0])
        # The warped views must differ (the field has up to 2.5 px
        # amplitude away from the pinned center).
        diff = np.abs(flat[1].astype(int) - warped[1].astype(int))
        assert diff.max() > 5

    def test_gen_classes_views_cli_knobs(self):
        """--gen-classes/--gen-views (round-5 anchor-diversity lever) reach
        the generator through make_dataset: class count and views-per-class
        drive the synthetic dataset size."""
        from affnet_tpu.cli.train_affnet import build_parser, make_dataset
        args = build_parser().parse_args(
            ["--synthetic", "--n-pairs", "32", "--batch-size", "8",
             "--gen-classes", "16", "--gen-views", "3", "--host-data"])
        ds = make_dataset(args)
        assert ds.patches.shape == (48, 64, 64)
        assert (np.bincount(ds.labels) == 3).all()

    def test_phototour_sheet_reader(self, tmp_path):
        """Synthesize a tiny Brown-format dataset: one bmp sheet + info.txt."""
        from PIL import Image
        rng = np.random.RandomState(3)
        sheet = (rng.rand(1024, 1024) * 255).astype(np.uint8)
        d = os.path.join(tmp_path, "mini")
        os.makedirs(d)
        Image.fromarray(sheet).save(os.path.join(d, "patches0000.bmp"))
        n = 40
        labels = np.repeat(np.arange(20), 2)
        np.savetxt(os.path.join(d, "info.txt"),
                   np.stack([labels, np.zeros_like(labels)], 1), fmt="%d")
        patches, labs = data_mod.read_phototour_dir(d)
        assert patches.shape == (40, 64, 64)
        np.testing.assert_array_equal(labs, labels)
        np.testing.assert_array_equal(patches[1], sheet[0:64, 64:128])


def test_chunked_resume_lr_schedule_continuity():
    """Splitting a run into resumed chunks must continue the global linear
    LR decay: lr at (chunk start_epoch e, step 0) == lr of the unsplit run
    at global step e * steps_per_epoch (TrainConfig.total_epochs +
    train_loop's start_step)."""
    import jax.numpy as jnp
    from affnet_tpu.train import TrainConfig, lr_at_step

    full = TrainConfig(lr=0.005, batch_size=1024, n_pairs=500000, epochs=20)
    chunk = TrainConfig(lr=0.005, batch_size=1024, n_pairs=500000, epochs=4,
                        total_epochs=20)
    steps_per_epoch = full.n_pairs // full.batch_size
    for e0 in (0, 7, 16):
        gstep = jnp.asarray(e0 * steps_per_epoch)
        np.testing.assert_allclose(float(lr_at_step(gstep, chunk)),
                                   float(lr_at_step(gstep, full)), rtol=1e-6)
    # Without total_epochs a 4-epoch config would decay 5x too fast.
    alone = TrainConfig(lr=0.005, batch_size=1024, n_pairs=500000, epochs=4)
    g = jnp.asarray(2 * steps_per_epoch)
    assert float(lr_at_step(g, alone)) < float(lr_at_step(g, chunk))


def test_train_loop_resume_starts_at_global_step(tmp_path):
    """train_loop with start_epoch resumes the step counter (and hence the
    LR) at the global position, and varies the augmentation RNG stream."""
    import jax
    import jax.numpy as jnp
    from affnet_tpu.models import AffNetFast
    from affnet_tpu.train import TrainConfig, train_loop

    class TinyData:
        def batches(self):
            rng = np.random.RandomState(0)
            for _ in range(2):
                yield (rng.rand(8, 64, 64).astype(np.float32),
                       rng.rand(8, 64, 64).astype(np.float32))

    cfg = TrainConfig(batch_size=8, n_pairs=16, epochs=1, total_epochs=10,
                      descriptor="pixels", loss="PosDist", log_interval=100)
    state = train_loop(AffNetFast, TinyData(), cfg,
                       log_dir=str(tmp_path), start_epoch=3)
    # 3 epochs x (16/8) steps skipped + 2 executed.
    assert int(state.step) == 3 * 2 + 2
