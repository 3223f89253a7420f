"""Tests for observability utilities and the HPatches sheet reader."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from affnet_tpu import utils


class TestStageTimer:
    def test_accumulates(self):
        t = utils.StageTimer()
        x = jnp.ones((64, 64))
        for _ in range(3):
            with t.stage("mul", tree=None):
                y = x * 2.0
                utils.fence(y)
        assert t.counts["mul"] == 3
        assert t.totals["mul"] > 0
        assert "mul" in t.report()

    def test_fence_tree(self):
        out = {"a": jnp.ones((4,)), "b": (jnp.zeros((2, 2)),)}
        utils.fence(out)      # must not raise


class TestMetricsLogger:
    def test_jsonl(self, tmp_path):
        path = os.path.join(tmp_path, "m.jsonl")
        log = utils.MetricsLogger(path)
        log.log(0, loss=jnp.asarray(1.5), note="hi")
        log.log(1, loss=0.7)
        log.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["loss"] == 1.5
        assert lines[0]["note"] == "hi"
        assert lines[1]["step"] == 1


class TestDebugNans:
    def test_toggle_restores(self):
        before = jax.config.jax_debug_nans
        with utils.debug_nans(True):
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == before

    def test_catches_nan(self):
        with utils.debug_nans(True):
            with pytest.raises(Exception):
                jnp.log(jnp.asarray(-1.0)) + 0.0  # noqa: B018


class TestHPatchesReader:
    def test_read_patch_file_and_hpatchesdm(self, tmp_path):
        import json as _json
        from PIL import Image
        from affnet_tpu.data import HPatchesDM, read_patch_file
        rng = np.random.RandomState(0)
        # 4 rows x 3 cols of 65px cells; one row blank (skipped).
        sheet = (rng.rand(4 * 65, 3 * 65) * 200 + 20).astype(np.uint8)
        sheet[2 * 65:3 * 65] = 0          # blank row -> dropped
        d = os.path.join(tmp_path, "seq")
        os.makedirs(d)
        Image.fromarray(sheet).convert("RGB").save(os.path.join(d, "a.png"))
        patches, idxs, max_idx = read_patch_file(os.path.join(d, "a.png"))
        assert len(idxs) == 3             # 3 surviving rows
        assert patches.shape[1:] == (65, 65)
        with open(os.path.join(tmp_path, "splits.json"), "w") as f:
            _json.dump({"b": {"train": ["a"], "test": []}}, f)
        ds = HPatchesDM(str(tmp_path), "seq", train=True, n_pairs=8,
                        batch_size=2)
        batches = list(ds.batches())
        assert len(batches) == 4
        a, p = batches[0]
        assert a.shape == (2, 65, 65)
