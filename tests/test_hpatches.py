"""HPatches benchmark harness tests (data-optional: a tiny synthetic
hpatches-release tree is built in tmp_path)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from affnet_tpu import hpatches as H


def _make_tree(root, n_seqs=2, n_patches=8, seed=0):
    rng = np.random.RandomState(seed)
    names = [f"i_fake{k}" if k % 2 == 0 else f"v_fake{k}"
             for k in range(n_seqs)]
    for name in names:
        d = os.path.join(root, name)
        os.makedirs(d)
        # Distinct smooth patches so 'pixels' descriptors separate well.
        base = rng.uniform(40, 215, (n_patches, 65, 65)).astype(np.float32)
        for i in range(n_patches):
            yy, xx = np.mgrid[0:65, 0:65]
            base[i] = (base[i] * 0.2
                       + 120 + 100 * np.sin(xx / (3 + i) + i)
                       * np.cos(yy / (2 + i)))
        base = np.clip(base, 0, 255)

        def save(arr, fname):
            sheet = arr.reshape(-1, 65).astype(np.uint8)
            Image.fromarray(sheet, mode="L").save(os.path.join(d, fname))

        save(base, "ref.png")
        for diff, amp in (("e", 3.0), ("h", 8.0), ("t", 15.0)):
            warped = np.clip(
                base + rng.normal(0, amp, base.shape), 0, 255)
            save(warped, f"{diff}1.png")
    return names


class TestLoader:
    def test_read_sheet_roundtrip(self, tmp_path):
        _make_tree(str(tmp_path), n_seqs=1)
        seqs = H.load_sequences(str(tmp_path))
        assert len(seqs) == 1
        s = seqs[0]
        assert s.ref.shape == (8, 65, 65)
        assert set(s.warped) == {"e1", "h1", "t1"}
        assert s.kind == "i"

    def test_missing_root_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            H.load_sequences(str(tmp_path / "nope"))


class TestTasks:
    @pytest.fixture()
    def seqs(self, tmp_path):
        _make_tree(str(tmp_path), n_seqs=2)
        return H.load_sequences(str(tmp_path))

    def test_matching_pixels_high_on_easy(self, seqs):
        fn, _ = H.make_descriptor_fn("pixels")
        out = H.task_matching(seqs, fn)
        assert out["map_e"] == 1.0
        assert 0.0 <= out["map_t"] <= 1.0
        assert set(out) >= {"map", "map_e", "map_h", "map_t",
                            "map_kind_i", "map_kind_v"}

    def test_verification_separates(self, seqs):
        fn, _ = H.make_descriptor_fn("pixels")
        out = H.task_verification(seqs, fn, pairs_per_seq=128)
        assert out["auc"] > 0.9
        assert out["fpr95"] < 0.5

    def test_retrieval(self, seqs):
        fn, _ = H.make_descriptor_fn("pixels")
        out = H.task_retrieval(seqs, fn, queries_per_seq=8)
        assert out["pool_size"] == 16
        assert out["top1"] > 0.5
        assert 0.0 < out["mrr"] <= 1.0


class TestCLI:
    def test_skip_when_absent(self, tmp_path, capsys):
        from affnet_tpu.cli.eval_hpatches import main
        rc = main(["--root", str(tmp_path / "absent")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["skipped"] is True

    def test_runs_pixels(self, tmp_path, capsys):
        _make_tree(str(tmp_path))
        from affnet_tpu.cli.eval_hpatches import main
        rc = main(["--root", str(tmp_path), "--descriptor", "pixels",
                   "--tasks", "matching"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["n_sequences"] == 2
        assert "matching" in out

    def test_runs_sift_descriptor(self, tmp_path, capsys):
        # SIFT exercises the on-device descriptor path without weights.
        _make_tree(str(tmp_path), n_seqs=1)
        from affnet_tpu.cli.eval_hpatches import main
        rc = main(["--root", str(tmp_path), "--descriptor", "SIFT",
                   "--tasks", "matching"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["matching"]["map_e"] >= 0.5
