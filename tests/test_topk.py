"""Exact two-stage top-k: bit-equivalence with lax.top_k in every regime.

The detection top-k (ops/nms.py:masked_topk) claims bit-identical selection
to a full sort, including tie handling at the k boundary — the parity
property the reference's per-level torch.topk cascade
(HandCraftedModules.py:259-263) relies on.  These tests construct the
adversarial inputs: exact ties straddling the k-th position, >M_CAND
keypoints clustered inside one row segment (forcing the on-device full-sort
fallback), and all-padding inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from affnet_tpu.ops import nms
from affnet_tpu.ops.nms import _row_topm, _two_stage_topk
from affnet_tpu.ops.pallas_topk import row_topm_pallas

N_BIG = (1 << 18) + 4096


def _check_equal(v, k):
    """Values must equal lax.top_k exactly; indices must match on every
    POSITIVE entry (zero entries are invalid padding — vals > 0 defines
    validity downstream — and the two paths may pad with different,
    equally-invalid zero positions)."""
    v = jnp.asarray(v)
    vals, idxs = _two_stage_topk(v, k)
    evals, eidxs = jax.lax.top_k(v, k)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    evals, eidxs = np.asarray(evals), np.asarray(eidxs)
    np.testing.assert_array_equal(vals, evals)
    pos = evals > 0
    np.testing.assert_array_equal(idxs[pos], eidxs[pos].astype(np.int32))


def test_two_stage_ties_at_k_boundary():
    """Many entries share the exact k-th value; the winner set must match
    lax.top_k's lowest-index-first tie rule."""
    rng = np.random.RandomState(0)
    v = np.zeros(N_BIG, np.float32)
    strong = rng.choice(N_BIG, 300, replace=False)
    v[strong] = rng.uniform(5.0, 10.0, 300).astype(np.float32)
    tied = rng.choice(np.setdiff1d(np.arange(N_BIG), strong), 400,
                      replace=False)
    v[tied] = 2.5  # exactly equal responses straddling k=500
    _check_equal(v, 500)


def test_two_stage_clustered_row_triggers_fallback():
    """More than M_CAND top-k members inside one 1024-wide row segment ->
    the leftover check must detect it and the fallback must keep the result
    exact."""
    v = np.zeros(N_BIG, np.float32)
    # 64 strong survivors, all within one row (flat positions 2048..2175,
    # spaced 2 apart like NMS survivors).
    pos = 2048 + 2 * np.arange(64)
    v[pos] = np.linspace(100.0, 50.0, 64).astype(np.float32)
    # Weak background so k=100 reaches past the cluster.
    rng = np.random.RandomState(1)
    weak = rng.choice(np.arange(10000, N_BIG), 500, replace=False)
    v[weak] = rng.uniform(0.1, 1.0, 500).astype(np.float32)
    assert 64 > nms.M_CAND  # the construction actually overflows a row
    _check_equal(v, 100)


def test_two_stage_fewer_positives_than_k():
    """Threshold-mode shape: k far exceeds the positive count; zero padding
    must behave exactly like lax.top_k."""
    rng = np.random.RandomState(2)
    v = np.zeros(N_BIG, np.float32)
    idx = rng.choice(N_BIG, 200, replace=False)
    v[idx] = rng.exponential(3.0, 200).astype(np.float32)
    _check_equal(v, 4096)


def test_two_stage_dense_random():
    rng = np.random.RandomState(3)
    v = rng.exponential(1.0, N_BIG).astype(np.float32)
    _check_equal(v, 2000)


def test_row_topm_pallas_matches_xla():
    """Interpret-mode Pallas row-top-m == the XLA extraction, including the
    first-maximum tie rule and the leftover column."""
    rng = np.random.RandomState(4)
    x = rng.exponential(1.0, (300, 1024)).astype(np.float32)
    # Inject exact duplicates inside rows to exercise the tie rule.
    x[5, 100] = x[5, 7] = x[5].max() + 1.0
    x[17, :20] = 9.99
    xj = jnp.asarray(x)
    rv, rc, lo = _row_topm(xj, 8)
    pv, pc, plo = row_topm_pallas(xj, 8)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(pv))
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(pc))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(plo))


def test_masked_topk_small_path_unchanged():
    v = jnp.asarray(np.array([0.0, 3.0, 1.0, 3.0, 0.5], np.float32))
    vals, idxs, valid = nms.masked_topk(v, 3)
    np.testing.assert_array_equal(np.asarray(vals), [3.0, 3.0, 1.0])
    np.testing.assert_array_equal(np.asarray(idxs), [1, 3, 2])
    np.testing.assert_array_equal(np.asarray(valid), [True, True, True])


def test_masked_topk_k_exceeds_candidate_capacity():
    """ADVICE r3: k beyond ceil(n/1024)*16 candidates (e.g. --max-keypoints
    8192 on a mid-size image, n ~ 0.4M) must route to the full sort instead
    of erroring at trace time, and stay identical to lax.top_k."""
    rng = np.random.RandomState(5)
    n = 400_000  # > 1<<18, candidate capacity = ceil(n/1024)*16 = 6256
    v = rng.exponential(1.0, n).astype(np.float32)
    k = 8192
    assert k > (-(-n // nms.ROW_S)) * nms.M_CAND
    vals, idxs, valid = nms.masked_topk(jnp.asarray(v), k)
    rv, ri = jax.lax.top_k(jnp.asarray(v), k)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ri))
