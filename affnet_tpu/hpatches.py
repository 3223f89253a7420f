"""HPatches full-benchmark harness (verification / matching / retrieval).

The reference ships only the ``HPatchesDM`` pair *dataset* (dataset.py:96-192,
covered by :class:`affnet_tpu.data.HPatchesDM`); this module adds the standard
public benchmark built on the same data — the three HPatches tasks of
"HPatches: A benchmark and evaluation of handcrafted and learned local
descriptors" (Balntas et al., CVPR 2017):

  - **verification**: classify patch pairs as same/different physical point;
    metric = ROC AUC and FPR at 95% recall over balanced pos/neg pairs.
  - **matching**: for each (ref, warped) sheet pair, nearest-neighbour match
    ref descriptors against the warped sheet; metric = fraction of correct
    first matches (the sheets are index-aligned), split by difficulty
    (e=easy, h=hard, t=tough) and by sequence kind (i_=illumination,
    v_=viewpoint).
  - **retrieval**: each warped patch queries a pool of all reference patches
    (its own sequence's + distractors from every other sequence); metric =
    top-1 accuracy and mean reciprocal rank.

Data-optional by design (this environment has no network): point ``root`` at
a local ``hpatches-release`` tree (one directory per sequence containing
``ref.png`` and ``e1..e5 / h1..h5 / t1..t5 .png`` patch sheets, 65x65 patches
stacked vertically).  When the tree is absent the CLI prints a clear skip
message and exits 0, so run_me.sh can always invoke it.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PATCH = 65


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def read_sheet(fname: str, patch: int = PATCH) -> np.ndarray:
    """Read one hpatches-release sheet: (N*patch, patch) greyscale PNG
    stacked vertically -> (N, patch, patch) float32.  (The DM-format grid
    sheets are handled by data.read_patch_file; release sheets are a single
    column and carry no blank cells.)"""
    from PIL import Image
    img = Image.open(fname)
    if img.mode != "L":
        img = img.convert("L")
    arr = np.asarray(img, np.float32)
    h, w = arr.shape
    if h % patch != 0 or w != patch:
        raise ValueError(f"{fname}: unexpected sheet shape {arr.shape}")
    return arr.reshape(h // patch, patch, patch)


@dataclasses.dataclass
class Sequence:
    name: str
    ref: np.ndarray                      # (N, 65, 65)
    warped: Dict[str, np.ndarray]        # "e1".."t5" -> (N, 65, 65)

    @property
    def kind(self) -> str:
        return "v" if self.name.startswith("v_") else "i"


def load_sequences(root: str, max_seqs: Optional[int] = None,
                   difficulties: Sequence[str] = ("e", "h", "t")
                   ) -> List[Sequence]:
    """Load hpatches-release sequences; raises FileNotFoundError if the
    tree is absent (callers decide whether that is a skip or an error)."""
    if not os.path.isdir(root):
        raise FileNotFoundError(root)
    seqs = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if not os.path.isdir(d) or not os.path.exists(
                os.path.join(d, "ref.png")):
            continue
        ref = read_sheet(os.path.join(d, "ref.png"))
        warped = {}
        for diff in difficulties:
            for i in range(1, 6):
                f = os.path.join(d, f"{diff}{i}.png")
                if os.path.exists(f):
                    w = read_sheet(f)
                    if len(w) == len(ref):
                        warped[f"{diff}{i}"] = w
        if warped:
            seqs.append(Sequence(name, ref, warped))
        if max_seqs is not None and len(seqs) >= max_seqs:
            break
    if not seqs:
        raise FileNotFoundError(f"no sequences under {root}")
    return seqs


# ---------------------------------------------------------------------------
# Descriptor runners
# ---------------------------------------------------------------------------

def _resize_batch(patches: np.ndarray, ps: int) -> np.ndarray:
    """Area-ish resize 65->ps via PIL (host side, matches the reference's
    cv2.resize usage for patch preprocessing)."""
    from PIL import Image
    if patches.shape[1] == ps:
        return patches.astype(np.float32)
    out = np.empty((len(patches), ps, ps), np.float32)
    for i, p in enumerate(patches):
        out[i] = np.asarray(Image.fromarray(p.astype(np.uint8)).resize(
            (ps, ps), Image.BILINEAR), np.float32)
    return out


def make_descriptor_fn(descriptor: str = "TFeat",
                       weights: Optional[str] = None,
                       device_batch: int = 2048):
    """Returns (fn, ps): fn maps (N, 65, 65) uint8/float -> (N, D) unit
    descriptors.  ``pixels`` is the net-free baseline (mean/std-normalized
    flattened patch), used by tests and as the sanity floor."""
    if descriptor == "pixels":
        def fn(patches: np.ndarray) -> np.ndarray:
            x = _resize_batch(patches, 16).reshape(len(patches), -1)
            x = x - x.mean(axis=1, keepdims=True)
            n = np.linalg.norm(x, axis=1, keepdims=True) + 1e-8
            return x / n
        return fn, 16

    import jax.numpy as jnp
    from .models import REGISTRY, SIFTNet
    from .models.convert import load_pretrained, load_params_npz

    if descriptor == "SIFT":
        net = SIFTNet()          # ps=65: native sheet size, no resize
        params = {}
    else:
        name = "HardTFeatNet" if descriptor == "TFeat" else descriptor
        net = REGISTRY[name]
        params = (load_params_npz(weights) if weights
                  else load_pretrained(name))

    def fn(patches: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(patches), device_batch):
            x = jnp.asarray(_resize_batch(patches[i:i + device_batch],
                                          net.ps))
            outs.append(np.asarray(net(params, x), np.float32))
        out = np.concatenate(outs)
        n = np.linalg.norm(out, axis=1, keepdims=True) + 1e-8
        return out / n

    return fn, net.ps


# ---------------------------------------------------------------------------
# Tasks
# ---------------------------------------------------------------------------

def _auc(pos: np.ndarray, neg: np.ndarray) -> float:
    """ROC AUC for distances (smaller = same) via the rank statistic."""
    scores = np.concatenate([-pos, -neg])
    labels = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    # midranks for ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1
        i = j + 1
    n_pos, n_neg = len(pos), len(neg)
    return float((ranks[labels == 1].sum()
                  - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _fpr_at_recall(pos: np.ndarray, neg: np.ndarray,
                   recall: float = 0.95) -> float:
    th = np.quantile(pos, recall)
    return float((neg <= th).mean())


def task_verification(seqs: List[Sequence], desc_fn, rng_seed: int = 0,
                      pairs_per_seq: int = 512) -> Dict[str, float]:
    rng = np.random.RandomState(rng_seed)
    pos_d, neg_d = [], []
    descs = {s.name: {k: desc_fn(v) for k, v in
                      dict(ref=s.ref, **s.warped).items()} for s in seqs}
    for s in seqs:
        d = descs[s.name]
        n = len(s.ref)
        keys = [k for k in d if k != "ref"]
        for _ in range(pairs_per_seq):
            k = keys[rng.randint(len(keys))]
            i = rng.randint(n)
            pos_d.append(np.linalg.norm(d["ref"][i] - d[k][i]))
            # negative: same sheet pair, different index (the standard
            # 'intra-sequence' negatives, the harder protocol)
            j = (i + 1 + rng.randint(n - 1)) % n
            neg_d.append(np.linalg.norm(d["ref"][i] - d[k][j]))
    pos, neg = np.array(pos_d), np.array(neg_d)
    return {"auc": _auc(pos, neg),
            "fpr95": _fpr_at_recall(pos, neg, 0.95),
            "n_pairs": int(len(pos))}


def task_matching(seqs: List[Sequence], desc_fn) -> Dict[str, float]:
    by_diff: Dict[str, List[float]] = {}
    by_kind: Dict[str, List[float]] = {}
    for s in seqs:
        dref = desc_fn(s.ref)
        for k, sheet in s.warped.items():
            dw = desc_fn(sheet)
            # NN match ref -> warped; correct iff index-aligned.
            sim = dref @ dw.T
            acc = float((np.argmax(sim, axis=1)
                         == np.arange(len(dref))).mean())
            by_diff.setdefault(k[0], []).append(acc)
            by_kind.setdefault(s.kind, []).append(acc)
    out = {f"map_{d}": float(np.mean(v)) for d, v in sorted(by_diff.items())}
    out.update({f"map_kind_{k}": float(np.mean(v))
                for k, v in sorted(by_kind.items())})
    out["map"] = float(np.mean(sum(by_diff.values(), [])))
    return out


def task_retrieval(seqs: List[Sequence], desc_fn, rng_seed: int = 0,
                   queries_per_seq: int = 64) -> Dict[str, float]:
    rng = np.random.RandomState(rng_seed)
    ref_descs = [desc_fn(s.ref) for s in seqs]
    pool = np.concatenate(ref_descs)
    offsets = np.cumsum([0] + [len(d) for d in ref_descs[:-1]])
    top1, rr = [], []
    for si, s in enumerate(seqs):
        keys = sorted(s.warped)
        n = len(s.ref)
        qidx = rng.randint(0, n, size=min(queries_per_seq, n))
        for k in keys[:1] + keys[-1:]:    # one easy + one tough sheet
            dq = desc_fn(s.warped[k][qidx])
            sim = dq @ pool.T             # (Q, pool)
            true = offsets[si] + qidx
            order = np.argsort(-sim, axis=1)
            rank = np.argmax(order == true[:, None], axis=1) + 1
            top1.extend((rank == 1).tolist())
            rr.extend((1.0 / rank).tolist())
    return {"top1": float(np.mean(top1)), "mrr": float(np.mean(rr)),
            "pool_size": int(len(pool)), "n_queries": int(len(top1))}


def run_benchmark(root: str, descriptor: str = "TFeat",
                  weights: Optional[str] = None,
                  max_seqs: Optional[int] = None,
                  tasks: Sequence[str] = ("verification", "matching",
                                          "retrieval")) -> Dict[str, Dict]:
    seqs = load_sequences(root, max_seqs=max_seqs)
    desc_fn, _ = make_descriptor_fn(descriptor, weights)
    # Cache descriptors per (seq, sheet) across tasks via memoization.
    cache: Dict[int, np.ndarray] = {}

    def cached(patches: np.ndarray) -> np.ndarray:
        key = id(patches)
        if key not in cache:
            cache[key] = desc_fn(patches)
        return cache[key]

    out: Dict[str, Dict] = {"n_sequences": len(seqs),
                            "descriptor": descriptor}
    if "verification" in tasks:
        out["verification"] = task_verification(seqs, cached)
    if "matching" in tasks:
        out["matching"] = task_matching(seqs, cached)
    if "retrieval" in tasks:
        out["retrieval"] = task_retrieval(seqs, cached)
    return out
