"""Weight conversion: reference torch checkpoints -> our param pytrees.

The reference ships ``pretrained/AffNet.pth`` and ``pretrained/OriNet.pth``
as ``{'epoch', 'state_dict'}`` (train_AffNet_test_on_graffity.py:244-245,
loaded at examples/hesaffnet/hesaffnet.py:45-46).  Because our layer specs
mirror the torch ``nn.Sequential`` indices, conversion is a mechanical walk:
``features.{i}.weight`` (OIHW) -> ``layer{i}.w`` (HWIO), BN running stats map
straight across.

Converted weights are cached as flat ``.npz`` files so inference never needs
torch.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .cnn import BN, Conv, Params, Spec


def torch_state_dict_to_params(spec: Spec, sd: Dict[str, Any],
                               prefix: str = "features",
                               index_map: Optional[Dict[int, str]] = None) -> Params:
    """Build a param pytree from a torch state_dict (tensors or ndarrays).

    ``index_map`` optionally overrides the torch key prefix for a given spec
    index (e.g. HardTFeatNet splits features/classifier Sequentials)."""
    def get(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params: Params = {}
    for i, layer in enumerate(spec):
        base = index_map.get(i, f"{prefix}.{i}") if index_map else f"{prefix}.{i}"
        if isinstance(layer, Conv):
            w = get(f"{base}.weight")                     # OIHW
            p = {"w": np.transpose(w, (2, 3, 1, 0))}      # HWIO
            if layer.bias:
                p["b"] = get(f"{base}.bias").reshape(-1)
            params[f"layer{i}"] = p
        elif isinstance(layer, BN):
            params[f"layer{i}"] = {
                "mean": get(f"{base}.running_mean"),
                "var": get(f"{base}.running_var"),
            }
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth; unwraps the {'epoch','state_dict'} convention."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt["state_dict"] if isinstance(ckpt, dict) and "state_dict" in ckpt \
        else ckpt


def convert_pth(path: str, spec: Spec, prefix: str = "features",
                index_map=None) -> Params:
    return torch_state_dict_to_params(spec, load_torch_checkpoint(path),
                                      prefix=prefix, index_map=index_map)


# HardTFeatNet keeps two Sequentials (HardNet.py:37-47); flat-spec index map:
HARDTFEAT_INDEX_MAP = {
    0: "features.0", 3: "features.3", 6: "classifier.1",
}


# --- flat npz (de)serialization ---------------------------------------------

def _flatten(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params_npz(params: Params, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params_npz(path: str) -> Params:
    import jax.numpy as jnp
    data = np.load(path)
    params: Params = {}
    for key in data.files:
        parts = key.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(data[key])
    return params


DEFAULT_WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                                   "weights")


def load_pretrained(name: str, weights_dir: Optional[str] = None) -> Params:
    """Load a converted pretrained net by name (e.g. 'AffNetFast', 'OriNetFast')."""
    d = weights_dir or os.environ.get("AFFNET_TPU_WEIGHTS", DEFAULT_WEIGHTS_DIR)
    return load_params_npz(os.path.join(d, f"{name}.npz"))
