"""Convert reference torch checkpoints -> weights/*.npz (torch-only process).

torch and jax must not share a process (OpenMP deadlock), so this script is
pure torch/numpy.  It emits the same flat key layout as
affnet_tpu.models.convert.save_params_npz: ``layer{i}/w`` (HWIO), ``layer{i}/b``,
``layer{i}/mean``, ``layer{i}/var`` — with ``i`` = the torch Sequential index.

Run:  python scripts/convert_weights.py
"""

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "weights")


def state_dict_to_flat(sd, prefix_map=None):
    """Infer layer kinds from state_dict keys; convert conv weights to HWIO."""
    flat = {}
    for key, v in sd.items():
        v = v.detach().cpu().numpy().astype(np.float32)
        parts = key.split(".")
        idx, attr = parts[-2], parts[-1]
        scope = ".".join(parts[:-2])            # e.g. 'features', 'classifier'
        if prefix_map:
            if (scope, int(idx)) not in prefix_map:
                continue                    # e.g. HardTFeat's vendored SIFT.*
            i = prefix_map[(scope, int(idx))]
        else:
            i = int(idx)
        name = f"layer{i}"
        if attr == "weight" and v.ndim == 4:
            flat[f"{name}/w"] = np.transpose(v, (2, 3, 1, 0))
        elif attr == "bias":
            flat[f"{name}/b"] = v.reshape(-1)
        elif attr == "running_mean":
            flat[f"{name}/mean"] = v
        elif attr == "running_var":
            flat[f"{name}/var"] = v
        elif attr == "num_batches_tracked":
            pass
        else:
            print(f"  (skipping {key})")
    return flat


def convert(path, out_name, prefix_map=None):
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if isinstance(ckpt, dict) and "state_dict" in ckpt else ckpt
    flat = state_dict_to_flat(sd, prefix_map)
    os.makedirs(OUT, exist_ok=True)
    out = os.path.join(OUT, out_name + ".npz")
    np.savez(out, **flat)
    print(f"{out}: {sorted(flat.keys())}")


def main():
    convert(f"{REF}/pretrained/AffNet.pth", "AffNetFast")
    convert(f"{REF}/pretrained/OriNet.pth", "OriNetFast")
    # HardTFeat: two Sequentials -> flat spec indices 0,3,6.
    convert(f"{REF}/HardTFeat.pth", "HardTFeatNet",
            prefix_map={("features", 0): 0, ("features", 3): 3,
                        ("classifier", 1): 6})


if __name__ == "__main__":
    main()
