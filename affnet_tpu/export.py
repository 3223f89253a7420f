"""Model export/import: serialized StableHLO with symbolic batch dims.

The reference's deployment story is torch.jit traces (convertJIT/
convert_OriNet_and_AffNet_to_JIT.ipynb -> AffNetJIT.pt / OriNetJIT.pt).  The
TPU-native equivalent is jax.export: the jitted patch-CNN forward (weights
baked in) serialized as portable StableHLO, batch-size polymorphic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_patch_net(net, params, batch: str = "b",
                     platforms=("tpu", "cpu")) -> bytes:
    """Serialize net(params, patches (b, PS, PS)) with a symbolic batch dim,
    lowered for every platform in ``platforms``.  Returns portable StableHLO
    bytes."""
    def fn(patches):
        return net(params, patches)

    shape = jax_export.symbolic_shape(f"({batch}, {net.ps}, {net.ps})")
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    exported = jax_export.export(jax.jit(fn),
                                 platforms=list(platforms))(spec)
    return exported.serialize()


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported net; returns callable(patches) -> output."""
    exported = jax_export.deserialize(blob)
    return lambda patches: exported.call(jnp.asarray(patches))


def export_to_file(net, params, path: str) -> None:
    with open(path, "wb") as f:
        f.write(export_patch_net(net, params))


def load_from_file(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_exported(f.read())
