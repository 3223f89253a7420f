"""Model zoo: the learned patch CNNs of the reference, as functional JAX nets.

Coverage (reference: architectures.py, HardNet.py):
  - AffNetFast (shipped AffNet.pth)                 architectures.py:204-252
  - AffNetFast4 / 4Rot / 4RotNosc                   :152-201, 416-465, 467-517
  - AffNetFastScale                                 :519-568
  - AffNetFast52RotUp / 52Rot / 52RotL / 5Rot       :254-414, 676-727
  - AffNetFast2Par                                  :570-627
  - AffNetFastBias                                  :729-782
  - AffNetFastFullConv (dense)                      :629-674  (see dense.py)
  - OriNetFast (shipped OriNet.pth)                 :33-82
  - YiNet + GHH                                     :84-151   (see yinet.py)
  - HardNet / HardTFeatNet                          HardNet.py:30-101

Every spec's layer indices equal the torch ``nn.Sequential`` indices, so
``state_dict`` conversion is mechanical (models/convert.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .cnn import (BN, ELU, AvgPoolGlobal, Conv, Dropout, MaxPool, Params,
                  ReLU, Spec, Tanh, apply_spec, as_nhwc, init_params,
                  input_norm, l2norm)
from ..laf import rectify_up_is_up, rotation_matrix

Array = jax.Array


def _trunk(with_bn6: bool, out_dim: int, tail: Sequence) -> Spec:
    """The shared AffNet/OriNet conv trunk: 1->16->16->32/2->32->64/2->64."""
    layers = [
        Conv(1, 16, 3, 1, 1), BN(16), ReLU(),
        Conv(16, 16, 3, 1, 1), BN(16), ReLU(),
        Conv(16, 32, 3, 2, 1), BN(32), ReLU(),
        Conv(32, 32, 3, 1, 1), BN(32), ReLU(),
        Conv(32, 64, 3, 2, 1), BN(64), ReLU(),
        Conv(64, 64, 3, 1, 1),
    ]
    if with_bn6:
        layers += [BN(64), ReLU()]
    else:
        layers += [ReLU()]
    layers += [Dropout(0.25), Conv(64, out_dim, 8, 1, 0, bias=True)]
    layers += list(tail)
    return tuple(layers)


# --- output heads: (N, K) features -> (N, 2, 2) affine ----------------------

def _head_affnetfast(x: Array) -> Array:
    """[[1+x0, 0], [x1, 1+x2]] rectified up-is-up (architectures.py:248-252)."""
    a11 = 1.0 + x[:, 0]
    a21 = x[:, 1]
    a22 = 1.0 + x[:, 2]
    zero = jnp.zeros_like(a11)
    A = jnp.stack([jnp.stack([a11, zero], -1),
                   jnp.stack([a21, a22], -1)], -2)
    return rectify_up_is_up(A)


def _head_raw2x2_rectify(x: Array) -> Array:
    return rectify_up_is_up(x.reshape(-1, 2, 2))


def _head_raw2x2(x: Array) -> Array:
    return x.reshape(-1, 2, 2)


def _head_nosc(x: Array) -> Array:
    A = x.reshape(-1, 2, 2)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 1, 0] * A[:, 0, 1]
    scale = jnp.sqrt(jnp.abs(det + 1e-10))
    return A / (scale[:, None, None] + 1e-8)


def _head_scale(x: Array) -> Array:
    a11 = 1.0 + x[:, 0]
    a21 = x[:, 1]
    a22 = 1.0 + x[:, 2]
    zero = jnp.zeros_like(a11)
    A = jnp.stack([jnp.stack([a11, zero], -1),
                   jnp.stack([a21, a22], -1)], -2)
    return jnp.exp(x[:, 3])[:, None, None] * rectify_up_is_up(A)


def _sym_from_3(x: Array) -> Array:
    """[[x0, x1], [x1, x2]] from columns 0:3."""
    return jnp.stack([jnp.stack([x[:, 0], x[:, 1]], -1),
                      jnp.stack([x[:, 1], x[:, 2]], -1)], -2)


def _head_52rotup(x: Array) -> Array:
    rot = rotation_matrix(jnp.arctan2(x[:, 3], x[:, 4] + 1e-8))
    return rot @ rectify_up_is_up(_sym_from_3(x))


def _head_52rot(x: Array) -> Array:
    rot = rotation_matrix(jnp.arctan2(x[:, 3], x[:, 4] + 1e-8))
    return rot @ _sym_from_3(x)


def _head_5rot(x: Array) -> Array:
    rot = rotation_matrix(jnp.arctan2(x[:, 3], x[:, 4] + 1e-8))
    zero = jnp.zeros_like(x[:, 0])
    A = jnp.stack([jnp.stack([x[:, 0], zero], -1),
                   jnp.stack([x[:, 1], x[:, 2]], -1)], -2)
    return rot @ A


def _head_2par(x: Array) -> Array:
    rot = rotation_matrix(jnp.arctan2(x[:, 1], x[:, 2] + 1e-8))
    tilt = jnp.exp(1.8 * jnp.tanh(x[:, 0]))
    st = jnp.sqrt(tilt)
    zero = jnp.zeros_like(st)
    T = jnp.stack([jnp.stack([st, zero], -1),
                   jnp.stack([zero, 1.0 / st], -1)], -2)
    return rectify_up_is_up(rot @ T)


def _head_bias(x: Array) -> Array:
    zero = jnp.zeros_like(x[:, 0])
    A = jnp.stack([jnp.stack([x[:, 0], zero], -1),
                   jnp.stack([x[:, 1], x[:, 2]], -1)], -2)
    return rectify_up_is_up(A)


# ---------------------------------------------------------------------------
# PatchNet: a spec + head bundled with init/apply
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PatchNet:
    name: str
    spec: Spec
    ps: int
    head: Optional[Callable[[Array], Array]] = None
    detach_input_norm: bool = True
    init_gain: float = 0.8
    last_gain: float = 1.0
    last_bias: Optional[Sequence[float]] = None
    compute_dtype: Optional[Any] = None     # e.g. jnp.bfloat16 for MXU speed

    def with_dtype(self, dtype) -> "PatchNet":
        """Same net with conv inputs cast to ``dtype`` (f32 accumulation)."""
        return dataclasses.replace(self, compute_dtype=dtype)

    def init(self, key) -> Params:
        return init_params(key, self.spec, gain=self.init_gain,
                           last_gain=self.last_gain, last_bias=self.last_bias)

    def features(self, params: Params, patches: Array, *,
                 train: bool = False, rng=None):
        x = as_nhwc(patches)
        x = input_norm(x, detach=self.detach_input_norm)
        feats, new_params = apply_spec(self.spec, params, x,
                                       train=train, rng=rng,
                                       compute_dtype=self.compute_dtype)
        # Eval with a compute_dtype runs the activation chain in that dtype;
        # heads (rectify/atan2/L2-norm) always get f32 features.
        feats = feats.astype(jnp.float32)
        return feats.reshape(feats.shape[0], -1), new_params

    def __call__(self, params: Params, patches: Array, *,
                 train: bool = False, rng=None) -> Array:
        feats, _ = self.features(params, patches, train=train, rng=rng)
        return self.head(feats) if self.head is not None else feats

    def apply_with_state(self, params, patches, *, rng=None):
        """Train-mode forward returning (output, params-with-new-BN-stats)."""
        feats, new_params = self.features(params, patches, train=True, rng=rng)
        out = self.head(feats) if self.head is not None else feats
        return out, new_params


# --- AffNet family -----------------------------------------------------------

AffNetFast = PatchNet(
    "AffNetFast", _trunk(True, 3, [Tanh(), AvgPoolGlobal()]), 32,
    _head_affnetfast)

AffNetFast4 = PatchNet(
    "AffNetFast4", _trunk(False, 4, [AvgPoolGlobal()]), 32,
    _head_raw2x2_rectify, last_bias=(1, 0, 0, 1))

AffNetFastScale = PatchNet(
    "AffNetFastScale", _trunk(True, 4, [Tanh(), AvgPoolGlobal()]), 32,
    _head_scale)

AffNetFast4Rot = PatchNet(
    "AffNetFast4Rot", _trunk(False, 4, [AvgPoolGlobal(), Tanh()]), 32,
    _head_raw2x2, last_bias=(0.8, 0, 0, 0.8))

AffNetFast4RotNosc = PatchNet(
    "AffNetFast4RotNosc", _trunk(False, 4, [AvgPoolGlobal()]), 32,
    _head_nosc, last_bias=(1, 0, 0, 1))

AffNetFast52RotUp = PatchNet(
    "AffNetFast52RotUp", _trunk(False, 5, [AvgPoolGlobal()]), 32,
    _head_52rotup, last_bias=(1, 0, 1, 0, 1))

AffNetFast52Rot = PatchNet(
    "AffNetFast52Rot", _trunk(False, 5, [AvgPoolGlobal(), Tanh()]), 32,
    _head_52rot, last_bias=(0.8, 0, 0.8, 0, 1))

AffNetFast52RotL = PatchNet(
    "AffNetFast52RotL", _trunk(False, 5, [AvgPoolGlobal()]), 32,
    _head_52rot, last_bias=(0.8, 0, 0.8, 0, 1))

AffNetFast5Rot = PatchNet(
    "AffNetFast5Rot", _trunk(False, 5, [AvgPoolGlobal()]), 32,
    _head_5rot, last_bias=(1, 0, 1, 0, 1))

AffNetFast2Par = PatchNet(
    "AffNetFast2Par", _trunk(False, 3, [AvgPoolGlobal()]), 32,
    _head_2par, last_bias=(0, 0, 1))

AffNetFastBias = PatchNet(
    "AffNetFastBias", _trunk(True, 3, [Tanh(), AvgPoolGlobal()]), 32,
    _head_bias, last_bias=(0.8, 0, 0.8))


# --- OriNetFast --------------------------------------------------------------

def _orinet_spec(ps: int) -> Spec:
    layers = [
        Conv(1, 16, 3, 1, 1), BN(16), ReLU(),
        Conv(16, 16, 3, 1, 1), BN(16), ReLU(),
        Conv(16, 32, 3, 2, 1), BN(32), ReLU(),
        Conv(32, 32, 3, 1, 1), BN(32), ReLU(),
        Conv(32, 64, 3, 2, 1), BN(64), ReLU(),
        Conv(64, 64, 3, 1, 1), BN(64), ReLU(),
        Dropout(0.25), Conv(64, 2, ps // 4, 1, 1, bias=True),
        Tanh(), AvgPoolGlobal(),
    ]
    return tuple(layers)


@dataclasses.dataclass(frozen=True)
class OriNet(PatchNet):
    def angle(self, params: Params, patches: Array, *, train=False, rng=None):
        xy, _ = self.features(params, patches, train=train, rng=rng)
        return jnp.arctan2(xy[:, 0] + 1e-8, xy[:, 1] + 1e-8)

    def __call__(self, params, patches, *, train=False, rng=None,
                 return_rot_matrix: bool = True):
        a = self.angle(params, patches, train=train, rng=rng)
        return rotation_matrix(a) if return_rot_matrix else a


OriNetFast = OriNet("OriNetFast", _orinet_spec(16), 16,
                    detach_input_norm=False, init_gain=0.9)
OriNetFast32 = OriNet("OriNetFast32", _orinet_spec(32), 32,
                      detach_input_norm=False, init_gain=0.9)


# --- HardNet descriptor family ----------------------------------------------

_HARDNET_SPEC: Spec = (
    Conv(1, 32, 3, 1, 1), BN(32), ReLU(),
    Conv(32, 32, 3, 1, 1), BN(32), ReLU(),
    Conv(32, 64, 3, 2, 1), BN(64), ReLU(),
    Conv(64, 64, 3, 1, 1), BN(64), ReLU(),
    Conv(64, 128, 3, 2, 1), BN(128), ReLU(),
    Conv(128, 128, 3, 1, 1), BN(128), ReLU(),
    Dropout(0.1), Conv(128, 128, 8, 1, 0), BN(128),
)


@dataclasses.dataclass(frozen=True)
class Descriptor(PatchNet):
    def __call__(self, params, patches, *, train=False, rng=None):
        feats, _ = self.features(params, patches, train=train, rng=rng)
        return l2norm(feats)


HardNet = Descriptor("HardNet", _HARDNET_SPEC, 32)

_HARDTFEAT_SPEC: Spec = (
    Conv(1, 32, 7, 1, 0, bias=True), Tanh(), MaxPool(2, 2),
    Conv(32, 64, 6, 1, 0, bias=True), Tanh(),
    Dropout(0.1), Conv(64, 128, 8, 1, 0, bias=True), Tanh(),
)

HardTFeatNet = Descriptor("HardTFeatNet", _HARDTFEAT_SPEC, 32,
                          detach_input_norm=False)

# Narrow ELU variant (examples/hesaffnet/HardNet.py:30-71).  Its committed
# forward skips input_norm and the classifier head: features + global avg
# pool, 64-d, unnormalized.
_HARDNET_NAR_ELU_SPEC: Spec = (
    Conv(1, 16, 3, 1, 1, bias=True), ELU(),
    Conv(16, 16, 3, 1, 1, bias=True), ELU(),
    Conv(16, 32, 3, 2, 1, bias=True), ELU(),
    Conv(32, 32, 3, 1, 1, bias=True), ELU(),
    Conv(32, 64, 3, 2, 1, bias=True), ELU(),
    Conv(64, 64, 3, 1, 1, bias=True), ELU(),
    AvgPoolGlobal(),
)


@dataclasses.dataclass(frozen=True)
class _HardNetNarELU(PatchNet):
    def features(self, params, patches, *, train=False, rng=None):
        x = as_nhwc(patches)            # NB: no input_norm in the reference
        feats, new_params = apply_spec(self.spec, params, x,
                                       train=train, rng=rng)
        return feats.reshape(feats.shape[0], -1), new_params

    def __call__(self, params, patches, *, train=False, rng=None):
        feats, _ = self.features(params, patches, train=train, rng=rng)
        return feats


HardNetNarELU = _HardNetNarELU("HardNetNarELU", _HARDNET_NAR_ELU_SPEC, 32)


REGISTRY: Dict[str, PatchNet] = {
    net.name: net for net in [
        AffNetFast, AffNetFast4, AffNetFastScale, AffNetFast4Rot,
        AffNetFast4RotNosc, AffNetFast52RotUp, AffNetFast52Rot,
        AffNetFast52RotL, AffNetFast5Rot, AffNetFast2Par, AffNetFastBias,
        OriNetFast, OriNetFast32, HardNet, HardTFeatNet, HardNetNarELU,
    ]
}
