"""Attribute the pipeline CNN-stage cost on the real TPU.

bench_conv_formulations showed the bare conv stack (conv+relu, bf16 inputs)
runs at 42 TFLOP/s -- 74% of this chip's measured matmul speed-of-light --
so the ~9 ms "CNNs + glue" block (CLAUDE.md r3 breakdown) is NOT a conv
formulation problem.  This script times the REAL nets at the bench's
pipeline sizes (fast mode: AffNet 3000x32x32, OriNet 2000x16x16, HardTFeat
2000x32x32, bf16 conv inputs) and ablates the suspects:

  full        PatchNet.__call__ as the pipeline runs it
  nonorm      without the per-patch input_norm standardization
  foldbn      BN folded into conv weights (eval-exact: w'=w*inv, b'=-m*inv)
  trunkonly   conv+relu only (spec stripped of BN; weights unchanged)

Run: python scripts/bench_cnn_stage.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

import affnet_tpu  # noqa: F401
from affnet_tpu.models import AffNetFast, HardTFeatNet, OriNetFast
from affnet_tpu.models.cnn import BN, Conv, apply_spec, as_nchw, input_norm
from affnet_tpu.models.convert import load_pretrained
from affnet_tpu.utils import fence

ITERS = 20


def fold_bn(spec, params):
    """Fold each BN(eval) into the preceding conv: BN(affine=False) is
    y = (x - m) * rsqrt(v + eps), a per-channel scale+shift, so
    w' = w * s[out], b' = (b - m) * s."""
    from affnet_tpu.models.cnn import BN_EPS
    new_spec, new_params = [], {}
    i = 0
    remap = {}
    for idx, layer in enumerate(spec):
        if isinstance(layer, BN):
            prev = remap[max(j for j in remap if j < idx)]
            bnp = params[f"layer{idx}"]
            s = 1.0 / np.sqrt(np.asarray(bnp["var"]) + BN_EPS)
            m = np.asarray(bnp["mean"])
            p = new_params[prev]
            w = np.asarray(p["w"]) * s[None, None, None, :]
            b = (np.asarray(p.get("b", np.zeros(s.shape))) - m) * s
            new_params[prev] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
            continue
        new_idx = len(new_spec)
        if isinstance(layer, Conv):
            remap[idx] = f"layer{new_idx}"
            if f"layer{idx}" in params:
                new_params[f"layer{new_idx}"] = dict(params[f"layer{idx}"])
            layer = Conv(layer.in_ch, layer.out_ch, layer.k, layer.stride,
                         layer.pad, bias=True, k_hw=layer.k_hw)
        new_spec.append(layer)
        i += 1
    return tuple(new_spec), new_params


def strip_bn(spec, params):
    new_spec, new_params = [], {}
    for idx, layer in enumerate(spec):
        if isinstance(layer, BN):
            continue
        ni = len(new_spec)
        if f"layer{idx}" in params:
            new_params[f"layer{ni}"] = params[f"layer{idx}"]
        new_spec.append(layer)
    return tuple(new_spec), new_params


def timed(label, fn, x):
    f = jax.jit(fn)
    fence(f(x))
    t0 = time.time()
    fence(f(x))
    ms = (time.time() - t0) * 1e3 / ITERS
    print(json.dumps({"variant": label, "ms_per_iter": round(ms, 3)}),
          flush=True)
    return ms


def loopify(body):
    def f(x):
        def it(i, acc):
            return acc + body(x * (1.0 + 1e-7 * i)).sum()
        return jax.lax.fori_loop(0, ITERS, it, 0.0)
    return f


def bench_net(name, net, params, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, net.ps, net.ps).astype(np.float32))
    netf = net.with_dtype(jnp.bfloat16)

    timed(f"{name}_full_f32", loopify(lambda p: net(params, p)), x)
    timed(f"{name}_full_bf16", loopify(lambda p: netf(params, p)), x)

    # feature trunk only, bf16, no head
    timed(f"{name}_feats_bf16",
          loopify(lambda p: netf.features(params, p)[0]), x)

    # no input_norm
    def feats_nonorm(p):
        xx = as_nchw(p)
        f, _ = apply_spec(net.spec, params, xx,
                         compute_dtype=jnp.bfloat16)
        return f.reshape(f.shape[0], -1)
    timed(f"{name}_nonorm_bf16", loopify(feats_nonorm), x)

    # BN folded into convs (eval-exact)
    fspec, fparams = fold_bn(net.spec, params)

    def feats_fold(p):
        xx = input_norm(as_nchw(p))
        f, _ = apply_spec(fspec, fparams, xx, compute_dtype=jnp.bfloat16)
        return f.reshape(f.shape[0], -1)
    timed(f"{name}_foldbn_bf16", loopify(feats_fold), x)

    # parity check full vs foldbn (f32 compute for a clean comparison)
    def feats_fold32(p):
        xx = input_norm(as_nchw(p))
        f, _ = apply_spec(fspec, fparams, xx)
        return f.reshape(f.shape[0], -1)
    a = np.asarray(jax.jit(lambda p: net.features(params, p)[0])(x[:64]))
    b = np.asarray(jax.jit(feats_fold32)(x[:64]))
    print(json.dumps({"variant": f"{name}_foldbn_maxerr",
                      "err": float(np.abs(a - b).max())}), flush=True)

    # BN stripped entirely (not equivalent; isolates BN's cost)
    sspec, sparams = strip_bn(net.spec, params)

    def feats_strip(p):
        xx = input_norm(as_nchw(p))
        f, _ = apply_spec(sspec, sparams, xx, compute_dtype=jnp.bfloat16)
        return f.reshape(f.shape[0], -1)
    timed(f"{name}_stripbn_bf16", loopify(feats_strip), x)


def main():
    print("# pipeline sizes: AffNet 3000x32, OriNet 2000x16, TFeat 2000x32",
          flush=True)
    bench_net("affnet", AffNetFast, load_pretrained("AffNetFast"), 3000)
    bench_net("orinet", OriNetFast, load_pretrained("OriNetFast"), 2000)
    bench_net("tfeat", HardTFeatNet, load_pretrained("HardTFeatNet"), 2000)


if __name__ == "__main__":
    main()
