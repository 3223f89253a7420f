#!/usr/bin/env python
"""Measure the two-stage exact top-k vs approx_max_k / lax.top_k on TPU.
In-jit fori_loop (10 iters) amortizes the axon dispatch round trip."""

import time

import numpy as np


def timed(name, fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000/10:.2f} ms/iter")


def main():
    import jax
    import jax.numpy as jnp
    from affnet_tpu.ops.nms import _two_stage_topk

    rng = np.random.RandomState(0)
    n, k = 8 * 1024 * 1024, 3000
    v = np.zeros(n, np.float32)
    idx = rng.choice(n, 40000, replace=False)
    v[idx] = rng.exponential(10, 40000).astype(np.float32)
    x = jnp.asarray(v)

    def loop10(body):
        @jax.jit
        def f(x):
            def it(i, acc):
                vals, idxs = body(x + 1e-9 * i)
                return acc + vals.sum() + idxs.sum()
            return jax.lax.fori_loop(0, 10, it, 0.0)
        return f

    timed("two_stage_topk x10", loop10(lambda x: _two_stage_topk(x, k)), x)
    timed("approx_max_k x10", loop10(
        lambda x: jax.lax.approx_max_k(x, k, recall_target=1.0)), x)
    timed("lax.top_k x10", loop10(lambda x: jax.lax.top_k(x, k)), x)

    # correctness on TPU (compiled pallas path)
    vals, idxs = jax.jit(lambda x: _two_stage_topk(x, k))(x)
    ev, ei = jax.lax.top_k(x, k)
    print("vals equal:", bool((np.asarray(vals) == np.asarray(ev)).all()))
    print("idxs equal:", bool((np.asarray(idxs) == np.asarray(ei)).all()))


if __name__ == "__main__":
    main()
