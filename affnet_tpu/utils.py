"""Observability: stage timers, profiler traces, NaN debugging, metrics.

The reference's only observability is ad-hoc time.time() prints scattered in
the pipeline (SparseImgRepresenter.py:54,117-164,191-201) and tqdm/stdout
logging.  TPU-native equivalents:

  - :class:`StageTimer` — wall-clock stage timing with an honest device
    fence (device->host fetch; block_until_ready alone can return early on
    tunneled backends)
  - :func:`profiler_trace` — jax.profiler trace context (TensorBoard format)
  - :func:`debug_nans` — toggles jax NaN checking (the 'sanitizer' mode)
  - :class:`MetricsLogger` — structured JSONL metrics
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict

import numpy as np
import jax


def fence(tree) -> None:
    """Force completion of a pytree of device arrays, robustly: fetch one
    scalar from every leaf (a device->host read is the only fence that is
    guaranteed to wait on remote/tunneled backends)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_data") or hasattr(leaf, "device"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    with timer.stage('detect'):
        out = detect(...)
        fence(out)
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, tree=None):
        t0 = time.perf_counter()
        yield
        if tree is not None:
            fence(tree)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {1000 * total:.1f} ms total "
                         f"({1000 * total / n:.1f} ms/call x {n})")
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/xprof."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """NaN-check debug mode (the single-XLA-program analogue of a runtime
    sanitizer; SURVEY.md section 5)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class MetricsLogger:
    """Append-only JSONL metrics with a monotonically increasing step."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a")

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
