"""Direct LAF-shape optimization by gradient descent on descriptor distance.

Reference: examples/direct_shape_optimization/optimization_script.py
(LAFDiscrOptimDetach.optimize, :119-179): the 2x2 shape part of matching
LAFs in two views is optimized with Adam to minimize a descriptor loss over
the re-extracted patches (paper Fig. 2-3; the toy Figure-1 notebooks do the
same on a single pair).  Centers stay fixed.

Here the whole optimization step (patch extraction from both pyramids ->
descriptor -> loss -> Adam update on both shape sets) is one jitted function;
loss/shape-difference/SNN histories are collected like the reference.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .laf import normalize_lafs
from .losses import get_snn
from .ops.patches import extract_patches_from_flat_pyramid, select_levels_for_lafs
from .ops.scalespace import build_flat_pyramid, make_plan

Array = jax.Array


def frob_shape_diff(A1: Array, A2: Array) -> Array:
    """Mean Frobenius distance between two shape sets."""
    return jnp.mean(jnp.sqrt(jnp.sum((A1 - A2) ** 2, axis=(1, 2)) + 1e-12))


class LAFShapeOptimizer:
    """Optimize the 2x2 parts of paired LAFs against a descriptor loss.

    descriptor: (patches (N, PS, PS)) -> (N, D)
    loss_fn:    (desc1, desc2) -> scalar (e.g. losses.loss_hardnegc)
    """

    def __init__(self, descriptor: Callable, loss_fn: Callable,
                 lr: float = 0.01, patch_size: int = 32,
                 n_levels: int = 1, init_sigma: float = 1.6,
                 border: int = 32, align_corners: bool = False):
        self.descriptor = descriptor
        self.loss_fn = loss_fn
        self.lr = lr
        self.ps = patch_size
        self.n_levels = n_levels
        self.init_sigma = init_sigma
        self.border = border
        self.align_corners = align_corners

    def _prep(self, img: np.ndarray):
        h, w = img.shape
        plan = make_plan(h, w, self.n_levels, self.init_sigma, self.border)
        _, flat = build_flat_pyramid(jnp.asarray(img), plan)
        dims = tuple(jnp.asarray(t) for t in plan.level_dims_padded())
        table = jnp.asarray(plan.sigma_pixdist_table())
        return plan, flat, dims, table, (h, w)

    def optimize(self, lafs1: np.ndarray, lafs2: np.ndarray,
                 img1: np.ndarray, img2: np.ndarray,
                 n_iters: int = 10) -> Dict[str, List]:
        """lafs in pixel coordinates (N, 2, 3).  Returns histories dict."""
        plan1, flat1, dims1, table1, wh1 = self._prep(np.asarray(img1))
        plan2, flat2, dims2, table2, wh2 = self._prep(np.asarray(img2))

        l1 = jnp.asarray(np.asarray(lafs1, np.float32))
        l2 = jnp.asarray(np.asarray(lafs2, np.float32))
        t1, t2 = l1[:, :, 2:], l2[:, :, 2:]

        opt = optax.adam(self.lr)

        from .ops import patches as patches_mod

        def patches_for(A, t, flat, dims, table, wh):
            dlafs = jnp.concatenate([A, t], axis=2)
            lvl = select_levels_for_lafs(dlafs, table, self.ps)
            nlafs = normalize_lafs(dlafs, wh[1], wh[0])
            offs, hs, ws = dims
            if patches_mod.USE_PALLAS:
                # Pallas forward with the custom VJP (exact XLA-path
                # gradients); the level index rides as f32, zero cotangent.
                from .ops.pallas_patches import make_pyramid_sampler_diff
                sampler = make_pyramid_sampler_diff(
                    offs, hs, ws, self.ps, self.align_corners)
                return sampler(flat, nlafs, lvl.astype(jnp.float32))
            return extract_patches_from_flat_pyramid(
                flat, nlafs, lvl, offs, hs, ws, ps=self.ps,
                align_corners=self.align_corners)

        def loss_of(shapes):
            A1, A2 = shapes
            p1 = patches_for(A1, t1, flat1, dims1, table1, wh1)
            p2 = patches_for(A2, t2, flat2, dims2, table2, wh2)
            d1 = self.descriptor(p1)
            d2 = self.descriptor(p2)
            return self.loss_fn(d1, d2), (d1, d2)

        @jax.jit
        def step(shapes, opt_state):
            (loss, (d1, d2)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(shapes)
            updates, opt_state = opt.update(grads, opt_state, shapes)
            shapes = optax.apply_updates(shapes, updates)
            return shapes, opt_state, loss, get_snn(d1, d2)

        shapes = (l1[:, :, :2], l2[:, :, :2])
        opt_state = opt.init(shapes)
        hist = {"lafs1": [np.asarray(jnp.concatenate([shapes[0], t1], 2))],
                "lafs2": [np.asarray(jnp.concatenate([shapes[1], t2], 2))],
                "loss": [], "shape_diff": [
                    float(frob_shape_diff(shapes[0], shapes[1]))],
                "snn": []}
        for _ in range(n_iters):
            shapes, opt_state, loss, snn = step(shapes, opt_state)
            hist["lafs1"].append(
                np.asarray(jnp.concatenate([shapes[0], t1], 2)))
            hist["lafs2"].append(
                np.asarray(jnp.concatenate([shapes[1], t2], 2)))
            hist["loss"].append(float(loss))
            hist["shape_diff"].append(
                float(frob_shape_diff(shapes[0], shapes[1])))
            hist["snn"].append(np.asarray(snn))
        return hist


def save_history(hist: Dict[str, List], fname: str) -> None:
    """Persist an optimize() history (reference: save_data,
    optimization_script.py:181-187, pickle -> npz here)."""
    np.savez(fname, lafs1=np.stack(hist["lafs1"]),
             lafs2=np.stack(hist["lafs2"]),
             loss=np.asarray(hist["loss"]),
             shape_diff=np.asarray(hist["shape_diff"]),
             snn=np.stack(hist["snn"]) if hist["snn"] else np.zeros(0))


def load_history(fname: str) -> Dict[str, List]:
    d = np.load(fname)
    return {"lafs1": list(d["lafs1"]), "lafs2": list(d["lafs2"]),
            "loss": list(d["loss"]), "shape_diff": list(d["shape_diff"]),
            "snn": list(d["snn"])}


def render_history(hist: Dict[str, List], img, fname: str, fps: int = 24,
                   dpi: int = 72) -> str:
    """Animate the LAF-shape optimization: both views' ellipses (red/blue)
    over the inverted image, one frame per iteration.

    Reference: savemp4_per_desc (optimization_script.py:229-258,
    FuncAnimation + ffmpeg).  Writes mp4 when an ffmpeg writer is available,
    else an animated GIF via PillowWriter (no external binary needed).
    Returns the path actually written.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter, writers

    from .laf import convert_lafs_to_a23, laf_to_boundary_pts

    img = np.asarray(img).squeeze()
    fig, ax = plt.subplots()
    fig.set_tight_layout(True)
    ax.imshow(255 - img, cmap="gray")
    n_frames = len(hist["lafs1"])

    lines = {"1": [], "2": []}
    for key, color in (("1", "r"), ("2", "b")):
        for laf in convert_lafs_to_a23(hist[f"lafs{key}"][0]):
            ell = laf_to_boundary_pts(laf)
            lines[key].append(ax.plot(ell[:, 0], ell[:, 1], color)[0])
    ax.legend([lines["1"][0], lines["2"][0]], ["img1", "img2"])

    def update(i):
        for key in ("1", "2"):
            for line, laf in zip(lines[key],
                                 convert_lafs_to_a23(hist[f"lafs{key}"][i])):
                ell = laf_to_boundary_pts(laf)
                line.set_data(ell[:, 0], ell[:, 1])
        return lines["1"] + lines["2"]

    anim = FuncAnimation(fig, update, frames=np.arange(n_frames),
                         interval=int(1000 / fps))
    if fname.endswith(".mp4") and not writers.is_available("ffmpeg"):
        fname = fname[:-4] + ".gif"
    if fname.endswith(".mp4"):
        anim.save(fname, dpi=dpi, writer=writers["ffmpeg"](fps=fps))
    else:
        anim.save(fname, dpi=dpi, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return fname
