"""OnePassSIR: one-pass sparse image representer with dense AffNet.

Reference: OnePassSIR.py:14-153 — same detector skeleton as
ScaleSpaceAffinePatchExtractor but the affine shape comes from a DENSE
fully-convolutional AffNet evaluated once per octave (on level 0,
OnePassSIR.py:76) and composed directly inside the NMS stage
(NMS3dAndComposeAAff, HandCraftedModules.py:292-363), with a per-level
boundary filter at 3x the LAF extent (OnePassSIR.py:95) and no Baumberg loop.

TPU mechanism: the dense shape map is flattened per octave; after the single
global top-k, per-keypoint 2x2 shapes are one gather from the dense buffer.
The boundary filter becomes a dense per-pixel mask multiplied into the
response map before the top-k (same surviving set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .detector import (DetectorConfig, ScaleSpaceAffinePatchExtractor,
                       _detection_tables)
from .laf import sc_y_x_and_A_to_lafs
from .models.dense import AffNetFastFullConv
from .ops.nms import (border_mask, masked_topk, nms3d_center,
                      softargmax_scale_y_x, update_octave_map)
from .ops.scalespace import PyramidPlan, build_flat_pyramid

Array = jax.Array


def _dense_boundary_ok(sc: Array, yy: Array, xx: Array, A: Array,
                       factor: float) -> Array:
    """Per-pixel checkTouchBoundary (LAF.py:98-104) on the dense candidate
    field: LAF = [factor * sc * A | (x, y)] in normalized coords; OK when all
    four unit-square corners stay in [0, 1]^2.  sc/yy/xx: (h, w); A: (h, w,
    2, 2)."""
    a = factor * sc[..., None, None] * A
    ok = jnp.ones(sc.shape, bool)
    for cx in (-1.0, 1.0):
        for cy in (-1.0, 1.0):
            px = a[..., 0, 0] * cx + a[..., 0, 1] * cy + xx
            py = a[..., 1, 0] * cx + a[..., 1, 1] * cy + yy
            ok &= (px >= 0.0) & (px <= 1.0) & (py >= 0.0) & (py <= 1.0)
    return ok


class OnePassSIR(ScaleSpaceAffinePatchExtractor):
    """Ctor mirrors OnePassSIR.py:15-51; ``shape_net`` must be a dense
    (fully convolutional) AffNet: (params, (1, h, w) image) -> (1, h, w, 4)."""

    def __init__(self, config: DetectorConfig = DetectorConfig(),
                 shape_net=None, ori_net=None, desc_net=None, **kw):
        super().__init__(config, shape_net=shape_net or AffNetFastFullConv(),
                         ori_net=ori_net, desc_net=desc_net, **kw)

    def _multiscale_detect(self, img: Array, plan: PyramidPlan,
                           params=None):
        cfg = self.cfg
        pyr, flat = build_flat_pyramid(img, plan, py2=cfg.py2)
        det_offsets, ext_levels, oct_ids, level_ids, total = \
            _detection_tables(plan, cfg)

        resp_chunks, sc_chunks, y_chunks, x_chunks, a_chunks = \
            [], [], [], [], []
        for o in range(plan.n_octaves):
            h, w = plan.octave_shapes[o]
            sig = plan.sigmas[o]
            rs = [jnp.maximum(self.resp_fn(pyr[o][l], sig[l])
                              - cfg.effective_th, 0.0)
                  for l in range(plan.levels_per_octave)]
            # Dense per-octave shape field (OnePassSIR.py:76).
            aff_map = self.shape_net(params.get("aff") if params else None,
                                     pyr[o][0])[0]          # (h, w, 4)
            A_field = aff_map.reshape(h, w, 2, 2)
            octmap = jnp.zeros((h, w), img.dtype)
            bmask = border_mask(h, w, int(cfg.mr_size), img.dtype)
            row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            for l in range(1, plan.levels_per_octave - 1):
                nmsed = nms3d_center(rs[l - 1], rs[l], rs[l + 1]) * bmask
                nmsed, octmap = update_octave_map(octmap, nmsed)
                sc, yy, xx = softargmax_scale_y_x(rs[l - 1], rs[l], rs[l + 1],
                                                  sig[l - 1:l + 2])
                # Per-level boundary filter at 3x extent (OnePassSIR.py:95).
                ok = _dense_boundary_ok(sc, yy, xx, A_field, 3.0)
                nmsed = nmsed * ok.astype(nmsed.dtype)
                resp_chunks.append(nmsed.ravel())
                sc_chunks.append(sc.ravel())
                y_chunks.append(yy.ravel())
                x_chunks.append(xx.ravel())
                a_chunks.append(aff_map.reshape(-1, 4))

        resp_all = jnp.concatenate(resp_chunks)
        k = min(cfg.prefilter_count(), total)
        vals, idxs, valid = masked_topk(resp_all, k)

        sc_all = jnp.concatenate(sc_chunks)
        y_all = jnp.concatenate(y_chunks)
        x_all = jnp.concatenate(x_chunks)
        A_all = jnp.concatenate(a_chunks)
        sc_y_x = jnp.stack([sc_all[idxs], y_all[idxs], x_all[idxs]], -1)
        lafs = sc_y_x_and_A_to_lafs(sc_y_x, A_all[idxs])

        det_lvl = jnp.searchsorted(jnp.asarray(det_offsets), idxs,
                                   side="right") - 1
        return {
            "flat": flat,
            "resp": vals,
            "lafs": lafs,
            "valid": valid,
            "orig_idx": idxs,
            "ext_level": jnp.asarray(ext_levels)[det_lvl],
            "oct_idx": jnp.asarray(oct_ids)[det_lvl],
            "level_idx": jnp.asarray(level_ids)[det_lvl],
            # NMS survivor count before the static cap, so extract_geom's
            # threshold mode warns on truncation like the base pipeline
            # (reference keeps every survivor via torch.nonzero).
            "n_detected": (resp_all > 0).sum().astype(jnp.int32),
        }

    def _build(self, h: int, w: int, do_ori: bool, describe: bool):
        from .laf import denormalize_lafs
        from .ops.scalespace import make_plan
        plan = make_plan(h, w, self.cfg.n_levels, self.cfg.init_sigma,
                         self.cfg.border)

        def fn(params, img):
            cand = self._multiscale_detect(img, plan, params=params)
            lafs = jnp.concatenate(
                [self.cfg.mr_size * cand["lafs"][:, :, 0:2],
                 cand["lafs"][:, :, 2:]], axis=2)
            cand = {**cand, "lafs": lafs}
            # No Baumberg loop (OnePassSIR.forward, :139-153).
            if do_ori:
                cand = self._orientation(params, cand, plan)
            if describe:
                cand = self._sort_for_describe(cand, plan, h, w)
            out = {
                "lafs": denormalize_lafs(cand["lafs"], w, h),
                "resp": cand["resp"],
                "valid": cand["valid"],
                "orig_idx": cand["orig_idx"],
                "oct_idx": cand["oct_idx"],
                "level_idx": cand["level_idx"],
                "n_detected": cand["n_detected"],
            }
            if "n_overflow" in cand:
                out["n_overflow"] = cand["n_overflow"]
            if describe:
                patches, descs, ovf = self._describe(params, cand, plan,
                                                     h, w)
                out["patches"] = patches
                out["descs"] = descs
                out["restore"] = cand["restore"]
                out["n_overflow"] = out.get(
                    "n_overflow", jnp.zeros((), jnp.int32)) + ovf
            return out

        return jax.jit(fn), plan
