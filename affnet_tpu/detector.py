"""The scale-space Hessian-affine detection pipeline — one XLA program.

TPU-first redesign of the reference ScaleSpaceAffinePatchExtractor
(SparseImgRepresenter.py:14-209).  Differences in *mechanism* (semantics are
preserved; every constant cites its source):

  - The ragged pyramid / per-level Python loops / torch.nonzero /
    index_select machinery is replaced by: a static pyramid plan (traced
    shapes fixed per (H, W)), dense NMS + soft-argmax maps, ONE global masked
    top-k, and vectorized gathers from a flat pyramid buffer.  The entire
    image -> LAFs (-> descriptors) computation jits into a single program.
  - Variable-length keypoint sets become fixed-size arrays + a validity
    mask.  In top-k mode the selected SET equals the reference's (a global
    top-k over everything equals its per-level-then-global cascade); in
    threshold mode all NMS survivors are kept up to a static cap.
  - The patch-CNN stages run as one batch (no 256-chunk batched_forward —
    BN is in eval mode, so chunking is a no-op numerically).

Reference semantics preserved (verified against the runnable reference in
tests/test_detector.py):
  - prefilter = int(1.5 * num) when num_baum_iters > 0  (:193-194)
  - LAF A *= mrSize before the shape stage              (:198)
  - shape patches come from pyramid level (level_idx - 1) — "prevBlur"
    (:94; the stored level index points one level below the detection level)
  - shape gate: eig ratio of composed A in (1/6, 6) AND the mrSize-scaled
    LAF's unit square inside the image                   (:147-149)
  - orientation rotates LAFs on the right                (:175-177)
  - th is subtracted from responses before NMS (clamp at 0)  (:77-84)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .laf import (check_touch_boundary, denormalize_lafs, eig2x2_vals,
                  sc_y_x_to_lafs)
from .models.handcrafted import AffineShapeEstimator, OrientationDetector
from .ops.hessian import hessian_response
from .ops.nms import (border_mask, masked_topk, nms3d_center,
                      softargmax_scale_y_x, update_octave_map)
from .ops.patches import extract_patches_pyramid, select_levels_for_lafs
from .ops.scalespace import PyramidPlan, build_flat_pyramid, make_plan

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Mirrors the reference ctor (SparseImgRepresenter.py:15-24) plus the
    static-shape knobs a TPU program needs."""
    num_features: int = 500
    border: int = 16
    patch_size: int = 32           # descriptor patch size
    mr_size: float = 3.0
    n_levels: int = 3
    num_baum_iters: int = 0
    init_sigma: float = 1.6
    th: Optional[float] = None     # not None -> threshold mode (num ignored)
    max_keypoints: int = 8192      # static candidate cap (threshold mode /
                                   # prefilter ceiling).  Sized from data
                                   # (scripts/measure_threshold_counts.py):
                                   # at the classical th=28.41 the graf
                                   # images (800x640) yield 5.3-6.8k NMS
                                   # survivors, a 1080p image 12.7k — the
                                   # old 4096 default truncated even
                                   # graf-sized threshold runs (the CLIs
                                   # use 16384 for 1080p-class inputs).
    align_corners: bool = False    # torch>=1.3 semantics (the runnable ref)
    py2: bool = False              # python-2 kernel semantics of the 2018 code
    fused_detect: bool = True      # Pallas fused hessian+NMS+softargmax
                                   # (identical survivor sets; values differ
                                   # only by fp reassociation)
    fast: bool = False             # bf16 patch-gather matmuls + bf16 CNN
                                   # conv inputs (f32 accumulation, f32
                                   # detection/selection: identical keypoint
                                   # sets, ~1 grey-level patch noise;
                                   # validated quality-neutral on graf)
    desc_dtype: Optional[str] = None
                                   # transport precision of the returned
                                   # descriptors, e.g. "float16".  The axon
                                   # tunnel fetches at ~53 MB/s with ~27 ms
                                   # latency, so bulk extraction is
                                   # FETCH-bound on f32 descriptors (1 MB /
                                   # 2000 kps); f16 halves the payload for a
                                   # measured max descriptor error of 6.1e-5
                                   # (scripts/bench_fetch_bw.py) — 16x under
                                   # the 1e-3 reference-parity gate.  LAF
                                   # coordinates always stay f32 (f16 would
                                   # cost ~0.5 px at x~2000).

    @property
    def threshold_mode(self) -> bool:
        return self.th is not None

    @property
    def effective_th(self) -> float:
        return float(self.th) if self.th is not None else 0.0

    def prefilter_count(self) -> int:
        """Candidates kept after detection (before the shape stage)."""
        if self.threshold_mode:
            return self.max_keypoints
        if self.num_baum_iters > 0:
            return min(int(1.5 * self.num_features), self.max_keypoints)
        return min(self.num_features, self.max_keypoints)

    def final_count(self) -> int:
        if self.threshold_mode:
            return self.max_keypoints
        return min(self.num_features, self.max_keypoints)


def _detection_tables(plan: PyramidPlan, cfg: DetectorConfig):
    """Static tables over 'detection levels' (octave o, center level l):
    flat start offset of each level's pixels in the concatenated response
    vector, and the flat *extraction* level (= level l-1: 'prevBlur')."""
    offsets, ext_levels, oct_ids, level_ids, sizes = [], [], [], [], []
    pos = 0
    for o in range(plan.n_octaves):
        h, w = plan.octave_shapes[o]
        for l in range(1, plan.levels_per_octave - 1):
            offsets.append(pos)
            sizes.append(h * w)
            ext_levels.append(plan.flat_index(o, l - 1))
            oct_ids.append(o)
            level_ids.append(l - 1)      # the reference stores level_idx - 1
            pos += h * w
    return (np.array(offsets, np.int32), np.array(ext_levels, np.int32),
            np.array(oct_ids, np.int32), np.array(level_ids, np.int32), pos)


class ScaleSpaceAffinePatchExtractor:
    """Image -> (LAFs, responses[, descriptors]) pipeline.

    ``shape_net`` / ``ori_net`` are injectable like the reference's
    RespNet/OriNet/AffNet ctor args (SparseImgRepresenter.py:38-49); they are
    PatchNet-style callables ``net(params, patches) -> A | rotation``.
    ``params`` holds per-net weights under keys 'aff', 'ori', 'desc'.
    """

    def __init__(self, config: DetectorConfig = DetectorConfig(),
                 shape_net=None, ori_net=None, desc_net=None,
                 resp_fn: Callable[[Array, float], Array] = hessian_response):
        self.cfg = config
        self.shape_net = shape_net if shape_net is not None \
            else AffineShapeEstimator(patch_size=19)
        self.ori_net = ori_net if ori_net is not None \
            else OrientationDetector(patch_size=19)
        self.desc_net = desc_net
        self.resp_fn = resp_fn
        if config.fast:
            # bf16 conv inputs on the learned nets (f32 accumulation).
            for attr in ("shape_net", "ori_net", "desc_net"):
                net = getattr(self, attr)
                if net is not None and hasattr(net, "with_dtype"):
                    setattr(self, attr, net.with_dtype(jnp.bfloat16))
        self._gather_dtype = jnp.bfloat16 if config.fast else None
        self._jitted: Dict[Tuple, Callable] = {}

    # ------------------------------------------------------------------
    # Traced pipeline stages
    # ------------------------------------------------------------------

    def _multiscale_detect(self, img: Array, plan: PyramidPlan):
        """Pyramid + per-level det-Hessian + NMS + soft-argmax + global
        top-k.  Returns candidate dict with fixed-size arrays."""
        cfg = self.cfg
        pyr, flat = build_flat_pyramid(img, plan, py2=cfg.py2)
        det_offsets, ext_levels, oct_ids, level_ids, total = \
            _detection_tables(plan, cfg)

        use_fused = cfg.fused_detect and self.resp_fn is hessian_response

        resp_chunks, sc_chunks, y_chunks, x_chunks = [], [], [], []
        for o in range(plan.n_octaves):
            h, w = plan.octave_shapes[o]
            sig = plan.sigmas[o]
            octmap = jnp.zeros((h, w), img.dtype)
            bmask = border_mask(h, w, int(cfg.mr_size), img.dtype)
            if use_fused:
                from .ops.pallas_detect import detect_octave_fused
                fused = detect_octave_fused(pyr[o], sig, cfg.effective_th)
                for l in range(1, plan.levels_per_octave - 1):
                    nmsed_raw, sc, yy, xx = fused[l - 1]
                    nmsed = nmsed_raw * bmask
                    nmsed, octmap = update_octave_map(octmap, nmsed)
                    resp_chunks.append(nmsed.ravel())
                    sc_chunks.append(sc.ravel())
                    y_chunks.append(yy.ravel())
                    x_chunks.append(xx.ravel())
                continue
            rs = [jnp.maximum(self.resp_fn(pyr[o][l], sig[l])
                              - cfg.effective_th, 0.0)
                  for l in range(plan.levels_per_octave)]
            for l in range(1, plan.levels_per_octave - 1):
                nmsed = nms3d_center(rs[l - 1], rs[l], rs[l + 1]) * bmask
                nmsed, octmap = update_octave_map(octmap, nmsed)
                sc, yy, xx = softargmax_scale_y_x(rs[l - 1], rs[l], rs[l + 1],
                                                  sig[l - 1:l + 2])
                resp_chunks.append(nmsed.ravel())
                sc_chunks.append(sc.ravel())
                y_chunks.append(yy.ravel())
                x_chunks.append(xx.ravel())

        resp_all = jnp.concatenate(resp_chunks)
        k = cfg.prefilter_count()
        vals, idxs, valid = masked_topk(resp_all, min(k, total))

        sc_all = jnp.concatenate(sc_chunks)
        y_all = jnp.concatenate(y_chunks)
        x_all = jnp.concatenate(x_chunks)
        sc_y_x = jnp.stack([sc_all[idxs], y_all[idxs], x_all[idxs]], -1)
        lafs = sc_y_x_to_lafs(sc_y_x)

        # NMS survivor count BEFORE the static cap: in threshold mode the
        # reference keeps every survivor (torch.nonzero), while we truncate
        # at max_keypoints — this makes that truncation observable.
        n_detected = (resp_all > 0).sum().astype(jnp.int32)

        det_lvl = jnp.searchsorted(jnp.asarray(det_offsets), idxs,
                                   side="right") - 1
        return {
            "flat": flat,
            "resp": vals,
            "lafs": lafs,                       # normalized coords
            "valid": valid,
            "orig_idx": idxs,                   # for reference-order replay
            "ext_level": jnp.asarray(ext_levels)[det_lvl],
            "oct_idx": jnp.asarray(oct_ids)[det_lvl],
            "level_idx": jnp.asarray(level_ids)[det_lvl],
            "n_detected": n_detected,
        }

    def _affine_shape(self, params, cand, plan: PyramidPlan):
        """num_baum_iters x shape-CNN composition + gates + final top-k.
        Reference: getAffineShape (SparseImgRepresenter.py:113-165)."""
        cfg = self.cfg
        offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
        lafs0 = cand["lafs"]
        lafs_cur = lafs0
        n = lafs0.shape[0]
        base_A = jnp.broadcast_to(jnp.eye(2, dtype=lafs0.dtype), (n, 2, 2))
        overflow = cand.get("n_overflow", jnp.zeros((), jnp.int32))
        for i in range(cfg.num_baum_iters):
            patches, ovf = extract_patches_pyramid(
                cand["flat"], lafs_cur, cand["ext_level"], offs, hs, ws,
                ps=self.shape_net.ps, align_corners=cfg.align_corners,
                site="shape", mxu_dtype=self._gather_dtype,
                return_miss_overflow=True)
            overflow = overflow + ovf
            A = self.shape_net(params.get("aff"), patches)
            base_A = A @ base_A
            lafs_cur = jnp.concatenate(
                [base_A @ lafs0[:, :, 0:2], lafs0[:, :, 2:]], axis=2)

        l1, l2 = eig2x2_vals(base_A)
        ratio = jnp.abs(l1 / (l2 + 1e-8))
        gate = ((ratio < 6.0) & (ratio > 1.0 / 6.0)
                & check_touch_boundary(lafs_cur) & cand["valid"])
        resp_masked = cand["resp"] * gate.astype(cand["resp"].dtype)

        kfinal = cfg.final_count()
        if cfg.threshold_mode:
            # Keep all survivors (padded); no re-top-k.
            sel = jnp.arange(n)
            resp_out, valid_out = resp_masked, gate & (cand["resp"] > 0)
        else:
            resp_out, sel, valid_out = masked_topk(resp_masked,
                                                   min(kfinal, n))
        # Gate-failed entries can carry arbitrarily elongated shapes (eig
        # ratio > 6); zero their LAFs so downstream patch sites never pay
        # fallback recomputes for keypoints that are filtered anyway.
        lafs_cur = jnp.where(gate[:, None, None], lafs_cur,
                             jnp.zeros_like(lafs_cur))
        out = {
            "flat": cand["flat"],
            "resp": resp_out,
            "lafs": lafs_cur[sel],
            "valid": valid_out,
            "orig_idx": cand["orig_idx"][sel],
            "ext_level": cand["ext_level"][sel],
            "oct_idx": cand["oct_idx"][sel],
            "level_idx": cand["level_idx"][sel],
            "n_detected": cand["n_detected"],
            "n_overflow": overflow,
        }
        return out

    def _orientation(self, params, cand, plan: PyramidPlan):
        """Reference: getOrientation (SparseImgRepresenter.py:167-180)."""
        cfg = self.cfg
        offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
        patches, ovf = extract_patches_pyramid(
            cand["flat"], cand["lafs"], cand["ext_level"], offs, hs, ws,
            ps=self.ori_net.ps, align_corners=cfg.align_corners,
            site="ori", mxu_dtype=self._gather_dtype,
            return_miss_overflow=True)
        rot = self.ori_net(params.get("ori"), patches, return_rot_matrix=True)
        lafs = jnp.concatenate(
            [cand["lafs"][:, :, :2] @ rot, cand["lafs"][:, :, 2:]], axis=2)
        overflow = cand.get("n_overflow", jnp.zeros((), jnp.int32)) + ovf
        return {**cand, "lafs": lafs, "n_overflow": overflow}

    def _sort_spatial(self, cand, plan: PyramidPlan):
        """Window-origin sort of the candidate set (shape-site key) so the
        Pallas sampler's shared-window DMA dedup (ops.patches.DEDUP_WINDOWS)
        sees multi-scale detections of one corner ADJACENTLY — equal
        quantized origins then share one DMA at the shape AND orientation
        sites (centers don't move between them).  The inverse permutation is
        carried in ``restore``/``order`` and undone on the host, so the
        emitted keypoint order is unchanged."""
        from .ops.pallas_patches import origin_sort_key
        offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
        key = origin_sort_key(cand["lafs"], cand["ext_level"], offs, hs, ws,
                              self.cfg.patch_size, self.cfg.align_corners)
        order = jnp.argsort(key)
        perm = {k: cand[k][order] for k in
                ("lafs", "resp", "valid", "orig_idx", "ext_level",
                 "oct_idx", "level_idx")}
        return {**cand, **perm, "order": order,
                "restore": jnp.argsort(order).astype(jnp.int32)}

    def _sort_for_describe(self, cand, plan: PyramidPlan, h: int, w: int):
        """Reorder the candidate set by ascending descriptor-sample extent
        so the desc gather can run its bucketed windows (ops/patches.py
        DESC_BUCKETS).  Emits ``restore`` (the inverse permutation) so the
        host can put outputs back into reference order — permuting the
        small per-keypoint arrays is ~free on device while unsorting the
        (N, PS, PS) patch tensor costs ~1 ns/element."""
        from .ops.pallas_patches import sample_extents
        cfg = self.cfg
        offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
        dlafs = denormalize_lafs(cand["lafs"], w, h)
        table = jnp.asarray(plan.sigma_pixdist_table())
        lvl = select_levels_for_lafs(dlafs, table, cfg.patch_size)
        eu, ev = sample_extents(cand["lafs"], lvl, hs, ws,
                                cfg.patch_size, cfg.align_corners)
        order = jnp.argsort(jnp.maximum(eu, ev))
        from .ops import patches as patches_mod
        if patches_mod.DEDUP_WINDOWS and "desc" in patches_mod.DEDUP_SITES:
            # Secondary sort for the shared-window DMA dedup: within each
            # STATIC desc bucket slice (membership — hence window class and
            # cost — is fixed by the extent order), reorder by quantized
            # window origin so same-corner detections sit adjacently.
            # jnp.argsort is stable, so equal origins keep extent order.
            from .ops.pallas_patches import bucket_sizes, origin_sort_key
            import numpy as _np
            n = cand["lafs"].shape[0]
            sizes = bucket_sizes(n, [b[0] for b in patches_mod.DESC_BUCKETS])
            bucket_of_pos = jnp.asarray(
                _np.repeat(_np.arange(len(sizes), dtype=_np.int64), sizes))
            okey = origin_sort_key(cand["lafs"], lvl, offs, hs, ws,
                                   cfg.patch_size, cfg.align_corners)
            skey = bucket_of_pos * (2 ** 28) + okey[order].astype(jnp.int64)
            order = order[jnp.argsort(skey)]
        # Compose with any earlier (spatial) sort so the host-side restore
        # maps straight back to the original top-k order.
        total = cand["order"][order] if "order" in cand else order
        perm = {k: cand[k][order] for k in
                ("lafs", "resp", "valid", "orig_idx", "ext_level",
                 "oct_idx", "level_idx")}
        return {**cand, **perm, "desc_level": lvl[order], "order": total,
                "restore": jnp.argsort(total).astype(jnp.int32)}

    def _describe(self, params, cand, plan: PyramidPlan, h: int, w: int):
        """Descriptor-patch extraction with scale-aware level selection +
        descriptor CNN.  Reference: extract_patches_from_pyr
        (SparseImgRepresenter.py:181-188) + HardNet (HardNet.py:98-101)."""
        cfg = self.cfg
        offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
        if "desc_level" in cand:
            lvl = cand["desc_level"]
            sorted_in = True
        else:
            dlafs = denormalize_lafs(cand["lafs"], w, h)
            table = jnp.asarray(plan.sigma_pixdist_table())
            lvl = select_levels_for_lafs(dlafs, table, cfg.patch_size)
            sorted_in = False
        patches, ovf = extract_patches_pyramid(
            cand["flat"], cand["lafs"], lvl, offs, hs, ws,
            ps=cfg.patch_size, align_corners=cfg.align_corners,
            site="desc", mxu_dtype=self._gather_dtype,
            assume_extent_sorted=sorted_in, return_miss_overflow=True)
        descs = self.desc_net(params.get("desc"), patches)
        return patches, descs, ovf

    # ------------------------------------------------------------------
    # Host API
    # ------------------------------------------------------------------

    def _build(self, h: int, w: int, do_ori: bool, describe: bool):
        plan = make_plan(h, w, self.cfg.n_levels, self.cfg.init_sigma,
                         self.cfg.border)

        def fn(params, img):
            cand = self._multiscale_detect(img, plan)
            # LAF A *= mrSize (measurement region, :198).
            lafs = jnp.concatenate(
                [self.cfg.mr_size * cand["lafs"][:, :, 0:2],
                 cand["lafs"][:, :, 2:]], axis=2)
            cand = {**cand, "lafs": lafs}
            from .ops import patches as patches_mod
            if patches_mod.DEDUP_WINDOWS and (
                    self.cfg.num_baum_iters > 0 or do_ori):
                cand = self._sort_spatial(cand, plan)
            if self.cfg.num_baum_iters > 0:
                cand = self._affine_shape(params, cand, plan)
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
                if self.cfg.desc_dtype is not None:
                    descs = descs.astype(jnp.dtype(self.cfg.desc_dtype))
                out["descs"] = descs
                out["n_overflow"] = out.get(
                    "n_overflow", jnp.zeros((), jnp.int32)) + ovf
            if "restore" in cand:
                # Device arrays are permuted (spatial and/or extent sort);
                # the host puts them back into reference order.
                out["restore"] = cand["restore"]
            return out

        return jax.jit(fn), plan

    def get_jitted(self, h: int, w: int, do_ori: bool = False,
                   describe: bool = False):
        key = (h, w, do_ori, describe)
        if key not in self._jitted:
            self._jitted[key] = self._build(h, w, do_ori, describe)
        return self._jitted[key]

    def __call__(self, img, params: Optional[Dict[str, Any]] = None,
                 do_ori: bool = False, describe: bool = False,
                 reference_order: bool = True) -> Dict[str, np.ndarray]:
        """Run the pipeline on an (H, W) grayscale image (numpy or jnp).

        Returns host-side dict with only the VALID keypoints, ordered like
        the reference output (top-k order, or original scan order when the
        final stage kept all survivors) if ``reference_order``.
        """
        img = jnp.asarray(np.asarray(img, np.float32))
        h, w = img.shape
        fn, _plan = self.get_jitted(h, w, do_ori, describe)
        out = fn(params or {}, img)
        # (OnePassSIR builds its own fn without the counter.)
        n_detected = out.pop("n_detected", None)
        n_detected = int(n_detected) if n_detected is not None else None
        if (n_detected is not None and self.cfg.threshold_mode
                and n_detected > self.cfg.max_keypoints):
            # Keep-all semantics for real (reference: torch.nonzero keeps
            # every NMS survivor, SparseImgRepresenter.py:77-111): raise the
            # static cap to the next power-of-2 bucket and re-jit.  The
            # survivor count depends only on (img, th), not the cap, so one
            # retry always suffices; the raised cap sticks on the instance,
            # amortizing the recompile over subsequent images.
            new_cap = 1 << (n_detected - 1).bit_length()
            self.cfg = dataclasses.replace(self.cfg, max_keypoints=new_cap)
            self._jitted.clear()
            fn, _plan = self.get_jitted(h, w, do_ori, describe)
            out = fn(params or {}, img)
            n_detected = int(out.pop("n_detected"))
            if n_detected > self.cfg.max_keypoints:  # pragma: no cover
                import warnings
                warnings.warn(
                    f"threshold mode: {n_detected} NMS survivors still "
                    f"exceed the raised cap {self.cfg.max_keypoints}; the "
                    "weakest responses were dropped")
        n_overflow = out.pop("n_overflow", None)
        if n_overflow is not None and int(n_overflow) > 0:
            import warnings
            warnings.warn(
                f"patch gather: {int(n_overflow)} window misses exceeded "
                "the fallback capacity and kept truncated samples "
                "(pathological LAF extents; raise ops.patches fallback "
                "sizing if this recurs)")
        # The device emits extent-sorted arrays in describe mode; restore
        # maps them back to reference (top-k) order.
        restore = out.pop("restore", None)
        if restore is not None:
            restore = np.asarray(restore)
            out = {k: np.asarray(v)[restore] for k, v in out.items()}
        valid = np.asarray(out["valid"])
        res = {k: np.asarray(v)[valid] for k, v in out.items()
               if k != "valid"}
        if reference_order and self.cfg.threshold_mode:
            # In threshold mode the reference never top-ks, so its output
            # order is the original scan order (torch.nonzero).  In top-k
            # mode both the prefilter and the keep-all branch of
            # getAffineShape preserve descending-response order
            # (SparseImgRepresenter.py:104-108,155), which is exactly what
            # masked_topk already emits.
            order = np.argsort(res["orig_idx"], kind="stable")
            res = {k: v[order] for k, v in res.items()}
        if n_detected is not None:
            res["n_detected"] = n_detected
        return res


# Convenient alias with the TPU-framework name.
HessAffNetPipeline = ScaleSpaceAffinePatchExtractor
