#!/usr/bin/env python
"""Measure the bilinear-sample extents (in pyramid-level pixels) of every
patch-extraction site in the bench pipeline, to size the Pallas gather
kernel's VMEM window.  Runs the real detector stages on the TPU."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from affnet_tpu.detector import (DetectorConfig,
                                     ScaleSpaceAffinePatchExtractor)
    from affnet_tpu.models import AffNetFast
    from affnet_tpu.models.convert import load_pretrained
    from affnet_tpu.ops.patches import select_levels_for_lafs
    from affnet_tpu.ops.scalespace import make_plan
    from affnet_tpu.laf import denormalize_lafs

    H, W = 1080, 1920
    img = Image.open("/root/reference/test-graf/img1.png").convert("RGB")
    img = img.resize((W, H), Image.BILINEAR)
    img = np.mean(np.asarray(img), axis=2).astype(np.float32)

    cfg = DetectorConfig(num_features=2000, border=5, mr_size=5.192,
                         num_baum_iters=1, th=None, patch_size=32)
    det = ScaleSpaceAffinePatchExtractor(cfg, shape_net=AffNetFast)
    params = {"aff": load_pretrained("AffNetFast")}
    plan = make_plan(H, W, cfg.n_levels, cfg.init_sigma, cfg.border)
    offs, hs, ws = (jnp.asarray(t) for t in plan.level_dims_padded())
    table = jnp.asarray(plan.sigma_pixdist_table())

    def extent(lafs, lvl_idx):
        m = jnp.minimum(hs[lvl_idx], ws[lvl_idx]).astype(lafs.dtype)
        A = jnp.abs(lafs[:, :2, :2])
        ex = 2.0 * m * (A[:, 0, 0] + A[:, 0, 1])
        ey = 2.0 * m * (A[:, 1, 0] + A[:, 1, 1])
        return jnp.maximum(ex, ey)

    @jax.jit
    def probe(params, x):
        cand = det._multiscale_detect(x, plan)
        lafs = jnp.concatenate([cfg.mr_size * cand["lafs"][:, :, 0:2],
                                cand["lafs"][:, :, 2:]], axis=2)
        cand = {**cand, "lafs": lafs}
        e_shape = extent(cand["lafs"], cand["ext_level"])
        v_shape = cand["valid"]
        cand2 = det._affine_shape(params, cand, plan)
        e_ori = extent(cand2["lafs"], cand2["ext_level"])
        dlafs = denormalize_lafs(cand2["lafs"], W, H)
        lvl = select_levels_for_lafs(dlafs, table, cfg.patch_size)
        e_desc = extent(cand2["lafs"], lvl)
        return (e_shape, v_shape, e_ori, e_desc, cand2["valid"], lvl,
                cand2["ext_level"])

    outs = [np.asarray(o) for o in probe(params, jnp.asarray(img))]
    e_shape, v_shape, e_ori, e_desc, v2, lvl, extl = outs
    for name, e, v in [("shape(PS=19,prefilter 3000)", e_shape, v_shape),
                       ("ori/site2(PS=19..32 lafs post-shape)", e_ori, v2),
                       ("desc(PS=32,level-selected)", e_desc, v2)]:
        e = e[v.astype(bool)]
        qs = np.percentile(e, [50, 90, 99, 99.9, 100])
        print(f"{name}: n={len(e)} p50={qs[0]:.1f} p90={qs[1]:.1f} "
              f"p99={qs[2]:.1f} p99.9={qs[3]:.1f} max={qs[4]:.1f} "
              f">96px: {(e > 96).sum()}  >112px: {(e > 112).sum()}  "
              f">224px: {(e > 224).sum()}")
    print("desc level histogram:", np.bincount(lvl[v2.astype(bool)]))
    print("shape ext_level histogram:",
          np.bincount(extl[v2.astype(bool)]))


if __name__ == "__main__":
    main()
