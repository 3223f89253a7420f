#!/bin/bash
# r4 final-quality evals: the 20-epoch from-scratch AffNet (upgraded
# synthetic generator: perspective warps, occlusion composites,
# anchor-scale diversity; Pallas batched warp ON) at the README table
# config, full graf pair set.  Compare against the shipped-weights table
# already in README.md.
set -x
CK=/root/repo/runs/r4_AffNetFast_6Brown_TFeat_0.005_500000_HardNegC/checkpoint_19.npz
LOG=/root/repo/runs/final_evals_r4.log
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "== trained AffNet (ck19) full table ==" > $LOG
timeout 2400 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor SIFT --shape-arch AffNetFast --shape-weights "$CK" \
  >> $LOG 2>&1
echo "done rc=$?" >> $LOG
