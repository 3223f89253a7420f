#!/bin/bash
# r5 diversity trio: AffNet trained with 2x anchor classes (--gen-classes
# 16384) on the non-planar generator against the non-planar descriptor,
# evaluated in the all-from-scratch trio config.  Usage:
#   bash runs/trio_r5_div.sh <ckpt.npz>
# (pick the checkpoint from runs/scan_r5_div_r5desc.log first)
set -x
CK=${1:?checkpoint}
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
R5DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
LOG=/root/repo/runs/trio_r5_div.log
> $LOG

echo "== D: r5_div $CK + r5 descriptor ==" >> $LOG
timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$R5DESC" \
  --shape-arch AffNetFast --shape-weights "$CK" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-|inl.ratio" >> $LOG
echo TRIO_R5_DIV_DONE >> $LOG
