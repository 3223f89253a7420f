#!/bin/bash
# r5 final trio tables: the two best AffNet+descriptor combos from the
# checkpoint scans, full graf1-2..1-6, all-from-scratch weights.
set -x
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
TILT=/root/repo/runs/r5_tilt_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
R4DESC=$(ls /root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet/checkpoint_*.npz | sort -V | tail -1)
R5DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
LOG=/root/repo/runs/trio_r5_final.log
> $LOG

echo "== A: r5_tilt ck3 + r4 descriptor ==" >> $LOG
timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$R4DESC" \
  --shape-arch AffNetFast --shape-weights "$TILT/checkpoint_3.npz" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-|inl.ratio" >> $LOG

echo "== B: r5_tilt ck2 + r5 descriptor ==" >> $LOG
timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$R5DESC" \
  --shape-arch AffNetFast --shape-weights "$TILT/checkpoint_2.npz" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-|inl.ratio" >> $LOG
echo TRIO_R5_FINAL_DONE >> $LOG
