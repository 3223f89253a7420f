#!/bin/bash
# Full graf1-2..1-6 trio tables for seed2/seed3 ck0 (harvest runners-up) —
# the graf1-4-picked winner (seed1) trades away 1-5/1-6 vs seed0; check
# whether a runner-up balances better on the 5-pair average.
set -x
P=$(cat /tmp/chain3.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
R5DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
for S in 2 3; do
  CK=/root/repo/runs/r5_seed${S}_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
  LOG=/root/repo/runs/trio_r5_seed${S}.log
  echo "== seed${S} ck0 + r5 descriptor + r3 OriNet ==" > $LOG
  timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
    --do-ori --descriptor HardNet --desc-weights "$R5DESC" \
    --shape-arch AffNetFast --shape-weights "$CK" \
    --ori-weights "$ORI" 2>/dev/null | grep -E "^1-" >> $LOG
  echo DONE >> $LOG
done
echo TRIO_SEEDS23_DONE
