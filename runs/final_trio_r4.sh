#!/bin/bash
# r4 endgame evals: checkpoint scan of the AffNet-trained-vs-HardNet run,
# then the ALL-FROM-SCRATCH pipeline (AffNet + OriNet + HardNet all trained
# in this environment, zero pretrained weights) at the README table config.
set -x
CKDIR=/root/repo/runs/r4_HN_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
DESC=$(ls /root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet/checkpoint_*.npz | sort -V | tail -1)
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
LOG=/root/repo/runs/final_trio_r4.log
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
> $LOG

for e in "$@"; do
  CK=$CKDIR/checkpoint_$e.npz
  [ -f "$CK" ] || continue
  echo "== scratch AffNet(vs HN) ck$e + shipped Ori + scratch HardNet ==" >> $LOG
  timeout 2400 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
    --do-ori --descriptor HardNet --desc-weights "$DESC" \
    --shape-arch AffNetFast --shape-weights "$CK" 2>/dev/null \
    | grep -E "pair|^1-" >> $LOG
done

BEST=$CKDIR/checkpoint_${FINAL_E:-4}.npz
echo "== ALL FROM SCRATCH: AffNet ck${FINAL_E:-4} + OriNet + HardNet ==" >> $LOG
timeout 2400 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$DESC" \
  --shape-arch AffNetFast --shape-weights "$BEST" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-" >> $LOG
echo TRIO_DONE >> $LOG
