#!/bin/bash
# Scan every checkpoint of an AffNet run on one graf pair (default 1-4)
# with the from-scratch HardNet descriptor + OriNet (the trio config) and
# report the best.  Usage: bash runs/scan_ck.sh <ckdir> [pair] [log] [desc]
set -x
CKDIR=${1:?checkpoint dir}
PAIR=${2:-4}
LOG=${3:-/root/repo/runs/scan_$(basename $CKDIR).log}
DESC=${4:-$(ls /root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet/checkpoint_*.npz | sort -V | tail -1)}
ORI=${ORI:-/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz}
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
> $LOG
BESTE=-1
BESTR=0
for CK in $(ls $CKDIR/checkpoint_*.npz | sort -V); do
  e=$(basename $CK .npz); e=${e#checkpoint_}
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
