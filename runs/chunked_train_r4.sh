#!/bin/bash
# r4 AffNet retrain: upgraded synthetic generator (perspective warps,
# occlusion composites, anchor-scale diversity) + the Pallas batched warp
# now ON for training (USE_PALLAS_BATCHED, full-capacity fallback).
# Chunked every 4 epochs around the axon host-memory leak (~33 MB/step
# dispatch, OOM ~3900 steps); --total-epochs keeps the global LR schedule.
# Usage: chunked_train_r4.sh <first-epoch> <last-epoch-exclusive>
set -x
CKDIR=/root/repo/runs/r4_AffNetFast_6Brown_TFeat_0.005_500000_HardNegC
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
FIRST=${1:-0}
LAST=${2:-8}
for ((E0 = FIRST; E0 < LAST; E0 += 4)); do
  N=$((LAST - E0 < 4 ? LAST - E0 : 4))
  RESUME=""
  if [ -d "$CKDIR" ] && ls $CKDIR/checkpoint_*.npz >/dev/null 2>&1; then
    RESUME="--resume $(ls $CKDIR/checkpoint_*.npz |  sort -V | tail -1)"
  fi
  timeout 5400 python -m affnet_tpu.cli.train_affnet --synthetic \
    --epochs $N --total-epochs 20 --n-pairs 500000 --batch-size 1024 \
    --descriptor TFeat --loss HardNegC --arch AffNetFast \
    --log-dir /root/repo/runs --expname r4 \
    $RESUME >> /root/repo/runs/train_r4.log 2>&1
done
echo "chunks $FIRST..$LAST done" >> /root/repo/runs/train_r4.log
