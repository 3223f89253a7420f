#!/bin/bash
# r4 HardNet-from-scratch descriptor training (closes the missing-HardNet++
# substitute): HardNet arch + loss_HardNet on the synthetic pair data,
# --conv-vjp explicit to dodge the pathological conv-backward compile.
# Chunked every 4 epochs around the axon host-memory leak; --total-epochs
# keeps the global LR schedule.  Usage: train_descriptor_r4.sh <first> <last>
set -x
CKDIR=/root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet
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
  timeout 5400 python -m affnet_tpu.cli.train_descriptor --synthetic \
    --epochs $N --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
    --loss HardNet --arch HardNet --lr 0.1 --conv-vjp explicit \
    --log-dir /root/repo/runs --expname r4 \
    $RESUME >> /root/repo/runs/train_descriptor_r4.log 2>&1
done
echo "chunks $FIRST..$LAST done" >> /root/repo/runs/train_descriptor_r4.log
