#!/bin/bash
# r5 descriptor experiment: train HardNet-from-scratch on the UPGRADED
# synthetic generator (non-planar mesh warps + cross-view blur jitter),
# the same supervision change that broke the graf1-4 ceiling for AffNet.
# Chunked around the axon host-staging leak, resumable; --total-epochs
# keeps the global LR schedule across chunks.  Usage:
#   bash runs/train_descriptor_r5.sh <expname> <total_epochs> [gen flags...]
# e.g. bash runs/train_descriptor_r5.sh r5hn 8 --gen-mesh 2.5 --gen-blur 1.2
set -x
EXP=${1:?expname}
TOTAL=${2:?total epochs}
shift 2
GENFLAGS="$@"
CKDIR=/root/repo/runs/${EXP}_HardNet_desc_0.1_500000_HardNet
LOG=/root/repo/runs/${EXP}_desc.log
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

LASTCK=$((TOTAL - 1))
echo "== $EXP: HardNet from scratch, $TOTAL epochs, gen: $GENFLAGS ==" > $LOG
while [ ! -f "$CKDIR/checkpoint_$LASTCK.npz" ]; do
  RESUME=""
  LAST=""
  if [ -d "$CKDIR" ] && ls $CKDIR/checkpoint_*.npz >/dev/null 2>&1; then
    LAST=$(ls $CKDIR/checkpoint_*.npz | sort -V | tail -1)
    RESUME="--resume $LAST"
  fi
  timeout 3000 python -m affnet_tpu.cli.train_descriptor --synthetic \
    --epochs 4 --total-epochs $TOTAL --n-pairs 500000 --batch-size 1024 \
    --loss HardNet --arch HardNet --lr 0.1 --conv-vjp explicit \
    --log-dir /root/repo/runs --expname $EXP $GENFLAGS $RESUME >> $LOG 2>&1
  NEW=$(ls $CKDIR/checkpoint_*.npz 2>/dev/null | sort -V | tail -1)
  if [ "$NEW" == "$LAST" ]; then
    echo "$EXP: no progress (last=$LAST), aborting" >> $LOG
    exit 1
  fi
done
echo "${EXP}_TRAIN_DONE" >> $LOG
