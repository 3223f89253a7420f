#!/bin/bash
# r5 experiment: break the graf1-4 synthetic ceiling (VERDICT r4 missing #1,
# target inlier ratio >= 0.45 from scratch; r4 topped out 0.31-0.37).
# Trains AffNet against the r4 from-scratch HardNet descriptor on the
# UPGRADED generator (non-planar mesh warps + cross-view blur jitter +
# optional higher data tilt), chunked every 4 epochs around the host-staging
# leak, resumable.  Usage:
#   [DESC=<ckpt.npz>] bash runs/train_affnet_r5.sh <expname> <total_epochs> [gen flags...]
# e.g. bash runs/train_affnet_r5.sh r5_mesh 8 --gen-mesh 2.5 --gen-blur 1.2
# DESC overrides the loss descriptor (default: last r4 from-scratch HardNet).
set -x
EXP=${1:?expname}
TOTAL=${2:?total epochs}
shift 2
GENFLAGS="$@"
DESC=${DESC:-$(ls /root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet/checkpoint_*.npz | sort -V | tail -1)}
CKDIR=/root/repo/runs/${EXP}_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
LOG=/root/repo/runs/${EXP}.log
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

LASTCK=$((TOTAL - 1))
echo "== $EXP: AffNet vs from-scratch HardNet, $TOTAL epochs, gen: $GENFLAGS ==" > $LOG
while [ ! -f "$CKDIR/checkpoint_$LASTCK.npz" ]; do
  RESUME=""
  LAST=""
  DONE=0
  if [ -d "$CKDIR" ] && ls $CKDIR/checkpoint_*.npz >/dev/null 2>&1; then
    LAST=$(ls $CKDIR/checkpoint_*.npz | sort -V | tail -1)
    RESUME="--resume $LAST"
    DONE=$(($(basename $LAST .npz | sed 's/checkpoint_//') + 1))
  fi
  REMAIN=$((TOTAL - DONE))
  CHUNK=$((REMAIN < 4 ? REMAIN : 4))
  timeout 3000 python -m affnet_tpu.cli.train_affnet --synthetic \
    --epochs $CHUNK --total-epochs $TOTAL --n-pairs 500000 --batch-size 1024 \
    --loss HardNegC --descriptor HardNet --desc-weights "$DESC" \
    --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
    --expname $EXP $GENFLAGS $RESUME >> $LOG 2>&1
  NEW=$(ls $CKDIR/checkpoint_*.npz 2>/dev/null | sort -V | tail -1)
  if [ "$NEW" == "$LAST" ]; then
    echo "$EXP: no progress (last=$LAST), aborting" >> $LOG
    exit 1
  fi
done
echo "${EXP}_TRAIN_DONE" >> $LOG
