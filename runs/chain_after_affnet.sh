#!/bin/bash
# Fires after the AffNet run exits: final full-config evals of the trained
# AffNet, then a short OriNet training run with per-epoch injected-OriNet
# eval, then final bench sanity.
set -x
PID=$(cat /tmp/train.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
sleep 10
CKDIR=/root/repo/runs/r3_AffNetFast_6Brown_TFeat_0.005_500000_HardNegC
LAST=$(ls $CKDIR/checkpoint_*.npz | sort -V | tail -1)
LOG=/root/repo/runs/final_evals.log
echo "last checkpoint: $LAST" > $LOG
export PYTHONPATH=/root/repo:$PYTHONPATH
# Final trained-AffNet quality at the README table config.
for IDX in 2 3; do
  timeout 900 python -m affnet_tpu.cli.eval_graf --nfeats 2000 --img2-idx $IDX \
    --do-ori --descriptor SIFT --shape-arch AffNetFast \
    --shape-weights "$LAST" >> $LOG 2>&1
done
# Shipped-weights reference on the same configs (same process state).
for IDX in 2 3; do
  timeout 900 python -m affnet_tpu.cli.eval_graf --nfeats 2000 --img2-idx $IDX \
    --do-ori --descriptor SIFT >> $LOG 2>&1
done
# Short OriNet run: documents TPU compile/step/quality with the trained
# OriNet injected per epoch (VERDICT weak #5).
timeout 7200 env JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
  python -m affnet_tpu.cli.train_orinet --synthetic --epochs 2 \
  --n-pairs 200000 --batch-size 1024 --loss HardNet --descriptor TFeat \
  --log-dir /root/repo/runs --expname r3 > /root/repo/runs/train_orinet_r3.log 2>&1
echo "chain done" >> $LOG
