#!/bin/bash
# Chunked AffNet training: the axon runtime leaks ~33 MB host memory per
# train-step dispatch (OOM at 130 GB after ~3900 steps), so the 20-epoch run
# restarts every 4 epochs, resuming from the last checkpoint with the global
# LR schedule preserved (--total-epochs).
set -x
CKDIR=/root/repo/runs/r3_AffNetFast_6Brown_TFeat_0.005_500000_HardNegC
export PYTHONPATH=/root/repo:$PYTHONPATH
for E0 in 7 11 15 19; do
  N=4
  if [ $E0 -eq 19 ]; then N=1; fi
  LAST=$(ls $CKDIR/checkpoint_*.npz | sort -t_ -k2 -n | tail -1)
  timeout 4500 python -m affnet_tpu.cli.train_affnet --synthetic \
    --epochs $N --total-epochs 20 --n-pairs 500000 --batch-size 1024 \
    --descriptor TFeat --loss HardNegC --arch AffNetFast \
    --log-dir /root/repo/runs --expname r3 \
    --resume "$LAST" >> /root/repo/runs/train_r3.log 2>&1
done
echo "chunked training done" >> /root/repo/runs/train_r3.log
# Final evals at the README table config: trained (best handled later) and
# shipped weights, graf1-2 and 1-3.
LAST=$(ls $CKDIR/checkpoint_*.npz | sort -t_ -k2 -n | tail -1)
LOG=/root/repo/runs/final_evals.log
echo "final evals with $LAST" > $LOG
for IDX in 2 3; do
  timeout 900 python -m affnet_tpu.cli.eval_graf --nfeats 2000 --img2-idx $IDX \
    --do-ori --descriptor SIFT --shape-arch AffNetFast \
    --shape-weights "$LAST" >> $LOG 2>&1
done
for IDX in 2 3; do
  timeout 900 python -m affnet_tpu.cli.eval_graf --nfeats 2000 --img2-idx $IDX \
    --do-ori --descriptor SIFT >> $LOG 2>&1
done
# Short OriNet run (TPU training documentation; injected-OriNet eval per epoch).
timeout 5400 python -m affnet_tpu.cli.train_orinet --synthetic --epochs 2 \
  --n-pairs 200000 --batch-size 1024 --loss HardNet --descriptor TFeat \
  --log-dir /root/repo/runs --expname r3 > /root/repo/runs/train_orinet_r3.log 2>&1
echo "all done" >> $LOG
