#!/bin/bash
# r5 FAST seed harvest: every seed's best checkpoint so far is ck0 (the
# early high-LR epoch; seeds 0..3 all peak there and drift down after —
# runs/scan_r5_seed{1,2,3}_r5desc.log), so sampling more seeds only needs
# --epochs 1.  --total-epochs 8 pins the LR schedule, making checkpoint_0
# bit-identical to checkpoint_0 of the 3- or 8-epoch run at the same seed
# for a third of the cost.  Scan is ck0-only (graf1-4 trio eval).  Usage:
#   bash runs/seed_harvest_fast_r5.sh [seeds...]
set -x
SEEDS=${@:-4 5 6 7 8 9}
DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

for S in $SEEDS; do
  EXP=r5_seed$S
  CKDIR=/root/repo/runs/${EXP}_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
  LOG=/root/repo/runs/${EXP}.log
  if [ ! -f "$CKDIR/checkpoint_0.npz" ]; then
    timeout 3000 python -m affnet_tpu.cli.train_affnet --synthetic \
      --epochs 1 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
      --loss HardNegC --descriptor HardNet --desc-weights "$DESC" \
      --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
      --expname $EXP --seed $S \
      --gen-tilt 4.5 --gen-mesh 2.5 --gen-blur 1.2 > $LOG 2>&1
  fi
  [ -f "$CKDIR/checkpoint_0.npz" ] || { echo "$EXP incomplete" >> $LOG; continue; }
  SLOG=/root/repo/runs/scan_${EXP}_r5desc.log
  LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx 4 \
    --nfeats 2000 --fast --do-ori --descriptor HardNet \
    --desc-weights "$DESC" --shape-arch AffNetFast \
    --shape-weights "$CKDIR/checkpoint_0.npz" \
    --ori-weights "$ORI" 2>/dev/null | grep inl.ratio | tail -1)
  echo "scan ck0 graf1-4: $LINE" > $SLOG
done
echo SEED_HARVEST_FAST_DONE
