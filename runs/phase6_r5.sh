#!/bin/bash
# r5 phase 6 — tilt exploration: every AffNet selection so far optimized
# graf1-4, and only --gen-tilt 4.5 was ever tried with the mesh generator.
# The weak pairs (1-5/1-6, extreme viewpoint) may want harder tilts.
# Train the seed-1 recipe at --gen-tilt 6.0, scan ck0 on graf1-4/5/6.
set -x
P=$(cat /tmp/phase5.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R5HN=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet
ORI3=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
OUT=/root/repo/runs/phase6_r5.log
> "$OUT"

EXP=r5_tilt6
CKDIR=/root/repo/runs/${EXP}_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
if [ ! -f "$CKDIR/checkpoint_0.npz" ]; then
  timeout 4500 python -m affnet_tpu.cli.train_affnet --synthetic \
    --epochs 1 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
    --loss HardNegC --descriptor HardNet \
    --desc-weights "$R5HN/checkpoint_7.npz" \
    --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
    --expname $EXP --seed 1 \
    --gen-tilt 6.0 --gen-mesh 2.5 --gen-blur 1.2 \
    > /root/repo/runs/${EXP}.log 2>&1
fi

if [ -f "$CKDIR/checkpoint_0.npz" ]; then
  for PAIR in 4 5 6; do
    LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx $PAIR \
      --nfeats 2000 --fast --do-ori --descriptor HardNet \
      --desc-weights "$R5HN/checkpoint_6.npz" --shape-arch AffNetFast \
      --shape-weights "$CKDIR/checkpoint_0.npz" \
      --ori-weights "$ORI3" 2>/dev/null | grep inl.ratio | tail -1)
    echo "tilt6 ck0 + desc6 graf1-$PAIR: $LINE" >> "$OUT"
  done
fi
echo PHASE6_DONE >> "$OUT"
