#!/bin/bash
# r5 phase 7 — tilt-matched descriptor: r5hn was trained at the default
# --gen-tilt 3.0 (only mesh/blur raised); the AffNet it supervises trains
# on tilt 4.5.  Train a descriptor at tilt 4.5 (r5hnt45), an AffNet
# against its ck7, and scan ck5/6/7 on graf1-4.
set -x
P=$(cat /tmp/phase6.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
ORI3=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
OUT=/root/repo/runs/phase7_r5.log
> "$OUT"

DDIR=/root/repo/runs/r5hnt45_HardNet_desc_0.1_500000_HardNet
while [ ! -f "$DDIR/checkpoint_7.npz" ]; do
  RESUME=""; LAST=""
  if ls $DDIR/checkpoint_*.npz >/dev/null 2>&1; then
    LAST=$(ls $DDIR/checkpoint_*.npz | sort -V | tail -1)
    RESUME="--resume $LAST"
  fi
  timeout 3000 python -m affnet_tpu.cli.train_descriptor --synthetic \
    --epochs 4 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
    --loss HardNet --arch HardNet --lr 0.1 --conv-vjp explicit \
    --gen-tilt 4.5 --gen-mesh 2.5 --gen-blur 1.2 \
    --log-dir /root/repo/runs --expname r5hnt45 $RESUME \
    >> /root/repo/runs/r5hnt45_desc.log 2>&1
  NEW=$(ls $DDIR/checkpoint_*.npz 2>/dev/null | sort -V | tail -1)
  if [ "$NEW" == "$LAST" ]; then
    echo "desc r5hnt45 no progress (last=$LAST), aborting" >> "$OUT"
    break
  fi
done

if [ -f "$DDIR/checkpoint_7.npz" ]; then
  EXP=r5_at45
  CKDIR=/root/repo/runs/${EXP}_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
  if [ ! -f "$CKDIR/checkpoint_0.npz" ]; then
    timeout 4500 python -m affnet_tpu.cli.train_affnet --synthetic \
      --epochs 1 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
      --loss HardNegC --descriptor HardNet \
      --desc-weights "$DDIR/checkpoint_7.npz" \
      --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
      --expname $EXP --seed 1 \
      --gen-tilt 4.5 --gen-mesh 2.5 --gen-blur 1.2 \
      > /root/repo/runs/${EXP}.log 2>&1
  fi
  if [ -f "$CKDIR/checkpoint_0.npz" ]; then
    for CK in 5 6 7; do
      LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx 4 \
        --nfeats 2000 --fast --do-ori --descriptor HardNet \
        --desc-weights "$DDIR/checkpoint_${CK}.npz" --shape-arch AffNetFast \
        --shape-weights "$CKDIR/checkpoint_0.npz" \
        --ori-weights "$ORI3" 2>/dev/null | grep inl.ratio | tail -1)
      echo "at45 ck0 + t45desc${CK} graf1-4: $LINE" >> "$OUT"
    done
  fi
fi
echo PHASE7_DONE >> "$OUT"
