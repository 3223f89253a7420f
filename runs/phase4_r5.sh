#!/bin/bash
# r5 phase 4 — two training-side levers left open by phases 2-3:
#  A. Descriptor-matched AffNet: every AffNet so far trained against r5hn
#     ck7 but evals best with ck6 (0.6006 vs 0.5966).  Train the seed-1
#     recipe against ck6 itself and scan ck0 vs ck5/ck6/ck7.
#  B. Descriptor seed: the AffNet seed spread was 0.49-0.60; the
#     descriptor's seed dimension was never sampled.  Train r5hn recipe at
#     seed 1 (8 epochs, non-planar gen), then an AffNet against it, scan.
# Waits for the phase-3 trios (one TPU process at a time).
set -x
P=$(cat /tmp/phase3.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R5HN=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet
ORI3=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
OUT=/root/repo/runs/phase4_r5.log
> "$OUT"

scan14 () {  # $1=shape ck  $2=desc ck  $3=tag
  LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx 4 \
    --nfeats 2000 --fast --do-ori --descriptor HardNet \
    --desc-weights "$2" --shape-arch AffNetFast --shape-weights "$1" \
    --ori-weights "$ORI3" 2>/dev/null | grep inl.ratio | tail -1)
  echo "$3 graf1-4: $LINE" >> "$OUT"
}

train_aff () {  # $1=expname  $2=desc ck
  CKDIR=/root/repo/runs/${1}_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
  if [ ! -f "$CKDIR/checkpoint_0.npz" ]; then
    timeout 4500 python -m affnet_tpu.cli.train_affnet --synthetic \
      --epochs 1 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
      --loss HardNegC --descriptor HardNet --desc-weights "$2" \
      --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
      --expname "$1" --seed 1 \
      --gen-tilt 4.5 --gen-mesh 2.5 --gen-blur 1.2 \
      > /root/repo/runs/${1}.log 2>&1
  fi
}

# --- A: AffNet trained against desc ck6 ---
train_aff r5_a6 "$R5HN/checkpoint_6.npz"
A6=/root/repo/runs/r5_a6_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
if [ -f "$A6" ]; then
  scan14 "$A6" "$R5HN/checkpoint_6.npz" "A:aff-vs-ck6 + desc6"
  scan14 "$A6" "$R5HN/checkpoint_5.npz" "A:aff-vs-ck6 + desc5"
  scan14 "$A6" "$R5HN/checkpoint_7.npz" "A:aff-vs-ck6 + desc7"
fi

# --- B: descriptor seed 1 (r5hn recipe), chunked like train_descriptor_r5 ---
DS1DIR=/root/repo/runs/r5hns1_HardNet_desc_0.1_500000_HardNet
while [ ! -f "$DS1DIR/checkpoint_7.npz" ]; do
  RESUME=""; LAST=""
  if ls $DS1DIR/checkpoint_*.npz >/dev/null 2>&1; then
    LAST=$(ls $DS1DIR/checkpoint_*.npz | sort -V | tail -1)
    RESUME="--resume $LAST"
  fi
  timeout 3000 python -m affnet_tpu.cli.train_descriptor --synthetic \
    --epochs 4 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
    --loss HardNet --arch HardNet --lr 0.1 --seed 1 --conv-vjp explicit \
    --gen-mesh 2.5 --gen-blur 1.2 \
    --log-dir /root/repo/runs --expname r5hns1 $RESUME \
    >> /root/repo/runs/r5hns1_desc.log 2>&1
  NEW=$(ls $DS1DIR/checkpoint_*.npz 2>/dev/null | sort -V | tail -1)
  if [ "$NEW" == "$LAST" ]; then
    echo "B: desc seed1 no progress (last=$LAST), aborting" >> "$OUT"
    break
  fi
done

if [ -f "$DS1DIR/checkpoint_7.npz" ]; then
  train_aff r5_as1 "$DS1DIR/checkpoint_7.npz"
  AS1=/root/repo/runs/r5_as1_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
  if [ -f "$AS1" ]; then
    for CK in 5 6 7; do
      scan14 "$AS1" "$DS1DIR/checkpoint_${CK}.npz" "B:aff-vs-hns1 + hns1ck${CK}"
    done
  fi
fi
echo PHASE4_DONE >> "$OUT"
