#!/bin/bash
# r5 phase 2 — three cheap quality levers, run sequentially after the seed
# harvest (one TPU process at a time):
#
#  A. "Longer epoch 0": every seed's best AffNet checkpoint is ck0 (the
#     early high-LR epoch), so instead of more epochs, give epoch 0 more
#     pairs at the SAME schedule position (--n-pairs 1M/2M with
#     --total-epochs 8 ends ck0 at the same LR point with 2x/4x the
#     steps).  Seed 1 (the harvest winner) config otherwise.
#  B. OriNet seed harvest: the r3 OriNet (planar gen, TFeat desc, 2
#     epochs, seed 0, ck1) is used in every trio but its seed dimension
#     was never sampled.  Seeds 1-2, scan ck0+ck1 each.
#  C. Descriptor checkpoint scan: the trio uses r5hn ck7 (last) — scan
#     ck5/ck6 with the best AffNet (AffNet was trained against ck7, so
#     mismatch may hurt; measuring is 2 evals).
set -x
DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
BESTAFF=/root/repo/runs/r5_seed1_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

scan14 () {  # $1=shape ck  $2=ori ck  $3=desc ck  $4=tag
  LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx 4 \
    --nfeats 2000 --fast --do-ori --descriptor HardNet \
    --desc-weights "$3" --shape-arch AffNetFast --shape-weights "$1" \
    --ori-weights "$2" 2>/dev/null | grep inl.ratio | tail -1)
  echo "$4 graf1-4: $LINE" >> /root/repo/runs/phase2_r5.log
}

> /root/repo/runs/phase2_r5.log

# --- A: longer epoch 0 at 1M and 2M pairs (seed 1) ---
for NP in 1000000 2000000; do
  EXP=r5_big${NP}
  CKDIR=/root/repo/runs/${EXP}_AffNetFast_6Brown_HardNet_0.005_${NP}_HardNegC
  if [ ! -f "$CKDIR/checkpoint_0.npz" ]; then
    timeout 4500 python -m affnet_tpu.cli.train_affnet --synthetic \
      --epochs 1 --total-epochs 8 --n-pairs $NP --batch-size 1024 \
      --loss HardNegC --descriptor HardNet --desc-weights "$DESC" \
      --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
      --expname $EXP --seed 1 \
      --gen-tilt 4.5 --gen-mesh 2.5 --gen-blur 1.2 \
      > /root/repo/runs/${EXP}.log 2>&1
  fi
  [ -f "$CKDIR/checkpoint_0.npz" ] && \
    scan14 "$CKDIR/checkpoint_0.npz" "$ORI" "$DESC" "A:big${NP} ck0"
done

# --- B: OriNet seed harvest (r3 recipe, planar gen, TFeat desc) ---
for S in 1 2; do
  EXP=r3s${S}
  CKDIR=/root/repo/runs/${EXP}_OriNet_6Brown_TFeat_0.005_200000_HardNet
  if [ ! -f "$CKDIR/checkpoint_1.npz" ]; then
    timeout 4500 python -m affnet_tpu.cli.train_orinet --synthetic \
      --epochs 2 --n-pairs 200000 --batch-size 1024 --loss HardNet \
      --descriptor TFeat --seed $S --no-vis \
      --log-dir /root/repo/runs --expname $EXP \
      > /root/repo/runs/train_orinet_${EXP}.log 2>&1
  fi
  for CK in 0 1; do
    [ -f "$CKDIR/checkpoint_${CK}.npz" ] && \
      scan14 "$BESTAFF" "$CKDIR/checkpoint_${CK}.npz" "$DESC" \
        "B:orinet seed${S} ck${CK}"
  done
done

# --- C: descriptor checkpoint scan (ck5, ck6 vs the ck7 in use) ---
for CK in 5 6; do
  DCK=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_${CK}.npz
  [ -f "$DCK" ] && scan14 "$BESTAFF" "$ORI" "$DCK" "C:desc ck${CK}"
done

echo PHASE2_DONE >> /root/repo/runs/phase2_r5.log
