#!/bin/bash
# r5 phase 3 — exploit the phase-2 findings (desc ck6 > ck7 on graf1-4):
#  A. graf1-4 scans to finish the combo matrix: (ori seed2 ck1 x desc ck6)
#     interaction, and desc ck4 to confirm the ck5<ck6>ck7 peak shape.
#  B. Full 5-pair trios with desc ck6 for the two AffNet candidates
#     (seed1 ck0 = graf1-4 winner; seed2 ck0 = most balanced row).
set -x
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R5HN=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet
ORI3=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
ORIS2=/root/repo/runs/r3s2_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
AFF1=/root/repo/runs/r5_seed1_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
AFF2=/root/repo/runs/r5_seed2_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
OUT=/root/repo/runs/phase3_r5.log

scan14 () {  # $1=shape ck  $2=ori ck  $3=desc ck  $4=tag
  LINE=$(timeout 2400 python -m affnet_tpu.cli.eval_graf --img2-idx 4 \
    --nfeats 2000 --fast --do-ori --descriptor HardNet \
    --desc-weights "$3" --shape-arch AffNetFast --shape-weights "$1" \
    --ori-weights "$2" 2>/dev/null | grep inl.ratio | tail -1)
  echo "$4 graf1-4: $LINE" >> "$OUT"
}

trio () {  # $1=shape ck  $2=ori ck  $3=desc ck  $4=log
  echo "== $1 + $2 + $3 ==" > "$4"
  timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 \
    --fast --do-ori --descriptor HardNet --desc-weights "$3" \
    --shape-arch AffNetFast --shape-weights "$1" \
    --ori-weights "$2" 2>/dev/null | grep -E "^1-" >> "$4"
  echo DONE >> "$4"
}

> "$OUT"
scan14 "$AFF1" "$ORIS2" "$R5HN/checkpoint_6.npz" "A:oriS2ck1+desc6"
scan14 "$AFF1" "$ORI3"  "$R5HN/checkpoint_4.npz" "A:desc ck4"
trio "$AFF1" "$ORI3" "$R5HN/checkpoint_6.npz" /root/repo/runs/trio_r5_seed1_desc6.log
trio "$AFF2" "$ORI3" "$R5HN/checkpoint_6.npz" /root/repo/runs/trio_r5_seed2_desc6.log
echo PHASE3_DONE >> "$OUT"
