#!/bin/bash
# r5 phase 5 — publish-grade evals for the phase-4 winners, then the final
# bench.  Waits for phase 4 (one TPU process at a time).
#  A. Full 5-pair trio for the new graf1-4 best: AffNet r5_a6 ck0 (trained
#     AGAINST desc ck6) + r3 OriNet ck1 + desc ck7 (0.6138 on the scan).
#  B. Full trio for seed3 ck0 + desc ck6 (seed3 had the best 1-2/1-5 with
#     ck7; check whether ck6 keeps that balance).
#  C. bench.py on the now-free chip.
set -x
P=$(cat /tmp/phase4.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R5HN=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet
ORI3=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
A6=/root/repo/runs/r5_a6_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz
AFF3=/root/repo/runs/r5_seed3_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC/checkpoint_0.npz

trio () {  # $1=shape ck  $2=desc ck  $3=log
  echo "== $1 + $ORI3 + $2 ==" > "$3"
  timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 \
    --fast --do-ori --descriptor HardNet --desc-weights "$2" \
    --shape-arch AffNetFast --shape-weights "$1" \
    --ori-weights "$ORI3" 2>/dev/null | grep -E "^1-" >> "$3"
  echo DONE >> "$3"
}

trio "$A6"  "$R5HN/checkpoint_7.npz" /root/repo/runs/trio_r5_a6_desc7.log
trio "$AFF3" "$R5HN/checkpoint_6.npz" /root/repo/runs/trio_r5_seed3_desc6.log

timeout 1800 python /root/repo/bench.py > /root/repo/runs/bench_r5_final.log 2>&1
echo PHASE5_DONE
