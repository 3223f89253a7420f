#!/bin/bash
# r5 xdesc trio: AffNet trained AGAINST the non-planar descriptor
# (runs/r5_xdesc, gen-tilt 4.5 + mesh 2.5 + blur 1.2), evaluated with that
# same descriptor.  Best checkpoint from runs/scan_r5_xdesc_r5desc.log (ck0,
# graf1-4 0.5576).  Full graf1-2..1-6, all-from-scratch weights.
set -x
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
ORI=/root/repo/runs/r3_OriNet_6Brown_TFeat_0.005_200000_HardNet/checkpoint_1.npz
XDESC=/root/repo/runs/r5_xdesc_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
R5DESC=/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz
LOG=/root/repo/runs/trio_r5_xdesc.log
> $LOG

echo "== C: r5_xdesc ck0 + r5 descriptor ==" >> $LOG
timeout 3600 python -m affnet_tpu.cli.eval_graf --all --nfeats 2000 --fast \
  --do-ori --descriptor HardNet --desc-weights "$R5DESC" \
  --shape-arch AffNetFast --shape-weights "$XDESC/checkpoint_0.npz" \
  --ori-weights "$ORI" 2>/dev/null | grep -E "pair|^1-|inl.ratio" >> $LOG
echo TRIO_R5_XDESC_DONE >> $LOG
