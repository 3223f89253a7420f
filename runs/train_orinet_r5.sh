#!/bin/bash
# r5 OriNet: retrain the orientation net on the NON-PLANAR generator
# (mesh warps + blur jitter + tilt 4.5) against the non-planar HardNet
# descriptor, so every net in the from-scratch trio has seen curved-surface
# parallax.  Mirrors the r3 recipe (runs/chain_after_affnet.sh) otherwise:
# 2 epochs, 200k pairs, bs 1024, HardNet loss, lr 0.005 linear decay.
set -x
DESC=${DESC:-/root/repo/runs/r5hn_HardNet_desc_0.1_500000_HardNet/checkpoint_7.npz}
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
timeout 5400 python -m affnet_tpu.cli.train_orinet --synthetic --epochs 2 \
  --n-pairs 200000 --batch-size 1024 --loss HardNet --descriptor HardNet \
  --desc-weights "$DESC" --gen-tilt 4.5 --gen-mesh 2.5 --gen-blur 1.2 \
  --log-dir /root/repo/runs --expname r5 \
  > /root/repo/runs/train_orinet_r5.log 2>&1
echo ORINET_R5_DONE >> /root/repo/runs/train_orinet_r5.log
