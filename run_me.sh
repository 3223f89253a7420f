#!/bin/bash
# End-to-end bootstrap: dataset download + AffNet training with the
# reference's published configuration (reference run_me.sh:1-9).
#
# The reference trains against a pretrained HardNet++ descriptor; that
# weight file is not shipped in this mount, so the default below uses the
# shipped HardTFeat descriptor (--descriptor TFeat).  To reproduce the
# reference exactly, convert HardNet++.pth with scripts/convert_weights.py
# and pass: --descriptor HardNet --desc-weights weights/HardNetPP.npz
#
# No-network environments: replace the gen_ds + --dataroot lines with
# --synthetic (offline multi-image synthetic pairs; see README "Training
# from scratch").  Long runs on the axon TPU runtime should be split into
# ~4-epoch resumed chunks (runs/chunked_train.sh) — the runtime leaks host
# staging memory per dispatched step.
set -e
mkdir -p dataset/6Brown logs
python -m affnet_tpu.cli.gen_ds --root dataset/6Brown
python -m affnet_tpu.cli.train_affnet --dataroot dataset/6Brown \
    --lr 0.005 --n-pairs 10000000 --batch-size 1024 \
    --descriptor TFeat --arch AffNetFast --loss HardNegC --epochs 20 \
    | tee logs/affnet.log
