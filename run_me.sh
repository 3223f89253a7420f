#!/bin/bash
# End-to-end bootstrap: dataset download + descriptor + AffNet training
# with the reference's published configuration (reference run_me.sh:1-9).
#
# The reference trains AffNet against a pretrained HardNet++ descriptor;
# that weight file is not shipped in this mount, so step 1 trains a
# HardNet FROM SCRATCH first (8 epochs, ~15 min wall on a v5e chip with
# --conv-vjp explicit) and step 2 trains AffNet against it — the same
# two-stage semantics as the reference pipeline, with no pretrained
# weights at all.  If you do have HardNet++.pth, convert it with
# scripts/convert_weights.py and skip step 1, passing
# --desc-weights weights/HardNetPP.npz instead.
#
# No-network environments: replace the gen_ds + --dataroot lines with
# --synthetic (offline multi-image synthetic pairs; see README "Training
# from scratch").  Long runs on the axon TPU runtime should be split into
# ~4-epoch resumed chunks (runs/chunked_train.sh) — the runtime leaks host
# staging memory per dispatched step.
set -e
mkdir -p dataset/6Brown logs
python -m affnet_tpu.cli.gen_ds --root dataset/6Brown

python -m affnet_tpu.cli.train_descriptor --dataroot dataset/6Brown \
    --lr 0.1 --n-pairs 500000 --batch-size 1024 --epochs 8 \
    --arch HardNet --loss HardNet --conv-vjp explicit \
    --log-dir logs --expname boot | tee logs/hardnet.log
DESC_CK=$(ls logs/boot_HardNet_desc_*/checkpoint_*.npz | sort -V | tail -1)

python -m affnet_tpu.cli.train_affnet --dataroot dataset/6Brown \
    --lr 0.005 --n-pairs 10000000 --batch-size 1024 \
    --descriptor HardNet --desc-weights "$DESC_CK" \
    --arch AffNetFast --loss HardNegC --epochs 20 --conv-vjp explicit \
    | tee logs/affnet.log
