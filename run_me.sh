#!/bin/bash
# End-to-end bootstrap: dataset download + AffNet training with the
# reference's published configuration (reference run_me.sh:1-9).
set -e
mkdir -p dataset/6Brown logs
python -m affnet_tpu.cli.gen_ds --root dataset/6Brown
python -m affnet_tpu.cli.train_affnet --dataroot dataset/6Brown \
    --lr 0.005 --n-pairs 10000000 --batch-size 1024 \
    --descriptor HardNet --arch AffNetFast --loss HardNegC --epochs 20 \
    | tee logs/affnet.log
