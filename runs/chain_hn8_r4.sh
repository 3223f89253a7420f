#!/bin/bash
# r4 endgame: retrain AffNet AGAINST the from-scratch HardNet descriptor —
# the reference's canonical configuration (run_me.sh: AffNet trained with a
# HardNet descriptor), now with both networks from scratch on synthetic data.
# 8 epochs total (AffNet quality plateaus by epoch ~4 in every prior run),
# chunked every 4 epochs around the axon host-staging leak; --total-epochs
# keeps the global LR schedule.  Descriptor-eval stage of chain_hardnet_r4.sh
# is skipped: that table is already in README (from-scratch HardNet vs SIFT).
set -x
DESC=/root/repo/runs/r4_HardNet_desc_0.1_500000_HardNet
DESC_CK=$(ls $DESC/checkpoint_*.npz | sort -V | tail -1)
CKDIR=/root/repo/runs/r4_HN_AffNetFast_6Brown_HardNet_0.005_500000_HardNegC
LOG=/root/repo/runs/chain_hardnet_r4.log
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "== AffNet vs from-scratch HardNet: 8 epochs ==" > $LOG
# Chunk boundaries derive from the last checkpoint on disk (a chunk killed
# mid-run resumes where it left off), looping until epoch 7 exists or no
# progress is made (ADVICE r4: a fixed two-iteration loop could silently
# finish with fewer than 8 epochs).
while [ ! -f "$CKDIR/checkpoint_7.npz" ]; do
  RESUME=""
  LAST=""
  if [ -d "$CKDIR" ] && ls $CKDIR/checkpoint_*.npz >/dev/null 2>&1; then
    LAST=$(ls $CKDIR/checkpoint_*.npz | sort -V | tail -1)
    RESUME="--resume $LAST"
  fi
  timeout 3000 python -m affnet_tpu.cli.train_affnet --synthetic \
    --epochs 4 --total-epochs 8 --n-pairs 500000 --batch-size 1024 \
    --loss HardNegC --descriptor HardNet --desc-weights "$DESC_CK" \
    --lr 0.005 --conv-vjp explicit --log-dir /root/repo/runs \
    --expname r4_HN $RESUME >> $LOG 2>&1
  NEW=$(ls $CKDIR/checkpoint_*.npz 2>/dev/null | sort -V | tail -1)
  if [ "$NEW" == "$LAST" ]; then
    echo "chain_hn8: no progress (last=$LAST), aborting" >> $LOG
    exit 1
  fi
done
echo "chain_hn8 done" >> $LOG
