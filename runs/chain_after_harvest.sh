#!/bin/bash
# Chain runner: wait for the current seed harvest (pid file) to exit, then
# run the full trio eval on the harvest winner (seed 1 ck0), then harvest
# three more seeds (4..6).  One TPU process at a time throughout.
set -x
HARVEST_PID=$(cat /tmp/seed_harvest.pid 2>/dev/null)
while [ -n "$HARVEST_PID" ] && kill -0 "$HARVEST_PID" 2>/dev/null; do
  sleep 30
done
bash /root/repo/runs/trio_r5_seed1.sh
bash /root/repo/runs/seed_harvest_fast_r5.sh 4 5 6 7 8 9 \
  > /root/repo/runs/seed_harvest_fast_r5.launch.log 2>&1
echo CHAIN_DONE
