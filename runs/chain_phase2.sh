#!/bin/bash
set -x
P=$(cat /tmp/chain2.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
bash /root/repo/runs/phase2_r5.sh > /root/repo/runs/phase2_r5.launch.log 2>&1
echo PHASE2_CHAIN_DONE
