#!/bin/bash
# Round-5 final chip stage: reruns the train-trace attribution with the
# CORRECT trace_fwd invocation (the post-chain passed --trace as an output
# path; --trace means "analyze an existing trace file") and runs the
# warm-restart cost profiler (round-4 verdict weak item 7).
# Chains on /tmp/r5_protocol.done; writes /tmp/r5_final.done last.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r5
mkdir -p "$LOG"
rm -f /tmp/r5_final.done

while [ ! -f /tmp/r5_protocol.done ]; do sleep 120; done

timeout 3600 python tools/trace_fwd.py --what train --flagship \
  --remat save_dots --batch 32 --iters 4 \
  > "$LOG/train_trace_r5.log" 2>&1
echo "TRACE_EXIT=$?"

timeout 1800 python tools/warm_restart_profile.py \
  > "$LOG/warm_restart.log" 2>&1
echo "WARM_RESTART_EXIT=$?"

echo "R5_FINAL_ALL_DONE"
date > /tmp/r5_final.done
