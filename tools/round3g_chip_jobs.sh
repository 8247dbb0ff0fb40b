#!/bin/bash
# Chain 4: flagship train-step trace (donation fix) for the training-MFU
# attack, after the r3f measurements.
set -x
LOG=/tmp/r3h_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -f /tmp/r3f_chain.pid ]; then
  while kill -0 "$(cat /tmp/r3f_chain.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 3600 python tools/trace_fwd.py --what train --flagship \
  --remat save_dots --batch 32 --iters 4 \
  > "$LOG/trace_train_flagship_b32.log" 2>&1

echo ALL_DONE

timeout 3600 python tools/bigs_attn_lab.py --batch 8 \
  > "$LOG/bigs_attn_lab.log" 2>&1
echo ALL_DONE2
