#!/bin/bash
# Round-3 continuation chip jobs. Waits for the r3c SR-train chain to finish
# (single chip — chip jobs must serialize), then measures batch-scaling and
# traces the flagship train step.
set -x
LOG=/tmp/r3h_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Serialize behind the r3c chain.
if [ -f /tmp/r3c_chain.pid ]; then
  while kill -0 "$(cat /tmp/r3c_chain.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 3600 python tools/bench_train.py --flagship --batch 64 \
  --remat save_dots > "$LOG/train_flagship_b64_savedots.log" 2>&1
timeout 3600 python tools/bench_serve.py --what cascade --batch 32 \
  > "$LOG/cascade_b32.log" 2>&1
timeout 3600 python tools/trace_fwd.py --what train --flagship \
  --remat save_dots --batch 32 --iters 4 \
  > "$LOG/trace_train_flagship.log" 2>&1
echo ALL_DONE
