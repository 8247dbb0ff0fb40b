#!/bin/bash
# Follower of round3i: guided-sampler batch sweep post-nomax, after the
# main refresh chain finishes.
set -x
LOG=/tmp/r3i_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -f /tmp/r3i_chain.pid ]; then
  while kill -0 "$(cat /tmp/r3i_chain.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 3600 python tools/bench_serve.py --what sweep --batches 16,32,64 \
  > "$LOG/guided_sweep.log" 2>&1

echo SWEEP_DONE
