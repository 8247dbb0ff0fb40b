#!/bin/bash
# Session-4 refresh: re-measure every headline number after the packed
# constant-shift softmax landed (e3ecb0b) so BASELINE/PERF/README carry one
# consistent post-nomax story.
set -x
LOG=/tmp/r3i_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# Serialization handle for follower scripts (round3j waits on this PID).
echo $$ > /tmp/r3i_chain.pid
trap 'rm -f /tmp/r3i_chain.pid' EXIT

timeout 1200 python bench.py > "$LOG/bench.log" 2>&1

timeout 2400 python tools/trace_fwd.py --what fwd --flagship --batch 16 \
  --iters 8 > "$LOG/fwd_flagship.log" 2>&1

timeout 3600 python tools/bench_serve.py --what cascade --batch 8 \
  --sr-arch log > "$LOG/cascade_log_b8.log" 2>&1

timeout 3600 python tools/bench_serve.py --what cascade --batch 16 \
  --sr-arch in0 > "$LOG/cascade_in0_b16.log" 2>&1

timeout 3600 python tools/bench_train.py --flagship --remat save_dots \
  --batch 32 > "$LOG/train_flagship.log" 2>&1

timeout 3600 python tools/bench_train.py --ch 64 --remat save_dots \
  --batch 32 > "$LOG/train_ch64.log" 2>&1

echo ALL_DONE
