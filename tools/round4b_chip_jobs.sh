#!/bin/bash
# Round-4 follower chain (after round4_chip_jobs.sh):
#   1. Flagship train-step trace ATTRIBUTION (VERDICT item 9): fwd conv vs
#      dgrad/wgrad conv vs attention device time.
#   2. SR training with the hires-aware save_dots policy (VERDICT item 4):
#      b=8 (used to OOM with save_dots), b=16 (used to OOM even full remat),
#      and the reference preset batch 128 via gradient accumulation
#      (microbatch 8/16; train_nvs.py:30, training_loop.py:213-217).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"

if [ -f /tmp/r4_chain.pid ]; then
  while kill -0 "$(cat /tmp/r4_chain.pid)" 2>/dev/null; do sleep 60; done
fi
echo $$ > /tmp/r4b_chain.pid
trap 'rm -f /tmp/r4b_chain.pid' EXIT

timeout 3600 python tools/trace_fwd.py --what train --flagship --batch 32 \
  --remat save_dots > "$LOG/trace_train_flagship.log" 2>&1
echo "TRACE_EXIT=$?"

timeout 3600 python tools/bench_train.py --sr --batch 8 --remat save_dots \
  > "$LOG/sr_train_b8_savedots.log" 2>&1
echo "SR8_EXIT=$?"

timeout 3600 python tools/bench_train.py --sr --batch 16 --remat save_dots \
  > "$LOG/sr_train_b16_savedots.log" 2>&1
echo "SR16_EXIT=$?"

timeout 4800 python tools/bench_train.py --sr --batch 128 --batch-gpu 8 \
  --remat save_dots > "$LOG/sr_train_b128_accum8.log" 2>&1
echo "SR128A8_EXIT=$?"

timeout 4800 python tools/bench_train.py --sr --batch 128 --batch-gpu 16 \
  --remat save_dots > "$LOG/sr_train_b128_accum16.log" 2>&1
echo "SR128A16_EXIT=$?"

echo "R4B_CHAIN_ALL_DONE"
