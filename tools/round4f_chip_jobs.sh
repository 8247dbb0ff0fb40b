#!/bin/bash
# Round-4 chain F (after chain E): serving-side measurements with the final
# kernel state (shiftless no-max fwd + optimized packed backward, wnorm
# residual save defaulted OFF).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"

for pidfile in /tmp/r4e_chain.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat $pidfile)" 2>/dev/null; do sleep 60; done
  fi
done
echo $$ > /tmp/r4f_chain.pid
trap 'rm -f /tmp/r4f_chain.pid' EXIT

timeout 3600 python tools/trace_fwd.py --what sr --batch 8 \
  > "$LOG/trace_sr_fwd_shiftless.log" 2>&1
echo "SR_TRACE_EXIT=$?"

timeout 4800 python tools/bench_serve.py --what cascade --batch 8 \
  > "$LOG/cascade_b8_shiftless.log" 2>&1
echo "CASCADE_EXIT=$?"

timeout 4800 python tools/bench_serve.py --what sweep --batches 16,32 \
  > "$LOG/guided_sweep_shiftless.log" 2>&1
echo "GUIDED_EXIT=$?"

timeout 4800 python tools/bench_train.py --sr --batch 8 --remat save_dots \
  > "$LOG/sr_train_b8_bwdopt.log" 2>&1
echo "SR_TRAIN_EXIT=$?"

echo "R4F_CHAIN_ALL_DONE"
