#!/bin/bash
# Round-4 chain D: A/B the "wnorm" save_dots policy extension (save the
# per-conv normalized weights so the backward recompute skips the fp32
# weight re-normalization). Control runs with VIVID_NO_SAVE_WNORM=1.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"

for pidfile in /tmp/r4c_chain.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat $pidfile)" 2>/dev/null; do sleep 60; done
  fi
done
echo $$ > /tmp/r4d_chain.pid
trap 'rm -f /tmp/r4d_chain.pid' EXIT

timeout 4800 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
  > "$LOG/train_flagship_wnorm.log" 2>&1
echo "FLAGSHIP_WNORM_EXIT=$?"

VIVID_NO_SAVE_WNORM=1 timeout 4800 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
  > "$LOG/train_flagship_nownorm.log" 2>&1
echo "FLAGSHIP_CTRL_EXIT=$?"

timeout 4800 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
  > "$LOG/train_ch64_wnorm.log" 2>&1
echo "CH64_WNORM_EXIT=$?"

timeout 4800 python tools/bench_train.py --sr --batch 8 --remat save_dots \
  > "$LOG/sr_train_b8_wnorm.log" 2>&1
echo "SR_WNORM_EXIT=$?"

echo "R4D_CHAIN_ALL_DONE"
