#!/bin/bash
# Serialized round-3 chip jobs (SR train-step measurements that were pending
# after the b=32 OOM). Run with run_in_background; each job logs separately.
set -x
LOG=/tmp/r3h_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 3600 python tools/bench_train.py --sr --batch 8 \
  > "$LOG/train_sr_b8.log" 2>&1
timeout 3600 python tools/bench_train.py --sr --batch 8 --remat save_dots \
  > "$LOG/train_sr_b8_savedots.log" 2>&1
timeout 3600 python tools/bench_train.py --sr --batch 16 \
  > "$LOG/train_sr_b16.log" 2>&1
echo ALL_DONE
