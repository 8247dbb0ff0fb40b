#!/bin/bash
# Round-4 chain E (after chain D): validate + measure the optimized packed
# attention BACKWARD kernels (scale-fold + shiftless no-max + division
# elimination, commit 6b47af8). Kernel parity on the chip FIRST, then
# train-step benchmarks and a fresh trace attribution.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"

for pidfile in /tmp/r4d_chain.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat $pidfile)" 2>/dev/null; do sleep 60; done
  fi
done
echo $$ > /tmp/r4e_chain.pid
trap 'rm -f /tmp/r4e_chain.pid' EXIT

VIVID_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
  > "$LOG/chip_tests_bwdopt.log" 2>&1
echo "CHIP_TESTS_EXIT=$?"

timeout 4800 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
  > "$LOG/train_flagship_bwdopt.log" 2>&1
echo "FLAGSHIP_BWDOPT_EXIT=$?"

timeout 4800 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
  > "$LOG/train_ch64_bwdopt.log" 2>&1
echo "CH64_BWDOPT_EXIT=$?"

timeout 4800 python tools/trace_fwd.py --what train --flagship --batch 32 \
  --remat save_dots > "$LOG/trace_train_flagship_bwdopt.log" 2>&1
echo "TRACE_EXIT=$?"

timeout 2400 python bench.py > "$LOG/bench_postbwdopt.log" 2>&1
echo "BENCH_EXIT=$?"

echo "R4E_CHAIN_ALL_DONE"
