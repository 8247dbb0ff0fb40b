#!/bin/bash
# Round-4 chain G (after chain F): validate + measure the REVISED packed
# backward (dpt dot kept independent of the softmax chain, commit 77bfb78).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"

for pidfile in /tmp/r4e_chain.pid /tmp/r4f_chain.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat $pidfile)" 2>/dev/null; do sleep 60; done
  fi
done
echo $$ > /tmp/r4g_chain.pid
trap 'rm -f /tmp/r4g_chain.pid' EXIT

VIVID_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
  > "$LOG/chip_tests_bwdopt2.log" 2>&1
echo "CHIP_TESTS2_EXIT=$?"

timeout 4800 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
  > "$LOG/train_flagship_bwdopt2.log" 2>&1
echo "FLAGSHIP_BWDOPT2_EXIT=$?"

timeout 4800 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
  > "$LOG/train_ch64_bwdopt2.log" 2>&1
echo "CH64_BWDOPT2_EXIT=$?"

echo "R4G_CHAIN_ALL_DONE"
