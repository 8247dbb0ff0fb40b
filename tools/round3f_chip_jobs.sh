#!/bin/bash
# Chain 3: whole-row-envelope backward restore check + the log-parity SR
# architecture measurements (SR arch archaeology: bench_serve.sr_config).
set -x
LOG=/tmp/r3h_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -f /tmp/r3e_chain.pid ]; then
  while kill -0 "$(cat /tmp/r3e_chain.pid)" 2>/dev/null; do sleep 30; done
fi

# Whole-row restored inside the proven envelope: expect ~89.7 / ~210.5 ms.
timeout 3600 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
  > "$LOG/train_ch64_b32_wholerow.log" 2>&1
timeout 3600 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
  > "$LOG/train_flagship_b32_wholerow.log" 2>&1

# Log-parity SR (57.55M, extra_attn=1, 1532 GF/img): train, fwd trace, cascade.
timeout 3600 python tools/bench_train.py --sr --batch 8 \
  > "$LOG/train_sr_b8_logarch.log" 2>&1
timeout 3600 python tools/bench_train.py --sr --batch 16 \
  > "$LOG/train_sr_b16_logarch.log" 2>&1
timeout 3600 python tools/trace_fwd.py --what sr --batch 8 --iters 8 \
  > "$LOG/trace_sr_logarch.log" 2>&1
timeout 5400 python tools/bench_serve.py --what cascade --batch 8 \
  > "$LOG/cascade_b8_logarch.log" 2>&1
timeout 5400 python tools/bench_serve.py --what cascade --batch 16 \
  > "$LOG/cascade_b16_logarch.log" 2>&1

echo ALL_DONE
