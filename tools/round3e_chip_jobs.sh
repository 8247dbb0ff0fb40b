#!/bin/bash
# Post-chunked-backward re-measurements (commit c61a504). The gate
# recalibration puts every production shape back on the packed Pallas
# backward (incl. SR H=8 training, whose composite fallback measured
# 1730 ms/step at b=8), so all train numbers need fresh chip truth.
set -x
LOG=/tmp/r3h_logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# Kernel correctness first: the chunked backward has never run on the chip.
timeout 3600 python tools/chip_kernel_smoke.py \
  > "$LOG/smoke_chunked.log" 2>&1

# Headline train steps (expect ~89.7 ms / ~210.5 ms as before the gate bug).
timeout 3600 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
  > "$LOG/train_ch64_b32_savedots2.log" 2>&1
timeout 3600 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
  > "$LOG/train_flagship_b32_savedots2.log" 2>&1

# SR train now rides the packed backward (save_dots OOMs HBM at 256px: the
# kept conv outputs alone exceed the budget — full remat is the SR mode).
timeout 3600 python tools/bench_train.py --sr --batch 8 \
  > "$LOG/train_sr_b8_packed.log" 2>&1
timeout 3600 python tools/bench_train.py --sr --batch 16 \
  > "$LOG/train_sr_b16_packed.log" 2>&1

# Grad-parity suite on the chip (non-vacuous again after the gate fix).
timeout 3600 env VIVID_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q \
  > "$LOG/tpu_kernel_tests.log" 2>&1

# Flagship train trace at b=16 (b=32 OOMs without donation in the tracer).
timeout 3600 python tools/trace_fwd.py --what train --flagship \
  --remat save_dots --batch 16 --iters 4 \
  > "$LOG/trace_train_flagship_b16.log" 2>&1

echo ALL_DONE
