#!/bin/bash
# Round-3 pending chip jobs (tunnel was out; run serialized on the one v5e chip).
# Usage: bash tools/round3b_chip_jobs.sh /tmp/r3b_logs
set -x
LOG=${1:-/tmp/r3b_logs}
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. Correctness first: chip-side kernel parity incl. the NEW packed-backward
#    grad-parity tests (op-level self/xattn + whole-model).
VIVID_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
    > "$LOG/tpu_kernels.log" 2>&1

# 1. SR conv-formulation lab (incl. base64 wpack-vs-plain variants j/k).
timeout 1800 python tools/sr_conv_lab.py > "$LOG/sr_conv_lab.log" 2>&1

# 2. SR forward trace, wpack on vs off.
timeout 1800 python tools/trace_fwd.py --what sr --batch 8 --iters 8 --wpack on \
    > "$LOG/trace_sr_wpack_on.log" 2>&1
timeout 1800 python tools/trace_fwd.py --what sr --batch 8 --iters 8 --wpack off \
    > "$LOG/trace_sr_wpack_off.log" 2>&1

# 3. Flagship cascade serving (verdict item 3 target >= 2.0 img/s/chip).
timeout 3600 python tools/bench_serve.py --what cascade --batch 8 \
    > "$LOG/cascade_b8.log" 2>&1

# 4. SR train step, wpack on vs off. (--wpack is required for the on-side:
# after eb48c97 the default is OFF everywhere, so the bare invocation this
# script originally used would have measured an A/A.)
timeout 3600 python tools/bench_train.py --sr --batch 32 --wpack \
    > "$LOG/train_sr_wpack.log" 2>&1
timeout 3600 python tools/bench_train.py --sr --batch 32 --no-wpack \
    > "$LOG/train_sr_nowpack.log" 2>&1

echo ALL_DONE
