#!/bin/bash
# Round-3 serialized chip jobs (one v5e chip — run one at a time).
# Usage: bash tools/round3_chip_jobs.sh /tmp/r3_logs
set -x
LOG=${1:-/tmp/r3_logs}
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. Train-step benchmarks with the packed backward now on the train path:
#    remat combos at ch=64 and flagship (verdict item 2 targets:
#    ch=64 <= 125 ms, flagship <= 300 ms).
python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
    > "$LOG/train_ch64_savedots.log" 2>&1
python tools/bench_train.py --ch 64 --batch 32 --remat true \
    > "$LOG/train_ch64_full.log" 2>&1
python tools/bench_train.py --flagship --batch 32 --remat save_dots \
    > "$LOG/train_flagship_savedots.log" 2>&1

# 2. SR serving-stage trace (verdict item 3).
python tools/trace_fwd.py --what sr --batch 8 --iters 8 \
    > "$LOG/trace_sr.log" 2>&1

# 3. Overfit convergence demonstration (verdict item 7).
python tools/overfit_smoke.py --steps 300 --out docs/overfit_smoke.json \
    > "$LOG/overfit.log" 2>&1

echo DONE
