#!/bin/bash
# Round-5 post-longrun chip chain. Waits on the longrun COMPLETION MARKER
# (never a pidfile — the pidfile pattern races, CLAUDE.md), then runs the
# serialized measurement set:
#   A. bench.py full headline row -> BENCH JSON + log   (VERDICT item 3)
#   B. SR microbatch-16 HBM attack: compile-only memory accounting at the
#      default + tightened hires-remat thresholds, then real steps for any
#      variant whose static peak fits                    (VERDICT item 5)
#   C. guided b=32 vs b=64 serving anomaly: static memory accounting of the
#      sampler programs                                  (VERDICT item 3b)
#   D. chip kernel/parity test suite                     (VERDICT item 8)
# Each job appends to its own log; the chain writes /tmp/r5_post.done last.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r5
mkdir -p "$LOG"
rm -f /tmp/r5_post.done

while [ ! -f /tmp/r5_longrun.done ]; do sleep 120; done

# ---- A: headline bench -------------------------------------------------------
python bench.py > "$LOG/bench_r5.log" 2>&1
grep '^{"metric"' "$LOG/bench_r5.log" | tail -1 > /root/repo/BENCH_r05.json || true

# ---- B: SR microbatch-16 -----------------------------------------------------
{
  echo "=== static accounting: mb8 save_dots (known-good control)"
  python tools/mem_report.py --sr --batch 8 --remat save_dots
  echo "=== static accounting: mb16 save_dots default hires threshold (the OOM)"
  python tools/mem_report.py --sr --batch 16 --remat save_dots
  echo "=== static accounting: mb16 save_dots hires<=64px"
  VIVID_REMAT_HIRES_AREA=4096 python tools/mem_report.py --sr --batch 16 --remat save_dots
  echo "=== static accounting: mb16 full remat"
  python tools/mem_report.py --sr --batch 16 --remat true
} > "$LOG/sr_mb16_mem.log" 2>&1

{
  echo "=== real steps: mb16 save_dots hires<=64px"
  VIVID_REMAT_HIRES_AREA=4096 timeout 3000 python tools/bench_train.py --sr --batch 16 --remat save_dots
  echo "EXIT=$?"
  echo "=== real steps: mb16 full remat"
  timeout 3000 python tools/bench_train.py --sr --batch 16 --remat true
  echo "EXIT=$?"
  echo "=== control: mb8 save_dots"
  timeout 3000 python tools/bench_train.py --sr --batch 8 --remat save_dots
  echo "EXIT=$?"
} > "$LOG/sr_mb16_steps.log" 2>&1

# ---- C: guided b=32 vs b=64 static accounting ---------------------------------
python tools/guided_mem.py > "$LOG/guided_b64_mem.log" 2>&1

# ---- C2: flagship train trace for the copy/layout pool audit ------------------
python tools/trace_fwd.py --what train --flagship --remat save_dots --iters 6 \
  --trace /tmp/r5_tt > "$LOG/train_trace_r5.log" 2>&1

# ---- D: chip test suite --------------------------------------------------------
VIVID_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
  > "$LOG/chip_tests_r5.log" 2>&1
echo "CHIP_TESTS_EXIT=$?"

echo "R5_POST_ALL_DONE"
date > /tmp/r5_post.done
