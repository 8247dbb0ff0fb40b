#!/bin/bash
# Round-5 layout experiment (the copy/layout pool audit's one actionable
# lever): does compiling the train step with AUTO state layouts — params
# LIVING in the compiler-preferred tiled layout — remove the per-step f32
# weight relayout copies (dominant class of the 19.8 ms pool, see
# logs/r5/train_trace_r5.log "copy/layout pool by (family, shape, src)")?
# Control first, then auto-layout, ch=64 (fast compile) then flagship.
# Chains on /tmp/r5_s2.done; writes /tmp/r5_layout.done last.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r5
mkdir -p "$LOG"
rm -f /tmp/r5_layout.done

while [ ! -f /tmp/r5_s2.done ]; do sleep 120; done

{
  echo "=== ch64 control (save_dots)"
  timeout 2400 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots
  echo "EXIT=$?"
  echo "=== ch64 auto-layout"
  timeout 2400 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots --auto-layout
  echo "EXIT=$?"
  echo "=== flagship control (save_dots)"
  timeout 3000 python tools/bench_train.py --flagship --batch 32 --remat save_dots
  echo "EXIT=$?"
  echo "=== flagship auto-layout"
  timeout 3000 python tools/bench_train.py --flagship --batch 32 --remat save_dots --auto-layout
  echo "EXIT=$?"
} > "$LOG/layout_lab.log" 2>&1

echo "R5_LAYOUT_ALL_DONE"
date > /tmp/r5_layout.done
