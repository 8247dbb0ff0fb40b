#!/bin/bash
# Round-4 chain K: evidence pass on the new attn_dot default.
# 1. Flagship train-step trace — quantify how much of the 23.4 ms
#    copy/layout class the dot formulation removed (PERF.md table refresh).
# 2. Guided sampler batch sweep (BASELINE.md quotes the per-batch range;
#    the default flip shifts it).
# 3. SR forward trace — the SR stage under the dot formulation.
# Waits on chain J's completion MARKER (not a pidfile — CLAUDE.md race note).
set -x
cd /root/repo
while [ ! -f /tmp/r4j_done.marker ]; do sleep 120; done
rm -f /tmp/r4k_done.marker
echo $$ > /tmp/r4k_chain.pid
trap 'rm -f /tmp/r4k_chain.pid' EXIT

timeout 4800 python tools/trace_fwd.py --what train --flagship --batch 32 \
    --remat save_dots > logs/r4/trace_train_flagship_attndot.log 2>&1
echo TRACE_TRAIN_EXIT=$?

timeout 4800 python tools/bench_serve.py --what sweep \
    > logs/r4/guided_sweep_attndot.log 2>&1
echo GUIDED_SWEEP_EXIT=$?

timeout 4800 python tools/trace_fwd.py --what sr --batch 8 \
    > logs/r4/trace_sr_fwd_attndot.log 2>&1
echo TRACE_SR_EXIT=$?

echo R4K_CHAIN_ALL_DONE
touch /tmp/r4k_done.marker
