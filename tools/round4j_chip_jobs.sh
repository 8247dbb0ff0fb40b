#!/bin/bash
# Round-4 chain J: confirm VIVID_ATTN_DOT as the new DEFAULT (flipped in
# nn/blocks.py after the chain H/I A/B: dot won on every surface — fwd
# 80.4 -> 81.3 TF/s, guided 15.94 -> 16.15 img/s, ch64 train 91.5 -> 89.6 ms,
# flagship 213 -> 210.5 ms). Jobs, most-valuable first so a timeout still
# lands the headline: fresh default bench, cascade A/B both ways (the SR
# stage has not been measured under attn_dot), then whole-model chip parity
# on the default formulation. Writes /tmp/r4j_done.marker as its last act.
set -x
cd /root/repo
rm -f /tmp/r4j_done.marker
echo $$ > /tmp/r4j_chain.pid
trap 'rm -f /tmp/r4j_chain.pid' EXIT

# 1. Fresh headline on the new default (expect ~81.3 TF/s / ~16.1 img/s).
timeout 3600 python bench.py > logs/r4/bench_default_dot.log 2>&1
echo BENCH_DOT_EXIT=$?

# 2/3. Cascade A/B: default (dot) vs conv control.
timeout 5400 python tools/bench_serve.py --what cascade --batch 8 \
    > logs/r4/cascade_dot.log 2>&1
echo CASCADE_DOT_EXIT=$?
VIVID_ATTN_DOT=0 timeout 5400 python tools/bench_serve.py --what cascade \
    --batch 8 > logs/r4/cascade_conv_control.log 2>&1
echo CASCADE_CONV_EXIT=$?

# 4. Whole-model chip parity under the new default formulation.
VIVID_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py \
    -q -k "full_model" > logs/r4/chip_tests_attndot_default.log 2>&1
echo CHIP_FULLMODEL_EXIT=$?

echo R4J_CHAIN_ALL_DONE
touch /tmp/r4j_done.marker
