#!/bin/bash
# Round-4 chain I: grid-scheduled packed forward (VIVID_NOMAX_PACKED,
# kernels/flash.py flash_nomax_packed) chip parity + A/B, plus the missing
# VIVID_ATTN_DOT inference A/B (the r4h bench crashed on a tunnel transport
# error). Controls on this tunnel: fwd 79.96 TF/s / guided 15.94 img/s
# (logs/r4/bench_final.log), flagship train 214.6 ms, ch64 train 91.3 ms.
# Serialized; writes /tmp/r4i_done.marker as its last act (successors wait
# on the MARKER, not a pidfile — CLAUDE.md chain-gating race note).
set -x
cd /root/repo
rm -f /tmp/r4i_done.marker
echo $$ > /tmp/r4i_chain.pid
trap 'rm -f /tmp/r4i_chain.pid' EXIT

# 1. Correctness first: chip parity for the new kernel.
VIVID_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_kernels.py \
    -q -k nomax_packed > logs/r4/chip_tests_nomax_packed.log 2>&1
echo NOMAX_PACKED_PARITY_EXIT=$?

# 2. Headline A/B: pipelined packed forward.
VIVID_NOMAX_PACKED=1 timeout 3600 python bench.py \
    > logs/r4/bench_nomax_packed.log 2>&1
echo BENCH_NOMAX_PACKED_EXIT=$?

# 3. attndot inference A/B (rerun of the crashed r4h job).
VIVID_ATTN_DOT=1 timeout 3600 python bench.py \
    > logs/r4/bench_attndot2.log 2>&1
echo BENCH_ATTNDOT_EXIT=$?

# 4. Combined.
VIVID_NOMAX_PACKED=1 VIVID_ATTN_DOT=1 timeout 3600 python bench.py \
    > logs/r4/bench_nomax_attndot.log 2>&1
echo BENCH_COMBO_EXIT=$?

# 5. Fresh control on the same tunnel-day.
timeout 3600 python bench.py > logs/r4/bench_control_r4i.log 2>&1
echo BENCH_CONTROL_EXIT=$?

# 6. Training A/B: the nomax forward also runs inside the packed custom_vjp
# (backward unchanged), so the train step should see the fwd delta.
VIVID_NOMAX_PACKED=1 timeout 4800 python tools/bench_train.py --ch 64 \
    --batch 32 --remat save_dots > logs/r4/train_ch64_nomax_packed.log 2>&1
echo CH64_NOMAX_EXIT=$?

VIVID_NOMAX_PACKED=1 VIVID_ATTN_DOT=1 timeout 4800 python \
    tools/bench_train.py --flagship --batch 32 --remat save_dots \
    > logs/r4/train_flagship_nomax_attndot.log 2>&1
echo FLAGSHIP_COMBO_EXIT=$?

echo R4I_CHAIN_ALL_DONE
touch /tmp/r4i_done.marker
