#!/bin/bash
# Round-5 chain: VIVID_BWD_ILV=2 chip A/B — statically-unrolled query-chunk
# bodies in the packed backward kernels (the "remaining backward-kernel
# lead" in docs/PERF.md). Controls (attn_dot default, 2026-08-19): ch64
# train 89.6 ms, flagship 210.5 ms. Win condition: backward-schedule overlap
# must beat the serial-chunking penalty (whole-row -> fori_loop chunking
# measured -4%); a Mosaic VMEM OOM on compile is an acceptable negative
# result (flag stays off). CPU parity: tests/test_bwd_ilv.py (6/6).
# Waits on chain K's completion marker.
set -x
cd /root/repo
while [ ! -f /tmp/r4k_done.marker ]; do sleep 120; done
rm -f /tmp/r5ilv_done.marker
echo $$ > /tmp/r5ilv_chain.pid
trap 'rm -f /tmp/r5ilv_chain.pid' EXIT

# 1. Chip parity + Mosaic-compile probe for the static-chunk path.
VIVID_BWD_ILV=2 VIVID_TPU_TESTS=1 timeout 3600 python -m pytest \
    tests/test_tpu_kernels.py -q -k "packed_bwd or full_model_grad" \
    > logs/r4/chip_tests_bwd_ilv2.log 2>&1
echo ILV2_PARITY_EXIT=$?

# 2/3. Train-step A/B.
VIVID_BWD_ILV=2 timeout 4800 python tools/bench_train.py --ch 64 \
    --batch 32 --remat save_dots > logs/r4/train_ch64_ilv2.log 2>&1
echo CH64_ILV2_EXIT=$?
VIVID_BWD_ILV=2 timeout 4800 python tools/bench_train.py --flagship \
    --batch 32 --remat save_dots > logs/r4/train_flagship_ilv2.log 2>&1
echo FLAGSHIP_ILV2_EXIT=$?

echo R5ILV_CHAIN_ALL_DONE
touch /tmp/r5ilv_done.marker
