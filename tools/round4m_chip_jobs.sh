#!/bin/bash
# Round-4 chain M: rerun test_full_model_grad_chip_parity with the default
# env. The chain-J run crashed on a working-tree race (the pick_q_chunk_bwd
# 3-tuple change was committed mid-test, before its attention.py call-site
# edit landed — a stale-import unpack error, not a numerics failure; the 4
# forward full-model tests in the same run passed). Waits on the r5ilv
# marker.
set -x
cd /root/repo
while [ ! -f /tmp/r5ilv_done.marker ]; do sleep 120; done
rm -f /tmp/r4m_done.marker
echo $$ > /tmp/r4m_chain.pid
trap 'rm -f /tmp/r4m_chain.pid' EXIT

VIVID_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_kernels.py \
    -q -k "full_model_grad" > logs/r4/chip_tests_fullmodel_grad_rerun.log 2>&1
echo FULLMODEL_GRAD_EXIT=$?

echo R4M_CHAIN_ALL_DONE
touch /tmp/r4m_done.marker
