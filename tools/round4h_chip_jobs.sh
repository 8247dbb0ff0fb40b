#!/bin/bash
# Round-4 chain H: VIVID_ATTN_DOT=1 A/B — 1x1 attention convs as dots on the
# packed path (nn/blocks.py _attn_dot). Controls measured earlier today on
# this tunnel: flagship train 214.6 ms, ch64 train 91.3 ms, fwd 79.96 TF/s /
# guided 15.94 img/s (logs/r4/train_*_bwdopt2.log, bench_final.log).
# Serialized; writes /tmp/r4h_done.marker as its last act (successor chains
# wait on the MARKER, not a pidfile — see CLAUDE.md chain-gating race note).
set -x
cd /root/repo
rm -f /tmp/r4h_done.marker
echo $$ > /tmp/r4h_chain.pid
trap 'rm -f /tmp/r4h_chain.pid' EXIT

export VIVID_ATTN_DOT=1

timeout 4800 python tools/bench_train.py --flagship --batch 32 --remat save_dots \
    > logs/r4/train_flagship_attndot.log 2>&1
echo FLAGSHIP_ATTNDOT_EXIT=$?

timeout 4800 python tools/bench_train.py --ch 64 --batch 32 --remat save_dots \
    > logs/r4/train_ch64_attndot.log 2>&1
echo CH64_ATTNDOT_EXIT=$?

timeout 3600 python bench.py > logs/r4/bench_attndot.log 2>&1
echo BENCH_ATTNDOT_EXIT=$?

echo R4H_CHAIN_ALL_DONE
touch /tmp/r4h_done.marker
