#!/bin/bash
# Round-4 chain N: fresh end-of-round bench.py on the chip (the chain-E
# bench CPU-fell-back during the tunnel flake; BENCH JSON should reflect
# the attn_dot default measured on real hardware). Waits on chain M's
# completion marker.
set -x
cd /root/repo
while [ ! -f /tmp/r4m_done.marker ]; do sleep 120; done
rm -f /tmp/r4n_done.marker
echo $$ > /tmp/r4n_chain.pid
trap 'rm -f /tmp/r4n_chain.pid' EXIT

timeout 4800 python bench.py > logs/r4/bench_final_r4.log 2>&1
echo BENCH_EXIT=$?

echo R4N_CHAIN_ALL_DONE
touch /tmp/r4n_done.marker
