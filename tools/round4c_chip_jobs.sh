#!/bin/bash
# Round-4 chain C (after round4b): protocol-scale metrics through the REAL
# on-device InceptionV3 feature path (random weights — the NVIDIA pickle is
# egress-blocked; values are plumbing checks, the compute graph and
# throughput are the real thing).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"

for pidfile in /tmp/r4_chain.pid /tmp/r4b_chain.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat $pidfile)" 2>/dev/null; do sleep 60; done
  fi
done
echo $$ > /tmp/r4c_chain.pid
trap 'rm -f /tmp/r4c_chain.pid' EXIT

SNAP=/tmp/r4_trainA/experiments/network-snapshot-0000038-0.050.pkl
T0=$(date +%s)
VIVID_ALLOW_RANDOM_DETECTOR=1 timeout 3600 python calculate_metrics.py gen \
  --net="$SNAP" --data=/tmp/r4_scenes --num=1024 --batch=32 \
  --metrics=fid,joint_fid,psnr \
  > "$LOG/metrics_gen_1k_jaxinception.log" 2>&1
echo "FID_RANDW_EXIT=$? WALL_S=$(( $(date +%s) - T0 ))"

echo "R4C_CHAIN_ALL_DONE"
