#!/bin/bash
# Round-5 FINAL chip stage (VERDICT r4 item 9): the README serving protocol
# end-to-end through the PRODUCT CLI — guided flagship base (guidance 1.5 +
# uncond gnet) + 256px SR cascade, 32 steps each, 2000 seeds — to put a
# wall-clock on the full serving story. 2k seeds at the measured 0.56 img/s
# cascade rate ≈ 60 min device time; the result is labeled as a 2k-seed run
# with the 10k protocol extrapolated from the steady rate.
#
# Chains on the COMPLETION MARKER of the post chain (never a pidfile — the
# pidfile pattern races, CLAUDE.md). Writes /tmp/r5_protocol.done last.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r5
mkdir -p "$LOG"
rm -f /tmp/r5_protocol.done

while [ ! -f /tmp/r5_post.done ]; do sleep 120; done

python tools/make_protocol_snapshots.py --outdir /tmp/r5_protocol \
  > "$LOG/protocol_snapshots.log" 2>&1

T0=$(date +%s)
timeout 9000 python generate_images.py \
  --net=/tmp/r5_protocol/base.pkl \
  --gnet=/tmp/r5_protocol/gnet.pkl --guidance=1.5 \
  --sr-model=/tmp/r5_protocol/sr.pkl \
  --data=/tmp/r5_protocol/scenes256 \
  --outdir=/tmp/r5_protocol/out --seeds=0-1999 --batch=8 --steps=32 \
  > "$LOG/protocol_2k.log" 2>&1
EXIT=$?
T1=$(date +%s)
{
  echo "PROTOCOL_EXIT=$EXIT WALL_S=$((T1-T0))"
  ls /tmp/r5_protocol/out | grep -c sample_ || true
} >> "$LOG/protocol_2k.log"

echo "R5_PROTOCOL_DONE"
date > /tmp/r5_protocol.done
