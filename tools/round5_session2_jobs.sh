#!/bin/bash
# Round-5 session-2 chip chain: the final-stage jobs queued at the end of the
# previous session that never executed (host recycled mid-chain):
#   0. tunnel-wait probe loop (outage pattern from CLAUDE.md)
#   A. chip kernel/parity test suite            (VERDICT item 8 — mandatory ritual)
#   B. corrected flagship train-trace           (r5 attribution; --trace is an
#      ANALYZE flag, so capture without it)
#   C. warm-restart cost profiler               (VERDICT weak item 7)
#   D. README serving protocol, 2k seeds through the product CLI
#      (VERDICT item 9; 10k extrapolated from the steady rate)
# One serial script — no marker races possible. Writes /tmp/r5_s2.done last.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r5
mkdir -p "$LOG"
rm -f /tmp/r5_s2.done

# ---- 0: wait for the tunnel (probe in a subprocess; up to 30 min) -----------
for i in $(seq 1 10); do
  if timeout 300 python -u -c "
import jax, numpy as np
x = jax.numpy.ones((8, 8))
print('TUNNEL_OK', float(np.asarray((x @ x)[0, 0])))
" >> "$LOG/s2_tunnel_probe.log" 2>&1; then
    break
  fi
  echo "probe $i failed; sleeping 180" >> "$LOG/s2_tunnel_probe.log"
  sleep 180
done

# ---- A: chip test suite -----------------------------------------------------
VIVID_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -q \
  > "$LOG/chip_tests_r5.log" 2>&1
echo "CHIP_TESTS_EXIT=$?" >> "$LOG/chip_tests_r5.log"

# ---- B: corrected train-trace attribution -----------------------------------
timeout 3600 python tools/trace_fwd.py --what train --flagship \
  --remat save_dots --batch 32 --iters 4 \
  > "$LOG/train_trace_r5.log" 2>&1
echo "TRACE_EXIT=$?" >> "$LOG/train_trace_r5.log"

# ---- C: warm-restart profiler -----------------------------------------------
timeout 1800 python tools/warm_restart_profile.py \
  > "$LOG/warm_restart.log" 2>&1
echo "WARM_RESTART_EXIT=$?" >> "$LOG/warm_restart.log"

# ---- D: serving protocol, 2k seeds ------------------------------------------
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
  find /tmp/r5_protocol/out -name '*.png' | wc -l
} >> "$LOG/protocol_2k.log"

echo "R5_S2_ALL_DONE"
date > /tmp/r5_s2.done
