#!/bin/bash
# Probe the axon tunnel every 3 min; when it answers, run the r4i chain.
cd /root/repo
while true; do
  timeout 300 python - <<'PY' >> /root/repo/logs/r4/tunnel_probe.log 2>&1
import time, numpy as np, jax
t0=time.time()
x = jax.numpy.ones((256,256), dtype=jax.numpy.bfloat16)
print("PROBE_OK", float(np.asarray((x@x)[0,0])), "%.1fs"%(time.time()-t0), flush=True)
PY
  if [ $? -eq 0 ]; then break; fi
  echo "$(date -u +%H:%M:%S) tunnel not ready" >> /root/repo/logs/r4/tunnel_probe.log
  sleep 180
done
bash tools/round4i_chip_jobs.sh > logs/r4i_chain.log 2>&1
