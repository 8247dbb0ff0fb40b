#!/bin/bash
# Round-5 VERDICT item 1: a REAL training run through the product CLI —
# ch=64 dual-source, b=32, 20k steps (~3.84M nimg at nimg_mult=6) on the v5e
# chip, with: metric ticks (stub_fid/joint_stub_fid/psnr/fid with the
# random-weight JAX InceptionV3), sample-grid ticks, snapshot ticks, and
# OVERLAPPED checkpoint ticks (VERDICT item 4 evidence rides along).
#
# Stage 0 first smoke-tests the overlapped checkpoint path on the chip with a
# tiny 60-step run (background-thread device_get through the axon tunnel has
# never run on real hardware) so a failure costs 10 minutes, not 2 hours.
#
# Completion marker: /tmp/r5_longrun.done (successor chains wait on the
# MARKER, not a pidfile — the pidfile pattern races, CLAUDE.md).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export VIVID_ALLOW_RANDOM_DETECTOR=1
LOG=/root/repo/logs/r5
mkdir -p "$LOG"
rm -f /tmp/r5_longrun.done

# ---- datasets ---------------------------------------------------------------
python - <<'EOF'
import os
from vivid_tpu.data.scenes import make_synthetic_dataset
if not os.path.exists("/tmp/r5_scenes/scene_00511.npz"):
    make_synthetic_dataset("/tmp/r5_scenes", num_scenes=512, num_views=8,
                           imsize=128, seed=0)
if not os.path.exists("/tmp/r5_scenes_test/scene_00063.npz"):
    make_synthetic_dataset("/tmp/r5_scenes_test", num_scenes=64, num_views=8,
                           imsize=128, seed=777)
print("datasets ready")
EOF

# ---- stage 0: overlapped-checkpoint chip smoke ------------------------------
rm -rf /tmp/r5_smoke
timeout 2400 python train_nvs.py --outdir=/tmp/r5_smoke \
  --preset=vivid-base --channels=64 --batch=32 --remat=save_dots \
  --data=/tmp/r5_scenes --test-data-path=/tmp/r5_scenes_test \
  --duration=11520 --status=3840 --samples=0 --snapshot=0 --checkpoint=5760 \
  > "$LOG/smoke_async_ckpt.log" 2>&1
SMOKE_EXIT=$?
echo "SMOKE_EXIT=$SMOKE_EXIT"
python - <<'EOF' >> "$LOG/smoke_async_ckpt.log" 2>&1
import pickle, numpy as np, jax
path = "/tmp/r5_smoke/experiments/training-state-0000011.pt"
with open(path, "rb") as f:
    data = pickle.load(f)
leaves = jax.tree.leaves(data["state"])
print("smoke checkpoint leaves:", len(leaves),
      "all finite:", all(np.isfinite(l).all() for l in leaves
                         if isinstance(l, np.ndarray) and l.dtype.kind == "f"))
EOF
if [ $? -ne 0 ] || [ $SMOKE_EXIT -ne 0 ]; then
  echo "SMOKE FAILED — aborting long run" | tee /tmp/r5_longrun.done
  exit 1
fi

# ---- stage 1: the 20k-step product run --------------------------------------
rm -rf /tmp/r5_train
T0=$(date +%s)
timeout 14400 python train_nvs.py --outdir=/tmp/r5_train \
  --preset=vivid-base --channels=64 --batch=32 --remat=save_dots \
  --data=/tmp/r5_scenes --test-data-path=/tmp/r5_scenes_test \
  --duration=3840000 \
  --status=19200 \
  --samples=192000 \
  --metrics=576000 --metrics-list=stub_fid,joint_stub_fid,psnr,fid \
  --snapshot=960000 \
  --checkpoint=480000 \
  > "$LOG/longrun.log" 2>&1
echo "LONGRUN_EXIT=$? LONGRUN_WALL_S=$(( $(date +%s) - T0 ))"

# Preserve the judge-facing artifacts in the repo.
cp /tmp/r5_train/experiments/stats.jsonl "$LOG/longrun_stats.jsonl" 2>/dev/null
cp /tmp/r5_train/experiments/log.txt "$LOG/longrun_log.txt" 2>/dev/null
mkdir -p "$LOG/longrun_samples"
cp /tmp/r5_train/experiments/results/*.png "$LOG/longrun_samples/" 2>/dev/null
cp /tmp/r5_train/experiments/code/provenance.json "$LOG/longrun_provenance.json" 2>/dev/null

echo "R5_LONGRUN_ALL_DONE"
date > /tmp/r5_longrun.done
