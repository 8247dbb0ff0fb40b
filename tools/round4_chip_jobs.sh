#!/bin/bash
# Round-4 chip protocol jobs (VERDICT items 1 + 2), serialized on the one
# v5e chip:
#   1. TRAIN-A: the real `python train_nvs.py` CLI, product ch=64 dual-source
#      arch, 200 steps with status ticks, sample-grid ticks, snapshot +
#      checkpoint ticks, --deterministic (reference training_loop.py:338-590).
#   2. TRAIN-B: identical command, kill -9 mid-run after the step-150
#      checkpoint, relaunch -> resume from training-state-*, run to the end.
#   3. COMPARE: bitwise fingerprint compare of A vs B final training-state
#      and snapshots (the kill+resume continuation must equal the unkilled
#      run under --deterministic).
#   4. METRICS: `calculate_metrics.py gen` at protocol scale (10k seeds,
#      stub detectors, README.md:81-87 / calculate_metrics.py:419-430).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/logs/r4
mkdir -p "$LOG"
echo $$ > /tmp/r4_chain.pid
trap 'rm -f /tmp/r4_chain.pid' EXIT

SCENES=/tmp/r4_scenes
python - <<'EOF'
from vivid_tpu.data.scenes import make_synthetic_dataset
make_synthetic_dataset("/tmp/r4_scenes", num_scenes=64, num_views=8, imsize=128)
print("scenes ready")
EOF

COMMON=(--preset=vivid-base --data="$SCENES" --test-data-path="$SCENES"
        --batch=32 --duration=38400 --status=3840 --samples=19200
        --snapshot=19200 --checkpoint=9600 --deterministic --remat=save_dots)

# ---- TRAIN-A: unkilled product run -----------------------------------------
rm -rf /tmp/r4_trainA
timeout 5400 python train_nvs.py --outdir=/tmp/r4_trainA "${COMMON[@]}" \
  > "$LOG/trainA.log" 2>&1
echo "TRAIN_A_EXIT=$?"

# ---- TRAIN-B: kill -9 after the step-150 checkpoint, then resume -----------
rm -rf /tmp/r4_trainB
python train_nvs.py --outdir=/tmp/r4_trainB "${COMMON[@]}" \
  > "$LOG/trainB_part1.log" 2>&1 &
BPID=$!
for i in $(seq 1 2700); do
  if ! kill -0 $BPID 2>/dev/null; then break; fi
  if grep -q "training-state-0000028.pt" "$LOG/trainB_part1.log"; then
    sleep 5
    kill -9 $BPID 2>/dev/null
    echo "KILLED_B_AT=$(date +%s)"
    break
  fi
  sleep 2
done
wait $BPID 2>/dev/null
echo "TRAIN_B_PART1_DONE"
ls -la /tmp/r4_trainB/experiments/ >> "$LOG/trainB_part1.log" 2>&1

timeout 5400 python train_nvs.py --outdir=/tmp/r4_trainB "${COMMON[@]}" \
  > "$LOG/trainB_resume.log" 2>&1
echo "TRAIN_B_RESUME_EXIT=$?"

# ---- COMPARE: bitwise fingerprints ------------------------------------------
python - > "$LOG/compare.log" 2>&1 <<'EOF'
import hashlib, pickle, numpy as np, jax

def fingerprint(path):
    with open(path, "rb") as f:
        data = pickle.load(f)
    h = hashlib.sha256()
    leaves = jax.tree.leaves(data)
    for leaf in leaves:
        if isinstance(leaf, np.ndarray):
            h.update(np.ascontiguousarray(leaf).tobytes())
        else:
            h.update(repr(leaf).encode())
    return h.hexdigest(), len(leaves)

for fname in ["training-state-0000038.pt"]:
    a, na = fingerprint(f"/tmp/r4_trainA/experiments/{fname}")
    b, nb = fingerprint(f"/tmp/r4_trainB/experiments/{fname}")
    print(f"{fname}: A={a[:16]} ({na} leaves) B={b[:16]} ({nb} leaves) "
          f"match={a == b}")
    assert a == b, "kill+resume diverged from the unkilled run"
for std in ["0.050", "0.100"]:
    fname = f"network-snapshot-0000038-{std}.pkl"
    a, _ = fingerprint(f"/tmp/r4_trainA/experiments/{fname}")
    b, _ = fingerprint(f"/tmp/r4_trainB/experiments/{fname}")
    print(f"{fname}: match={a == b}")
    assert a == b, f"snapshot {std} diverged"
print("BITWISE RESUME PARITY OK")
EOF
echo "COMPARE_EXIT=$?"

# ---- METRICS: protocol-scale calculate_metrics gen ---------------------------
SNAP=/tmp/r4_trainA/experiments/network-snapshot-0000038-0.050.pkl
T0=$(date +%s)
timeout 5400 python calculate_metrics.py gen \
  --net="$SNAP" --data="$SCENES" --num=10000 --batch=32 \
  --metrics=stub_fid,joint_stub_fid,psnr \
  > "$LOG/metrics_gen_10k.log" 2>&1
echo "METRICS_EXIT=$? METRICS_WALL_S=$(( $(date +%s) - T0 ))"

echo "R4_CHAIN_ALL_DONE"
