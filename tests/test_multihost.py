"""2-process jax.distributed training test (VERDICT r1 #5): exercises the
process_count>1 branches — make_array_from_process_local_data, cross-process
stats allgather, checkpoint barrier, param-consistency fingerprints — that
single-process tests never reach. Two localhost processes x 4 virtual CPU
devices = the reference's 8-rank DDP protocol (training_loop.py:254)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env.pop("_VIVID_DRYRUN_CHILD", None)
    # Cross-host CPU AOT cache entries can SIGILL; compile fresh.
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", f"localhost:{port}",
             "--process-id", str(pid), "--num-processes", "2",
             "--workdir", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            # Generous: the 1-core host time-slices both workers, and a
            # concurrent pytest run can triple the ~260 s solo wall-clock.
            out, _ = p.communicate(timeout=1100)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}:\n{out[-3000:]}"
        assert f"MULTIHOST-OK p{pid}" in out, out[-3000:]
    assert os.path.exists(tmp_path / "training-state-0000001.pt")
