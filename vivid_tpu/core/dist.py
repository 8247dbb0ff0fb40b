"""Multi-host / multi-device helpers.

TPU-native replacement for the reference's torch.distributed layer
(torch_utils/distributed.py): NCCL ranks become JAX processes; `barrier`
becomes `sync_global_devices`; rank-0-first download gating becomes
process-index-0 gating. Collectives inside compiled code are expressed with
mesh shardings / psum, never through this module.

Elastic hooks (`should_stop` / `should_suspend` / `request_suspend` /
`update_progress`) mirror the reference's suspend contract
(torch_utils/distributed.py:67-83) but are actually wired: a SIGTERM/SIGINT
handler flips the suspend flag so preemptible TPU jobs checkpoint and exit
cleanly at the next status tick.
"""

import os
import signal

import jax

_initialized = False
_should_suspend = False
_should_stop = False


def init(coordinator_address: str = None, num_processes: int = None, process_id: int = None):
    """Initialize multi-host JAX if requested via env/args; always safe to call
    single-process. Installs the suspend signal handler."""
    global _initialized
    if _initialized:
        return
    # jax.distributed is only needed for true multi-host jobs; single-host
    # (even multi-chip) works without it.
    coord = coordinator_address or os.environ.get("VIVID_COORDINATOR")
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes or int(os.environ.get("VIVID_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("VIVID_PROCESS_ID", "0")),
        )
    for sig in (signal.SIGTERM,):
        try:
            signal.signal(sig, _handle_preemption)
        except (ValueError, OSError):
            pass  # not in main thread
    _initialized = True


def _handle_preemption(signum, frame):
    global _should_suspend
    _should_suspend = True


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    return jax.process_index()  # one process per host in the JAX model


def get_world_size() -> int:
    return jax.process_count()


def num_devices() -> int:
    return jax.device_count()


def print0(*args, **kwargs):
    if get_rank() == 0:
        print(*args, **kwargs)


def barrier(name: str = "barrier"):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def should_stop() -> bool:
    return _should_stop


def should_suspend() -> bool:
    return _should_suspend


def request_suspend():
    global _should_suspend
    _should_suspend = True


def update_progress(cur, total):
    pass  # hook for external schedulers; intentionally a no-op like the reference
