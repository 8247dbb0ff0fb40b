"""Checkpoint IO: training state save/load with resume-from-latest.

TPU-native equivalent of the reference CheckpointIO
(torch_utils/distributed.py:100-154): named state objects gathered into one
file, saved by process 0 only, `load_latest` picks the highest-indexed
`training-state-*.pt` in the run dir (same regex/naming as the reference so
external tooling keeps working).

Arrays are stored as numpy inside a plain pickle — portable, no framework
state embedded. Device placement/sharding is reapplied by the caller after
load (the trainer re-shards params onto its mesh).
"""

import os
import pickle
import re
import time
from typing import Optional

import numpy as np
import jax

from vivid_tpu.core import dist

_STATE_RE = re.compile(r"training-state-(\d+)\.pt")


def _to_numpy(tree):
    return jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)) if isinstance(x, (jax.Array, np.ndarray)) else x,
        tree)


class CheckpointIO:
    """Holds named state providers. Each value is either a dict-like pytree or
    an object with state_dict()/load_state_dict()."""

    def __init__(self, **objects):
        self.objects = objects

    def _gather(self, consume: bool = False):
        out = {}
        for name, obj in self.objects.items():
            tree = obj.state_dict() if hasattr(obj, "state_dict") else obj
            if consume:
                # Leaf-by-leaf fetch that deletes each device buffer once its
                # host copy lands, returning HBM progressively while training
                # continues (only safe on trees this holder exclusively owns).
                def fetch(x):
                    if isinstance(x, jax.Array):
                        host = np.asarray(jax.device_get(x))
                        try:
                            x.delete()
                        except Exception:
                            pass
                        return host
                    return x
                out[name] = jax.tree.map(fetch, tree)
            else:
                out[name] = _to_numpy(tree)
        return out

    def save(self, path: str, async_: bool = False, gather_async: bool = False,
             consume: bool = False):
        """Write the checkpoint (process 0). With async_=True the device->host
        gather happens synchronously (consistent snapshot) but the pickle IO
        runs in a background thread — the Orbax-async analogue for this
        plain-pickle format.

        gather_async=True additionally moves the device->host gather itself
        into the background thread, so the caller returns immediately and
        training overlaps the transfer (the reference stalls stepping for the
        whole torch.save, training_loop.py:498-501). The caller must hand this
        holder state whose device buffers stay valid for the transfer's
        lifetime (i.e. an independent device-side snapshot, not live
        donated-buffers state); consume=True then frees each device buffer as
        its host copy lands."""
        if gather_async:
            self._needs_barrier = True  # all ranks re-sync in wait()
            if dist.get_rank() != 0:
                return
            import threading

            def _gather_write():
                t0 = time.time()
                data = self._gather(consume=consume)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(data, f)
                os.replace(tmp, path)
                self.last_save_seconds = time.time() - t0

            self._last_writer = threading.Thread(target=_gather_write, daemon=True)
            self._last_writer.start()
            return
        data = self._gather()
        if dist.get_rank() == 0:
            def _write():
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(data, f)
                os.replace(tmp, path)
            if async_:
                import threading
                self._last_writer = threading.Thread(target=_write, daemon=True)
                self._last_writer.start()
            else:
                _write()
        dist.barrier("checkpoint-save")

    def wait(self):
        writer = getattr(self, "_last_writer", None)
        if writer is not None:
            writer.join()
        if getattr(self, "_needs_barrier", False):
            self._needs_barrier = False
            dist.barrier("checkpoint-save")

    def load(self, path: str):
        with open(path, "rb") as f:
            data = pickle.load(f)
        for name, obj in self.objects.items():
            if name not in data:
                continue
            if hasattr(obj, "load_state_dict"):
                obj.load_state_dict(data[name])
            elif isinstance(obj, dict):
                obj.clear()
                obj.update(data[name])
            else:
                raise ValueError(f"Cannot restore checkpoint entry {name!r}")
        return data

    def load_latest(self, run_dir: str) -> Optional[str]:
        path = latest_checkpoint(run_dir)
        if path is None:
            return None
        dist.print0(f"Loading checkpoint {path} ...")
        self.load(path)
        return path


def latest_checkpoint(run_dir: str) -> Optional[str]:
    if run_dir is None or not os.path.isdir(run_dir):
        return None
    best, best_idx = None, -1
    for fname in os.listdir(run_dir):
        if fname.endswith(".pt.tmp"):
            # Torn write from a kill during a checkpoint save (the atomic
            # tmp+rename scheme means it was never visible as a checkpoint);
            # reclaim the space at resume time.
            try:
                os.remove(os.path.join(run_dir, fname))
            except OSError:
                pass
            continue
        m = _STATE_RE.fullmatch(fname)
        if m and int(m.group(1)) > best_idx:
            best, best_idx = os.path.join(run_dir, fname), int(m.group(1))
    return best
