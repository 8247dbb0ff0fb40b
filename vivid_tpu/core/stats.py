"""Training statistics with one cross-device reduction per collection.

Re-design of the reference training_stats (torch_utils/training_stats.py):
per-name [count, sum, sum-of-squares] moment counters, NaN/Inf-tolerant,
flushed by a Collector that performs a single reduction for all names.

TPU-native shape: inside the jitted train step, stats are *returned* as a
dict of small arrays (already reduced by XLA when computed from sharded
values); on the host, `report()` accumulates moments and `Collector.update()`
folds them into interval means/stds. Cross-host reduction (multi-process)
goes through one `process_allgather` on the stacked moment matrix — the
analogue of the reference's single all_reduce (training_stats.py:270).
"""

import re
from typing import Dict

import numpy as np
import jax

from vivid_tpu.core.easydict import EasyDict


class _Moments:
    __slots__ = ("num", "sum", "sumsq")

    def __init__(self):
        self.num = 0.0
        self.sum = 0.0
        self.sumsq = 0.0

    def add(self, values):
        v = np.asarray(values, np.float64).reshape(-1)
        finite = v[np.isfinite(v)]  # non-finite values are treated as missing
        self.num += finite.size
        self.sum += finite.sum()
        self.sumsq += np.square(finite).sum()

    def row(self):
        return np.array([self.num, self.sum, self.sumsq])


class Stats:
    """Per-process stat accumulator (module-level default below)."""

    def __init__(self):
        self._pending: Dict[str, _Moments] = {}

    def report(self, name: str, value):
        if isinstance(value, jax.Array):
            value = np.asarray(jax.device_get(value))
        self._pending.setdefault(name, _Moments()).add(value)
        return value

    def report0(self, name: str, value):
        """Report only on process 0 (matches reference report0 semantics)."""
        if jax.process_index() == 0:
            self.report(name, value)
        return value

    def report_dict(self, values: Dict[str, object]):
        for k, v in values.items():
            self.report(k, v)


class Collector:
    """update() drains pending moments (one cross-host gather for all names);
    as_dict() returns mean/std/num per name for the drained interval."""

    def __init__(self, stats: "Stats", regex: str = ".*"):
        self.stats = stats
        self.regex = re.compile(regex)
        self._interval: Dict[str, np.ndarray] = {}

    def update(self):
        pending = self.stats._pending
        names = sorted(n for n in pending if self.regex.fullmatch(n))
        if not names:
            return
        mat = np.stack([pending[n].row() for n in names])
        for n in names:
            del pending[n]  # report() recreates on demand
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            mat = np.asarray(multihost_utils.process_allgather(mat)).sum(axis=0)
        for n, row in zip(names, mat):
            self._interval[n] = self._interval.get(n, np.zeros(3)) + row

    def as_dict(self):
        """Return and clear the current interval's statistics."""
        out = EasyDict()
        for name in sorted(self._interval):
            num, s, ss = self._interval[name]
            if num > 0:
                mean = s / num
                var = max(ss / num - mean * mean, 0.0)
            else:
                mean = var = float("nan")
            out[name] = EasyDict(num=int(num), mean=float(mean), std=float(np.sqrt(var)))
        self._interval = {}
        return out


default_stats = Stats()
default_collector = Collector(default_stats)


def report(name, value):
    return default_stats.report(name, value)


def report0(name, value):
    return default_stats.report0(name, value)


def report_dict(values):
    default_stats.report_dict(values)
