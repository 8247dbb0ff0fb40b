"""Model summary and FLOPs tooling.

Parity surfaces:
  * misc.print_module_summary (torch_utils/misc.py:205-272) -> param table per
    top-level module path from the param pytree.
  * DeepSpeed FlopsProfiler / training/flop_notebook.py -> XLA cost analysis
    of a jitted callable (`flops_analysis`), optionally per-phase.
"""

from typing import Callable, Dict

import numpy as np
import jax


def param_table(params: dict, max_depth: int = 2) -> str:
    """Human-readable parameter-count table grouped to `max_depth` path
    segments (print_module_summary analogue)."""
    counts: Dict[str, int] = {}

    def walk(node, path):
        for k, v in node.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p)
            else:
                key = "/".join(p[:max_depth])
                counts[key] = counts.get(key, 0) + int(np.prod(v.shape))

    walk(params, ())
    total = sum(counts.values())
    width = max((len(k) for k in counts), default=10) + 2
    lines = [f"{'Module':<{width}}{'Params':>12}"]
    lines.append("-" * (width + 12))
    for k in sorted(counts):
        lines.append(f"{k:<{width}}{counts[k]:>12,}")
    lines.append("-" * (width + 12))
    lines.append(f"{'Total':<{width}}{total:>12,}")
    return "\n".join(lines)


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def flops_analysis(fn: Callable, *example_args, **example_kwargs) -> dict:
    """Compile `fn` and return XLA's cost analysis (flops, bytes accessed,
    transcendentals). The DeepSpeed-FlopsProfiler analogue."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return dict(cost)


def profiled_function(fn: Callable) -> Callable:
    """Annotate a function with a named TraceAnnotation so it shows up in
    jax.profiler traces (misc.profiled_function analogue)."""
    name = getattr(fn, "__qualname__", getattr(fn, "__name__", "fn"))

    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(name):
            return fn(*args, **kwargs)

    wrapper.__name__ = getattr(fn, "__name__", "fn")
    return wrapper
