"""Profiling / cost analysis utilities.

The TPU-native replacement for the reference's thop MACs/params print
(reference model.py:338-342) and per-iteration wall-clock print
(model.py:345-352): XLA's own cost model via ``Compiled.cost_analysis``
for FLOPs/bytes, a parameter counter over the pytree, a wall-clock
context, and a ``jax.profiler`` trace wrapper for in-depth runs
(view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def cost_analysis(fn: Callable, *args) -> dict[str, float]:
    """FLOPs / bytes-accessed estimate of a jitted function at given args."""
    compiled = jax.jit(fn).lower(*args).compile()
    analyses = compiled.cost_analysis()
    if isinstance(analyses, list):  # one entry per device program
        analyses = analyses[0]
    return {
        "flops": float(analyses.get("flops", float("nan"))),
        "bytes_accessed": float(analyses.get("bytes accessed", float("nan"))),
    }


def model_summary(model, variables, *example_args) -> dict[str, Any]:
    """params + FLOPs for a model forward — the thop-equivalent line."""

    def fwd(params, batch_stats, *args):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, *args, train=False
        )

    costs = cost_analysis(
        fwd, variables["params"], variables["batch_stats"], *example_args
    )
    return {"params": count_params(variables["params"]), **costs}


@contextlib.contextmanager
def wall_clock(label: str = "", sync: Any = None):
    """Wall-time context; pass a pytree as ``sync`` to block on it."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace capturing device timelines (open in xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
