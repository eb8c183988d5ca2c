"""Tracing and per-kernel timing.

The reference has no systematic profiling (SURVEY.md §5: wall-clock prints
only). Here:

- ``trace(logdir)``: context manager around jax.profiler for full XLA traces
  viewable in TensorBoard/Perfetto.
- ``StepTimer``: forced-readback wall timing (the tunneled axon backend's
  ``block_until_ready`` is a no-op — see .claude/skills/verify/SKILL.md), with
  named sections and summary percentiles.
- ``time_fn``: amortized timing of a jitted callable.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp


def force_sync(tree) -> None:
    """Force completion of device work feeding ``tree`` (readback of a sum)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        jax.device_get(jnp.sum(leaves[0].astype(jnp.float32)))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vlfm_tpu_trace"):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named wall-clock sections with device sync at the boundaries."""

    def __init__(self) -> None:
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                force_sync(sync_on)
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            out[name] = {
                "count": len(xs),
                "mean_ms": statistics.mean(xs) * 1e3,
                "p50_ms": statistics.median(xs) * 1e3,
                "max_ms": max(xs) * 1e3,
            }
        return out


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Amortized seconds per call of a jitted function (with forced sync)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters
