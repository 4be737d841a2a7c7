"""Timing utilities.

IMPORTANT: on the tunneled 'axon' TPU platform, ``jax.block_until_ready``
returns before execution finishes (the relay acks asynchronously).  The only
reliable sync is a host fetch of (a scalar of) the output.  All timing in
this repo goes through ``device_fetch_sync``.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Callable

import jax
import numpy as np

__all__ = ["device_fetch_sync", "time_fn", "StageTimers"]


def device_fetch_sync(out: Any) -> None:
    """Force completion by fetching one scalar from each output leaf."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            arr = leaf
            for _ in range(arr.ndim):
                arr = arr[0]
            np.asarray(arr)


def time_fn(
    fn: Callable, *args, iters: int = 30, warmup: int = 2, **kw
) -> tuple[float, Any]:
    """(seconds per iteration, last output).  Chains ``iters`` calls and
    syncs once at the end (amortizes tunnel round-trip latency)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    device_fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    device_fetch_sync(out)
    return (time.perf_counter() - t0) / iters, out


class StageTimers:
    """Named wall-clock accumulators (per-stage pipeline observability —
    the reference only has a single aggregate timer, main.rs:79-93)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "avg_ms": round(1000 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in self.totals
        }
