"""Tracing / profiling utilities (SURVEY.md §5 tracing row).

The reference has none; here: ``jax.profiler`` trace capture around any
phase, plus a lightweight per-phase wall-clock timer that forces REAL device
completion before reading the clock (on the axon remote-TPU platform,
``block_until_ready`` returns at enqueue time — see bench.py — so timings
must round-trip a scalar to host).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp


def force_completion(out) -> None:
    """Block until a computation's results actually exist on host."""
    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.asarray(leaves[-1]).reshape(-1)[0])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase (collect / plan / fit ...)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result_holder=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "result" in out:
                force_completion(out["result"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            f"time/{k}_sec_per_call": self.totals[k] / max(self.counts[k], 1)
            for k in self.totals
        }
