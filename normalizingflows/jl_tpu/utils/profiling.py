"""Profiling and step-timing utilities.

The reference's only observability is a ProgressMeter line with it/s
(`src/optimize.jl:4-6,69`; SURVEY §5 lists tracing/profiling as absent).
Here: `jax.profiler` trace capture around any callable, and a robust
device-step timer that synchronizes by fetching a scalar result to the host
(`block_until_ready` can return early on tunneled/remote TPU backends) and
uses a two-size slope so fixed dispatch overhead cancels.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "time_scan_steps", "sync_fetch"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a `jax.profiler` trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync_fetch(x) -> float:
    """Force execution to complete by fetching a scalar to the host."""
    return float(jnp.asarray(x).reshape(-1)[0])


def time_scan_steps(
    run_steps: Callable[[int], jax.Array],
    n: int = 2000,
    reps: int = 3,
) -> float:
    """Per-step seconds of a device-side loop.

    ``run_steps(n)`` must execute n steps on-device and return an array
    whose value depends on every step (e.g. the final loss). Measures
    time(2n) − time(n) so compile/dispatch/fetch constants cancel.
    """

    def timed(m):
        sync_fetch(run_steps(m))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync_fetch(run_steps(m))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(n)
    t2 = timed(2 * n)
    return max((t2 - t1) / n, 1e-12)
