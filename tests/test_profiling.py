"""Profiling utilities (utils/profiling.py): step timer sanity and trace
capture produce real artifacts on the CPU backend.
"""

import pathlib

import jax
import jax.numpy as jnp

from normalizingflows.jl_tpu.utils import profiling


def test_time_scan_steps_scales_with_work():
    def run_steps(n):
        def body(c, _):
            return c @ c / jnp.maximum(jnp.max(jnp.abs(c)), 1.0), None
        out, _ = jax.lax.scan(body, jnp.eye(64) * 0.5, None, length=n)
        return out

    run = jax.jit(run_steps, static_argnums=0)
    per_step = profiling.time_scan_steps(run, n=50, reps=2)
    assert per_step > 0
    # 4x the matrix work should cost measurably more per step
    def run_steps_big(n):
        def body(c, _):
            return c @ c / jnp.maximum(jnp.max(jnp.abs(c)), 1.0), None
        out, _ = jax.lax.scan(body, jnp.eye(256) * 0.5, None, length=n)
        return out

    per_step_big = profiling.time_scan_steps(
        jax.jit(run_steps_big, static_argnums=0), n=50, reps=2)
    assert per_step_big > per_step


def test_trace_writes_artifacts(tmp_path):
    d = tmp_path / "trace"
    with profiling.trace(str(d)):
        jnp.sum(jnp.ones((128, 128))).block_until_ready()
    files = list(pathlib.Path(d).rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_sync_fetch_scalar():
    assert profiling.sync_fetch(jnp.full((3, 3), 7.0)) == 7.0
