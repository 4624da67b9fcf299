"""Weak-scaling harness for the batch-sharded training step.

Measures ELBO train-step throughput on 1/2/4/8-device 'batch' meshes with
the Monte-Carlo batch scaled proportionally (weak scaling: constant
per-device work). On a TPU pod slice this is the real ICI scaling
measurement demanded by BASELINE.md ("≥80% samples/s efficiency at 4
hosts"); on this single-chip container it runs on a VIRTUAL CPU mesh
(--xla_force_host_platform_device_count), which validates the collective
structure (pmean ELBO + psum grads) and the per-shard PRNG fan-out but NOT
hardware bandwidth — virtual devices share the same cores, so expect
efficiency ≈ 1/ndev there, not ≥0.8.

Usage:
    python benchmarks/scaling.py [--devices 1 2 4 8] [--steps 200]
    # on a real pod: run under the pod launcher; devices defaults to all

Prints one JSON line per mesh size plus an efficiency summary.
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def _setup_virtual(n: int) -> None:
    # Must run before any backend-initializing JAX call (device_count()
    # counts as one). On a real pod set NF_SCALING_HW=1 to skip the
    # virtual-CPU fallback and use the hardware mesh.
    import os

    if os.environ.get("NF_SCALING_HW"):
        return
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)


def measure(ndev: int, steps: int, per_device_batch: int) -> dict:
    import jax.numpy as jnp
    import optax

    import normalizingflows as nf
    from normalizingflows.jl_tpu.parallel import batch_mesh, shard_objective
    from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask

    mesh = batch_mesh(ndev)
    flow = jax.jit(
        lambda k: nf.realnvp(k, 2, (16, 16), nlayers=3)
    )(jax.random.key(0))
    target = nf.Banana(2, 1.0, 100.0)
    objective = shard_objective(nf.elbo_batch, mesh)
    optimizer = optax.adam(5e-4)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
    opt_state = optimizer.init(flow)
    n_samples = per_device_batch * ndev

    def step(carry, key):
        f, st = carry
        loss, grads = jax.value_and_grad(
            lambda f: -objective(key, f, target.log_prob, n_samples)
        )(f)
        grads = apply_mask(grads, mask)
        updates, st = optimizer.update(grads, st, f)
        return (optax.apply_updates(f, updates), st), loss

    @jax.jit
    def run(f, st, keys):
        (f, st), losses = jax.lax.scan(step, (f, st), keys)
        return losses

    def timed(n_steps):
        keys = jax.random.split(jax.random.key(1), n_steps)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(run(flow, opt_state, keys)[-1])  # host fetch = sync
            if i:
                best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(steps)
    t2 = timed(2 * steps)
    per_step = max((t2 - t1) / steps, 1e-12)  # slope: overhead cancels
    return {
        "devices": ndev,
        "per_device_batch": per_device_batch,
        "global_batch": n_samples,
        "steps_per_s": round(1.0 / per_step, 2),
        "samples_per_s": round(n_samples / per_step, 1),
        "platform": jax.devices()[0].platform,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--per-device-batch", type=int, default=256)
    a = p.parse_args()

    _setup_virtual(max(a.devices))
    results = []
    for n in a.devices:
        r = measure(n, a.steps, a.per_device_batch)
        results.append(r)
        print(json.dumps(r), flush=True)

    base = results[0]
    summary = {
        "metric": "weak_scaling_efficiency",
        "efficiency": {
            str(r["devices"]): round(
                r["samples_per_s"]
                / (base["samples_per_s"] * r["devices"] / base["devices"]),
                3,
            )
            for r in results
        },
        "note": ("virtual CPU meshes share host cores — structural "
                 "validation only; run on a pod slice for real numbers"
                 if results[0]["platform"] == "cpu" else "hardware run"),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
