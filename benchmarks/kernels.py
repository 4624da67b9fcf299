"""Kernel microbenchmarks: Pallas fused paths vs the pure-jnp oracles.

Measures full train-step throughput (fwd + grad + Adam update, jitted scan)
for the two native kernels of the framework, on whatever backend is live
(the real TPU under the axon tunnel; CPU elsewhere — off-TPU the Pallas
paths automatically run in interpret mode, so the numerics cross-check
works anywhere but the Pallas timings are meaningless and expected to
LOSE; the numbers recorded in KERNELS.md are from the TPU):

1. RQS spline coupling (`ops/rqs_pallas.py`): fused bin-search +
   rational-quadratic + logdet kernel vs the `ops/rqs.py` jnp oracle,
   on the reference NSF demo config (10 layers, K=10, B=30, [32,32],
   64 samples/iter — `example/demo_neural_spline_flow.jl:20-53`).
2. Whole-stack RealNVP (`experimental/coupling_pallas.py`): one fused kernel for
   all coupling blocks vs the unfused per-layer Chain, at the reference
   demo size (d=2, [16,16]x3 — latency-bound) and at a wide size
   (d=128, [128,128]x6 — compute-bound) to expose the break-even.

Also cross-checks kernel-vs-oracle numerics (value, logdet, VJP) at each
config and prints max deviations.

Usage: python benchmarks/kernels.py [--steps 200]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask


def _train_throughput(flow, target, batch, lr, steps):
    """Steps/s of the jitted train-step scan, two-size slope timing (the
    fixed dispatch/fetch overhead of the tunneled backend cancels)."""
    opt = optax.adam(lr)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def step(carry, key):
        f, s = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_batch(key, f, target.log_prob, batch)
        )(f)
        g = apply_mask(g, mask)
        u, s2 = opt.update(g, s, f)
        return (optax.apply_updates(f, u), s2), loss

    @functools.partial(jax.jit, static_argnums=2)
    def run(f, s, n, key):
        keys = jax.random.split(key, n)
        (f, s), losses = jax.lax.scan(step, (f, s), keys)
        return losses[-1]

    st = opt.init(flow)

    def timed(n, reps=2):
        best = float("inf")
        for i in range(reps + 1):  # first call compiles
            t0 = time.perf_counter()
            float(run(flow, st, n, jax.random.key(1)))  # fetch = sync
            if i:
                best = min(best, time.perf_counter() - t0)
        return best

    # two-size slope; re-measure if timing noise makes the slope vanish
    for attempt in range(3):
        t1, t2 = timed(steps), timed(2 * steps)
        if t2 - t1 > 0.2 * t2 / 2:  # slope at least ~20% of per-run time
            break
        print(
            f"[kernels] noisy slope (t1={t1:.4f}s t2={t2:.4f}s), "
            f"re-measuring ({attempt + 1}/3)",
            flush=True,
        )
    if t2 <= t1:
        # still degenerate: fall back to the single-run estimate and say so
        print("[kernels] WARNING: slope non-positive; using t2 directly",
              flush=True)
        return 2 * steps / t2
    return steps / (t2 - t1)


def _emit(name, fast, slow, extra=None):
    rec = {
        "experiment": name,
        "fused_steps_per_s": round(fast, 1),
        "oracle_steps_per_s": round(slow, 1),
        "speedup": round(fast / slow, 2),
        "device": jax.devices()[0].device_kind,
    }
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)


def bench_rqs(steps, interpret):
    # numerics cross-check on the raw kernel
    from normalizingflows.jl_tpu.ops import rqs as oracle
    from normalizingflows.jl_tpu.ops.rqs_pallas import rqs_fused_forward

    K, B = 10, 30.0
    x = jax.random.uniform(jax.random.key(0), (4096,), minval=-40.0, maxval=40.0)
    raw = jax.random.normal(jax.random.key(1), (4096, 3 * K - 1)) * 0.5
    y_k, ld_k = jax.jit(
        lambda x, r: rqs_fused_forward(x, r, B, interpret=interpret)
    )(x, raw)
    y_o, ld_o = oracle.rqs_forward(x, *oracle.rqs_params_from_raw(raw, B))
    dev = {
        "max_abs_dy_vs_oracle": float(jnp.max(jnp.abs(y_k - y_o))),
        "max_abs_dlogdet_vs_oracle": float(jnp.max(jnp.abs(ld_k - ld_o))),
    }

    target = nf.Banana(2, 1.0, 100.0)
    mk = lambda backend: jax.jit(
        lambda k: nf.nsf(k, 2, (32, 32), K=K, B=B, nlayers=10,
                         backend=backend, interpret=interpret)
    )(jax.random.key(0))
    fast = _train_throughput(mk("pallas"), target, 64, 1e-4, steps)
    slow = _train_throughput(mk("oracle"), target, 64, 1e-4, steps)
    _emit("nsf_rqs_pallas_vs_oracle", fast, slow, dev)


def _sample_throughput(flow, batch, steps):
    """Batches/s of forward-only sampling (the fused kernel's primary
    claim: activations VMEM-resident, one HBM read + write per tile)."""

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def run(f, n, m, key):
        def body(c, k):
            s = f.sample(k, (m,))
            return c + s[0, 0] + s[-1, -1], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, n))
        return acc

    def timed(n, reps=2):
        best = float("inf")
        for i in range(reps + 1):
            float(run(flow, n, batch, jax.random.key(3)))
            t0 = time.perf_counter()
            float(run(flow, n, batch, jax.random.key(3)))
            if i:
                best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(steps), timed(2 * steps)
    if t2 <= t1:
        return 2 * steps / t2
    return steps / (t2 - t1)


def bench_realnvp_sampling(steps, interpret):
    """Forward-only sampling: fused whole-stack kernel vs unfused stack."""
    for name, dim, hdims, nlayers, batch in (
        ("realnvp_sample_fused_demo_d2", 2, (16, 16), 3, 4096),
        ("realnvp_sample_fused_wide_d128", 128, (128, 128), 6, 4096),
    ):
        mk = lambda fused: jax.jit(
            lambda k: nf.realnvp(k, dim, hdims, nlayers=nlayers, fused=fused,
                                 interpret=interpret)
        )(jax.random.key(0))
        fast = _sample_throughput(mk(True), batch, steps)
        slow = _sample_throughput(mk(False), batch, steps)
        _emit(name, fast, slow, {"unit": "sample_batches_per_s",
                                 "batch": batch})


def bench_realnvp(steps, interpret):
    target2 = nf.Banana(2, 1.0, 100.0)
    for name, dim, hdims, nlayers, batch, tgt in (
        ("realnvp_fused_demo_d2", 2, (16, 16), 3, 16, target2),
        ("realnvp_fused_wide_d128", 128, (128, 128), 6, 1024, None),
    ):
        if tgt is None:
            # synthetic wide target: product of shifted Gaussians
            mu = jnp.linspace(-1.0, 1.0, dim)
            tgt = nf.DiagNormal(mu, jnp.full((dim,), 2.0))
        mk = lambda fused: jax.jit(
            lambda k: nf.realnvp(k, dim, hdims, nlayers=nlayers, fused=fused,
                                 interpret=interpret)
        )(jax.random.key(0))
        fast = _train_throughput(mk(True), tgt, batch, 5e-4, steps)
        slow = _train_throughput(mk(False), tgt, batch, 5e-4, steps)
        _emit(name, fast, slow)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print(
            "[kernels] non-TPU backend: Pallas paths run in interpret mode "
            "(numerics checks valid; fused timings are NOT)",
            flush=True,
        )
    bench_rqs(args.steps, interpret)
    bench_realnvp(args.steps, interpret)
    bench_realnvp_sampling(max(args.steps // 4, 8), interpret)


if __name__ == "__main__":
    main()
