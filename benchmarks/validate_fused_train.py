"""Validate the whole-run fused train kernel ON THE REAL TPU.

Runs the same equivalence check as tests/test_train_kernel.py but COMPILED
(not interpret mode) on the live TPU backend: same presampled base draws
through (a) the unfused optax scan and (b) the single-`pallas_call`
whole-run Adam kernel (`experimental/train_pallas.py`), asserting the loss
trajectories and trained weights agree to f32 tolerance. On success it
writes the `benchmarks/.fused_train_ok` sentinel that gates the fused path
in bench.py (an unvalidated Mosaic compile must never hang the driver's
bench run), and prints a one-line JSON verdict with timings.

Usage: timeout 300 python benchmarks/validate_fused_train.py [--steps 2000]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import normalizingflows as nf  # noqa: E402
from normalizingflows.jl_tpu.experimental.train_pallas import adam_train_realnvp_fused
from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask

DIM, HDIMS, NLAYERS, BATCH, LR = 2, (16, 16), 3, 16, 5e-4
N_CHECK = 200  # equivalence-check length (tolerances drift with steps)


def _banana_logp_static(target):
    b, var = float(target.b), float(target.var)

    def logp(x):
        z2 = x[..., 1] + b * jnp.square(x[..., 0]) - var * b
        log_z = 0.5 * (DIM * math.log(2 * math.pi) + math.log(var))
        quad = jnp.square(x[..., 0]) / var + jnp.square(z2)
        return -log_z - 0.5 * quad

    return logp


def _optax_losses(flow, target, xs):
    opt = optax.adam(LR)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def step(carry, x):
        f, st = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_from_samples(x, f, target.log_prob)
        )(f)
        g = apply_mask(g, mask)
        u, st = opt.update(g, st, f)
        return (optax.apply_updates(f, u), st), loss

    @jax.jit
    def run(f, xs):
        (f, _), losses = jax.lax.scan(step, (f, opt.init(f)), xs)
        return f, losses

    return run(flow, xs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000,
                   help="timing-run length (equivalence uses 200)")
    args = p.parse_args()

    backend = jax.default_backend()
    dev = jax.devices()[0].device_kind
    print(f"[validate] backend={backend} device={dev}", flush=True)
    if backend != "tpu":
        print("[validate] NOT a TPU backend; refusing to write sentinel",
              flush=True)
        sys.exit(1)  # the compiled pallas_call below only lowers on TPU

    key = jax.random.key(0)
    flow = jax.jit(lambda k: nf.realnvp(k, DIM, HDIMS, nlayers=NLAYERS))(key)
    fused = jax.jit(
        lambda k: nf.realnvp(k, DIM, HDIMS, nlayers=NLAYERS, fused=True)
    )(key)
    target = nf.Banana(DIM, 1.0, 100.0)
    logp = _banana_logp_static(target)
    xs = flow.base.sample(jax.random.key(1), (N_CHECK, BATCH))

    fb = fused.bijector.bijectors[0]
    t0 = time.perf_counter()
    groups_k, losses_k = jax.block_until_ready(
        adam_train_realnvp_fused(
            xs, fb.groups, fb.idx_even, fb.idx_odd, logp,
            fused.base.loc, fused.base.scale, LR,
        )
    )
    t_compile = time.perf_counter() - t0
    print(f"[validate] fused kernel compiled+ran {N_CHECK} steps "
          f"in {t_compile:.1f}s", flush=True)

    flow_o, losses_o = jax.block_until_ready(_optax_losses(flow, target, xs))

    dl = float(jnp.max(jnp.abs(losses_k - losses_o)))
    rel = dl / max(float(jnp.max(jnp.abs(losses_o))), 1e-9)
    # trained-weight agreement (unfused flow stores per-layer params;
    # compare through a fresh forward pass instead of leaf-by-leaf)
    xe = flow.base.sample(jax.random.key(2), (1024,))
    y_o, ld_o = flow_o.bijector.forward_and_log_det(xe)
    fused_t = nf.FusedRealNVP(groups_k, fb.idx_even, fb.idx_odd, fb.interpret)
    y_k, ld_k = fused_t.forward_and_log_det(xe)
    dy = float(jnp.max(jnp.abs(y_k - y_o)))
    dld = float(jnp.max(jnp.abs(ld_k - ld_o)))
    ok = bool(rel < 5e-3 and dy < 5e-3 and dld < 5e-3)
    print(f"[validate] max|dloss|={dl:.3e} (rel {rel:.3e}) "
          f"max|dy|={dy:.3e} max|dlogdet|={dld:.3e} -> "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)

    # timing: two-size slope of the whole-run kernel vs the optax scan
    def time_fused(n):
        xs_n = flow.base.sample(jax.random.key(3), (n, BATCH))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _, losses = adam_train_realnvp_fused(
                xs_n, fb.groups, fb.idx_even, fb.idx_odd, logp,
                fused.base.loc, fused.base.scale, LR,
            )
            float(losses[-1])
            if i:
                best = min(best, time.perf_counter() - t0)
        return best

    opt = optax.adam(LR)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def step(carry, x):
        f, st = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_from_samples(x, f, target.log_prob)
        )(f)
        g = apply_mask(g, mask)
        u, st = opt.update(g, st, f)
        return (optax.apply_updates(f, u), st), loss

    @functools.partial(jax.jit, static_argnums=1)
    def run_o(f, n, key):
        xs = f.base.sample(key, (n, BATCH))
        (f, _), losses = jax.lax.scan(step, (f, opt.init(f)), xs, unroll=16)
        return losses[-1]

    def time_optax(n):
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(run_o(flow, n, jax.random.key(3)))
            if i:
                best = min(best, time.perf_counter() - t0)
        return best

    n = args.steps
    tf1, tf2 = time_fused(n), time_fused(2 * n)
    to1, to2 = time_optax(n), time_optax(2 * n)
    sps_f = n / max(tf2 - tf1, 1e-9)
    sps_o = n / max(to2 - to1, 1e-9)
    print(f"[validate] fused t({n})={tf1:.3f}s t({2*n})={tf2:.3f}s; "
          f"optax t({n})={to1:.3f}s t({2*n})={to2:.3f}s", flush=True)

    verdict = {
        "experiment": "fused_whole_run_train_kernel_tpu",
        "ok": ok,
        "device": dev,
        "fused_steps_per_s": round(sps_f, 1),
        "optax_steps_per_s": round(sps_o, 1),
        "speedup": round(sps_f / sps_o, 2),
        "max_abs_dloss": dl,
        "max_abs_dy": dy,
        "max_abs_dlogdet": dld,
    }
    print(json.dumps(verdict), flush=True)

    sentinel = pathlib.Path(__file__).parent / ".fused_train_ok"
    if ok and backend == "tpu":
        sentinel.write_text(json.dumps(verdict) + "\n")
        print(f"[validate] sentinel written: {sentinel}", flush=True)
    elif sentinel.exists() and not ok:
        sentinel.unlink()
        print("[validate] sentinel REMOVED (mismatch)", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
