"""Fused-coupling-kernel fate experiment (VERDICT r3 item 7).

The r3 verdict: the fused whole-stack kernel's hand-written backward ran
full-f32 matmuls while the XLA module path got the bf16 mixed-precision
treatment — so the KERNELS.md comparison was f32-kernel vs bf16-XLA.
This probe re-runs the wide training row with BOTH paths in bf16
(`compute_dtype=jnp.bfloat16` now threads into the kernel's conditioner
matmuls, `experimental/coupling_pallas.py::_dot`), which is the kernel's last
chance: if it still loses, it gets retired to an archive note.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/fused_bf16_probe.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask

DIM, HD, L, BATCH = 128, 128, 6, 1024


def train_steps_per_s(flow, target, batch, steps=100):
    opt = optax.adam(5e-4)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def step(carry, key):
        f, s = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_batch(key, f, target.log_prob, batch))(f)
        g = apply_mask(g, mask)
        u, s2 = opt.update(g, s, f)
        return (optax.apply_updates(f, u), s2), loss

    @functools.partial(jax.jit, static_argnums=2)
    def run(f, s, n, key):
        (f, s), losses = jax.lax.scan(step, (f, s), jax.random.split(key, n))
        return losses[-1]

    s0 = opt.init(flow)

    def timed(n, reps=2):
        best = float("inf")
        for i in range(reps + 1):
            t0 = time.perf_counter()
            float(run(flow, s0, n, jax.random.key(1)))
            if i:
                best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(steps), timed(2 * steps)
    return steps / max(t2 - t1, 1e-9)


def main():
    mu = jnp.linspace(-1.0, 1.0, DIM)
    target = nf.DiagNormal(mu, jnp.full((DIM,), 2.0))

    def mk(fused, cd):
        return jax.jit(lambda k: nf.realnvp(
            k, DIM, (HD, HD), nlayers=L, fused=fused, compute_dtype=cd,
            remat=not fused))(jax.random.key(0))

    rows = {}
    for name, fused, cd in (
        ("xla_bf16", False, jnp.bfloat16),
        ("fused_bf16", True, jnp.bfloat16),
        ("fused_f32", True, None),
    ):
        try:
            rows[name] = round(train_steps_per_s(mk(fused, cd), target,
                                                 BATCH), 1)
        except Exception as e:  # noqa: BLE001
            rows[name] = f"FAIL {type(e).__name__}: {e}"
        print(json.dumps({"experiment": "fused_bf16_wide_train",
                          "config": f"d={DIM} [{HD},{HD}]x{L} batch={BATCH}",
                          **rows}), flush=True)


if __name__ == "__main__":
    main()
