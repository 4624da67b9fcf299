"""Backward-gap ablation for the wide-RealNVP train step (VERDICT r4
item 3): name the non-matmul milliseconds between the measured full train
step and the step's matmul-only ceiling, with MEDIAN-of-7 slope timing
(the round-4 best-of-N protocol produced run-to-run swings larger than
the effects being chased — wide_ablate.py's proxy row alone moved
123→163 TFLOP/s between blocks of one run).

Segments:
  1. elbo fwd               — forward pass ceiling check (1x flops)
  2. train matmul proxy     — the step's exact matmul chain fwd+bwd via
                              jax.grad over pure matmul+tanh blocks (3x
                              flops): the achievable ceiling INCLUDING
                              backward at these shapes
  3. full step variants     — remat on/off x presample on/off,
                              Adam-moment dtype, scan unroll

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/bwd_ablate.py
"""

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask

sys.path.insert(0, str(Path(__file__).resolve().parent))
from roofline import PEAK_BF16_FLOPS  # noqa: E402

DIM, HD, L, BATCH = 128, 256, 10, 4096
CD = jnp.bfloat16
HALF = DIM // 2
MLP_FLOPS = 2 * (HALF * HD + HD * HD + HD * HALF)
FWD_FLOPS = BATCH * MLP_FLOPS * 2 * 2 * L
STEP_FLOPS = 3 * FWD_FLOPS


def report(name, st, flops):
    med, (q1, q3) = st["median"], st["iqr"]
    mfu = 100 * flops / med / PEAK_BF16_FLOPS if flops else 0.0
    mfu_lo = 100 * flops / q3 / PEAK_BF16_FLOPS if flops else 0.0
    mfu_hi = 100 * flops / q1 / PEAK_BF16_FLOPS if flops else 0.0
    print(f"{name:28s} {med*1e3:7.3f} ms  "
          f"[{q1*1e3:6.3f},{q3*1e3:6.3f}]  "
          f"MFU {mfu:5.1f}% [{mfu_lo:.1f},{mfu_hi:.1f}]", flush=True)
    return {"name": name, "ms_median": round(med * 1e3, 3),
            "ms_iqr": [round(q1 * 1e3, 3), round(q3 * 1e3, 3)],
            "mfu_pct": round(mfu, 1)}


def slope(fn, n1=10, n2=30, reps=7):
    def timed(m):
        t0 = time.perf_counter()
        float(jnp.ravel(fn(m))[0])
        return time.perf_counter() - t0
    timed(n1), timed(n2)  # compile
    return _paired(timed, n1, n2, reps)


def _paired(timed, n1, n2, reps):
    slopes = []
    for _ in range(reps):
        t1, t2 = timed(n1), timed(n2)
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-12))
    s = sorted(slopes)
    m = len(s) // 2
    med = s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])
    return {"median": med,
            "iqr": (s[int(0.25 * (len(s) - 1))],
                    s[int(0.75 * (len(s) - 1))])}


def build(remat):
    return jax.jit(lambda k: nf.realnvp(
        k, DIM, (HD, HD), nlayers=L, compute_dtype=CD, remat=remat)
    )(jax.random.key(0))


def seg_elbo_fwd(flow, target):
    @functools.partial(jax.jit, static_argnums=1)
    def ef(key, m):
        def body(c, k):
            return c + nf.elbo_batch(k, flow, target.log_prob, BATCH), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc
    return slope(lambda m: ef(jax.random.key(4), m))


def seg_train_matmul_proxy():
    """The step's matmul chain INCLUDING backward — scan over L blocks of
    4 MLPs in bf16 with f32 master weights, grad wrt stacked weights, an
    Adam update. MEASURED BROKEN as a ceiling proxy (2.97 ms — slower
    than the real step): without remat its scan saves every hidden
    activation (336 MB/step of residual traffic), so it measures the
    no-remat residual penalty, not a matmul ceiling. Kept as a negative
    control; the defended accounting instead uses the measured forward
    rate x the executed-flops multiple (see docs/performance.md
    'Backward accounting')."""
    k = jax.random.key(1)
    ks = jax.random.split(k, 6)
    Ws = {
        "W1": jax.random.normal(ks[0], (L, 4, HALF, HD), jnp.float32) * .02,
        "W2": jax.random.normal(ks[1], (L, 4, HD, HD), jnp.float32) * .02,
        "W3": jax.random.normal(ks[2], (L, 4, HD, HALF), jnp.float32) * .02,
    }
    x0 = jax.random.normal(ks[3], (BATCH, HALF), jnp.float32)
    opt = optax.adam(1e-3)
    st0 = opt.init(Ws)

    def fwd(Ws, x):
        def block(c, w):
            for j in range(4):
                h = jnp.tanh(_mm(c, w["W1"][j]))
                h = jnp.tanh(_mm(h, w["W2"][j]))
                c = c + _mm(h, w["W3"][j])
            return c, None
        out, _ = jax.lax.scan(block, x, Ws)
        return jnp.sum(out)

    def _mm(a, b):
        return jnp.matmul(a.astype(CD), b.astype(CD),
                          preferred_element_type=jnp.float32)

    def step(carry, _):
        Ws, st = carry
        loss, g = jax.value_and_grad(fwd)(Ws, x0)
        u, st = opt.update(g, st, Ws)
        return (optax.apply_updates(Ws, u), st), loss

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, m):
        (_, _), losses = jax.lax.scan(step, (Ws, st0), None, length=m)
        return losses[-1]

    return slope(lambda m: run(jax.random.key(2), m))


def seg_full_step(flow, target, presample, unroll=1, mu_dtype=None):
    opt = optax.adam(1e-3, mu_dtype=mu_dtype)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def step(carry, inp):
        f, s = carry
        if presample:
            lossf = lambda f: -nf.elbo_from_samples(  # noqa: E731
                inp, f, target.log_prob)
        else:
            lossf = lambda f: -nf.elbo_batch(  # noqa: E731
                inp, f, target.log_prob, BATCH)
        loss, g = jax.value_and_grad(lossf)(f)
        g = apply_mask(g, mask)
        u, s = opt.update(g, s, f)
        return (optax.apply_updates(f, u), s), loss

    st = opt.init(flow)

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, m):
        inp = (flow.base.sample(key, (m, BATCH)) if presample
               else jax.random.split(key, m))
        (_, _), losses = jax.lax.scan(step, (flow, st), inp, unroll=unroll)
        return losses[-1]

    return slope(lambda m: run(jax.random.key(5), m))


def main():
    target = nf.Banana(DIM, 1.0, 100.0)
    rows = []
    rows.append(report("train matmul proxy (3x)", seg_train_matmul_proxy(),
                       STEP_FLOPS))
    for remat in (True, False):
        flow = build(remat)
        rows.append(report(f"elbo fwd (remat={remat})",
                           seg_elbo_fwd(flow, target), FWD_FLOPS))
        for presample in (True, False):
            rows.append(report(
                f"step remat={int(remat)} presample={int(presample)}",
                seg_full_step(flow, target, presample), STEP_FLOPS))
    flow = build(True)
    rows.append(report("step remat=1 ps=1 mu_bf16",
                       seg_full_step(flow, target, True,
                                     mu_dtype=jnp.bfloat16), STEP_FLOPS))
    rows.append(report("step remat=1 ps=1 unroll=2",
                       seg_full_step(flow, target, True, unroll=2),
                       STEP_FLOPS))
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
