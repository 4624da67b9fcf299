"""Name the NSF wide-train forward gap (VERDICT r4 item 4 follow-through).

KERNELS.md components for the d=64/[128,128]x10/batch-4096 bf16 step:
RQS fwd+bwd ~3.9 ms + conditioners ~1.5 ms, yet fwd-only measured 5.5 ms
and the step 16.6 ms. Hypothesis: the kernel's throughput collapses at
the per-call size the flow actually issues (4096x32 = 131k elements per
coupling, 20 sequential calls per forward) versus the 4M-element
standalone benchmark size.

Measures, median-of-5:
  1. rqs_fused_t forward rate at n = 131k / 512k / 4M
  2. fwd+VJP (train path) rate at the same sizes
  3. NSF wide flow forward (sample_and_log_prob) vs its component model
  4. tile-size A/B at the small call size (LANES_FWD 1024/2048/4096/8192)
     - the measured optimization attempt for the small-call regime

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/nsf_gap.py
"""

import functools
import json
import time
from pathlib import Path
import sys

import jax
import jax.numpy as jnp

import normalizingflows as nf
from normalizingflows.jl_tpu.ops import rqs_pallas

sys.path.insert(0, str(Path(__file__).resolve().parent))

K, B = 10, 30.0
DIM, HD, L_BLOCKS, BATCH = 64, 128, 10, 4096


def _paired(timed, n1, n2, reps=5):
    slopes = []
    for _ in range(reps):
        t1, t2 = timed(n1), timed(n2)
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-12))
    s = sorted(slopes)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def kernel_rate(n, train_path=False, reps=5):
    """Gelem/s of the param-major kernel at per-call size n, issued as a
    CHAIN of sequential dependent calls (matching the flow's layer scan:
    each call's x depends on the previous call's y)."""
    kx, kr = jax.random.split(jax.random.key(0))
    x = jax.random.uniform(kx, (n,), jnp.float32, -B, B)
    raw_t = jax.random.normal(kr, (3 * K - 1, n), jnp.float32)

    if train_path:
        def one(x, raw_t):
            def f(x, r):
                y, ld = rqs_pallas.rqs_fused_t(x, r, B)
                return jnp.sum(y) + jnp.sum(ld)
            val, (gx, gr) = jax.value_and_grad(f, argnums=(0, 1))(x, raw_t)
            return x + gx * 1e-6, val
    else:
        def one(x, raw_t):
            y, ld = rqs_pallas.rqs_fused_t(x, raw_t, B)
            return y, jnp.sum(ld)

    @functools.partial(jax.jit, static_argnums=2)
    def chain(x, raw_t, m):
        def body(c, _):
            x, acc = c
            out, v = one(x, raw_t)
            return (out * 0.999, acc + v), None
        (x, acc), _ = jax.lax.scan(body, (x, jnp.zeros(())), None, length=m)
        return acc

    def timed(m):
        t0 = time.perf_counter()
        float(chain(x, raw_t, m))
        return time.perf_counter() - t0

    timed(4), timed(12)
    per_call = _paired(timed, 4, 12, reps)
    return n / per_call / 1e9


def nsf_fwd_time(reps=5):
    flow = jax.jit(
        lambda k: nf.nsf(k, DIM, (HD, HD), K=K, nlayers=L_BLOCKS,
                         identity_init=True, compute_dtype=jnp.bfloat16)
    )(jax.random.key(0))

    @functools.partial(jax.jit, static_argnums=1)
    def fwd(key, m):
        def body(c, k):
            y, lq = flow.sample_and_log_prob(k, (BATCH,))
            return c + y[0, 0] + lq[0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc

    def timed(m):
        t0 = time.perf_counter()
        float(fwd(jax.random.key(3), m))
        return time.perf_counter() - t0

    timed(5), timed(15)
    return _paired(timed, 5, 15, reps)


def fwd_parts(reps=5):
    """Binary-search the NSF forward's 3.4 ms of unexplained glue: time
    nested sub-programs of the real forward and difference them.
      a. conditioners only (20 chained MLP calls, bf16)
      b. + reshape → bf16 raw → param-major transpose → RQS kernel
         (the full per-coupling `_transform` pipeline, 20 chained)
      c. full SplinePairStack.forward_and_log_det (adds split carry,
         interleave, logdet sums, scan structure)
      d. full sample_and_log_prob (adds base sample + base log_prob)
    """
    from normalizingflows.jl_tpu.models.spline import SplinePairStack

    flow = jax.jit(
        lambda k: nf.nsf(k, DIM, (HD, HD), K=K, nlayers=L_BLOCKS,
                         identity_init=True, compute_dtype=jnp.bfloat16)
    )(jax.random.key(0))
    stack = flow.bijector.bijectors[0]
    assert isinstance(stack, SplinePairStack)
    half = DIM // 2
    x = jax.random.normal(jax.random.key(1), (BATCH, DIM))
    xa, xb = x[..., 0::2], x[..., 1::2]

    def chained(body):
        @functools.partial(jax.jit, static_argnums=1)
        def run(key, m):
            def outer(c, k):
                return body(c, k), None
            c0 = (xa, xb, jnp.zeros(()))
            (a, b, acc), _ = jax.lax.scan(
                outer, c0, jax.random.split(key, m))
            return acc

        def timed(m):
            t0 = time.perf_counter()
            float(run(jax.random.key(2), m))
            return time.perf_counter() - t0

        timed(5), timed(15)
        return _paired(timed, 5, 15, reps)

    nns = stack.stacked  # {'even'|'odd': stacked MLPs with leading L axis}

    def conds_only(c, k):
        a, b, acc = c
        def blk(carry, nn2):
            a, b, s = carry
            ra = nn2["even"](b)
            rb = nn2["odd"](a)
            return (a, b, s + jnp.sum(ra[..., :1]) + jnp.sum(rb[..., :1])), None
        (a, b, s), _ = jax.lax.scan(blk, (a, b, jnp.zeros(())), nns)
        return (a * 0.999, b, acc + s)

    def transform_pipeline(c, k):
        a, b, acc = c
        def blk(carry, nn2):
            a, b, s = carry
            ya, lde = stack._transform(a, nn2["even"], b, False)
            yb, ldo = stack._transform(b, nn2["odd"], ya, False)
            return (ya, yb, s + jnp.sum(lde) + jnp.sum(ldo)), None
        (a, b, s), _ = jax.lax.scan(blk, (a, b, jnp.zeros(())), nns)
        return (a * 0.999, b, acc + s)

    def full_stack(c, k):
        a, b, acc = c
        y, ld = stack.forward_and_log_det(
            jax.random.normal(k, (BATCH, DIM)))
        return (a, b, acc + y[0, 0] + ld[0])

    def full_flow(c, k):
        a, b, acc = c
        y, lq = flow.sample_and_log_prob(k, (BATCH,))
        return (a, b, acc + y[0, 0] + lq[0])

    for name, body in (("a_conds_only", conds_only),
                       ("b_transform_pipeline", transform_pipeline),
                       ("c_full_stack", full_stack),
                       ("d_full_flow", full_flow)):
        t = chained(body)
        print(json.dumps({"segment": name, "ms": round(t * 1e3, 3)}),
              flush=True)


def main():
    if "--fwd-parts" in sys.argv:
        fwd_parts()
        return
    rows = []
    n_call = BATCH * (DIM // 2)  # the flow's actual per-call size
    for n in (n_call, 4 * n_call, 32 * n_call):
        fr = kernel_rate(n)
        tr = kernel_rate(n, train_path=True)
        rows.append({"n_per_call": n, "fwd_Gelem_s": round(fr, 3),
                     "fwd_bwd_Gelem_s": round(tr, 3)})
        print(json.dumps(rows[-1]), flush=True)

    t_fwd = nsf_fwd_time()
    # component model: 20 kernel calls at the small-call measured rate +
    # conditioner matmul time from the wide-train MXU rate
    small_rate = rows[0]["fwd_Gelem_s"] * 1e9
    t_kernel = 20 * n_call / small_rate
    half = DIM // 2
    dims = [half, HD, HD, (3 * K - 1) * half]
    mlp = sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))
    t_mm = BATCH * mlp * 20 / (0.55 * 197e12)
    out = {
        "nsf_fwd_ms": round(t_fwd * 1e3, 3),
        "model_kernel_ms_at_small_call_rate": round(t_kernel * 1e3, 3),
        "model_matmul_ms": round(t_mm * 1e3, 3),
        "unexplained_ms": round((t_fwd - t_kernel - t_mm) * 1e3, 3),
    }
    print(json.dumps(out), flush=True)

    # tile-size A/B at the small call size (the measured attempt)
    for lanes in (1024, 2048, 4096, 8192):
        rqs_pallas.LANES_FWD = lanes
        r = kernel_rate(n_call)
        print(json.dumps({"LANES_FWD": lanes, "n": n_call,
                          "fwd_Gelem_s": round(r, 3)}), flush=True)
    rqs_pallas.LANES_FWD = 2048


if __name__ == "__main__":
    main()
