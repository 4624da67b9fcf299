"""RQS kernel tuning experiments: oracle-vs-kernel at large N, BLK sweep.

Scratch harness behind the ROOFLINE.md numbers — run on a real TPU:
    PYTHONPATH=.:/root/.axon_site python benchmarks/rqs_tune.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from normalizingflows.jl_tpu.ops import rqs as oracle
from normalizingflows.jl_tpu.ops import rqs_pallas


def slope_time(fn, n1=4, n2=12, reps=3):
    def timed(m):
        best = float("inf")
        for i in range(reps + 1):
            t0 = time.perf_counter()
            float(jnp.ravel(fn(m))[0])
            if i:
                best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = timed(n1), timed(n2)
    return max((t2 - t1) / (n2 - n1), 1e-12)


def bench(name, transform, n, K, B=30.0, param_major=False,
          raw_dtype=jnp.float32):
    """``param_major=True`` stores raw as (3K−1, N) — the kernel's native
    layout — so no transpose appears anywhere in the measured program.
    ``raw_dtype=bf16`` halves the dominant traffic term (diagnostic: if
    elem/s doubles the kernel is DMA-bound; if unchanged, compute-bound)."""
    kx, kr = jax.random.split(jax.random.key(0))
    x = jax.random.uniform(kx, (n,), jnp.float32, -B, B)
    raw = jax.random.normal(kr, (n, 3 * K - 1), jnp.float32)
    if param_major:
        raw = raw.T
    raw = raw.astype(raw_dtype)

    @functools.partial(jax.jit, static_argnums=3)
    def run(x, raw, key, m):
        def body(c, k):
            # scale ONLY x per pass: raw stays HBM-resident (the roofline
            # convention of benchmarks/roofline.py::measure_rqs — scaling
            # raw too materialized a fresh (3K−1, N) array per pass, ~3×
            # the counted traffic, which silently diluted every GB/s
            # figure this harness printed before 2026-08-21)
            u = jax.random.uniform(k, (), jnp.float32, 0.9, 1.1)
            y, ld = transform(x * u, raw)
            return c + y[0] + ld[0], None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc

    per_pass = slope_time(lambda m: run(x, raw, jax.random.key(1), m))
    bytes_per = 4 * (1 + 2) + raw.dtype.itemsize * (3 * K - 1)
    gbps = n * bytes_per / per_pass / 1e9
    print(f"{name:32s} n={n:>9d} K={K}  {n/per_pass/1e9:8.3f} Gelem/s  "
          f"{gbps:7.1f} GB/s ({100*gbps/819:.1f}% HBM)", flush=True)
    return gbps


def oracle_transform(x, raw):
    # params-from-raw + forward, all in XLA
    B = 30.0
    K = (raw.shape[-1] + 1) // 3
    px, py, d = oracle.rqs_params_from_raw(raw, B)
    return oracle.rqs_forward(x, px, py, d)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 22)
    p.add_argument("--K", type=int, default=10)
    a = p.parse_args()

    # elem-major XLA oracle is ~100× slower than the kernel at 4M — time
    # it at n/16 (rates are size-stable there) so the sweep isn't
    # dominated by oracle wall-clock
    bench("oracle (XLA)", oracle_transform, max(a.n // 16, 1 << 18), a.K)
    shipped = (rqs_pallas.LANES_FWD, rqs_pallas.ROWS_FWD)
    try:
        for rows, lanes in ((1, 2048), (1, 4096), (8, 512), (8, 1024),
                            (8, 2048), (16, 1024)):
            rqs_pallas.ROWS_FWD = rows
            rqs_pallas.LANES_FWD = lanes
            bench(f"pallas param-major r={rows} lanes={lanes}",
                  lambda x, raw_t: rqs_pallas.rqs_fused_t(x, raw_t, 30.0),
                  a.n, a.K, param_major=True)
        rqs_pallas.ROWS_FWD, rqs_pallas.LANES_FWD = 1, 2048
        bench("pallas param-major bf16-raw (DMA-vs-compute diag)",
              lambda x, raw_t: rqs_pallas.rqs_fused_t(x, raw_t, 30.0),
              a.n, a.K, param_major=True, raw_dtype=jnp.bfloat16)

        # fwd+bwd rate: value_and_grad through the custom VJP — measures
        # the in-kernel-vjp backward kernel (LANES_BWD tile), the NSF
        # train step's dominant RQS cost
        def fwd_bwd(x, raw_t):
            def loss(x, raw_t):
                y, ld = rqs_pallas.rqs_fused_t(x, raw_t, 30.0)
                return jnp.sum(y) + jnp.sum(ld)
            _, (gx, graw) = jax.value_and_grad(loss, argnums=(0, 1))(
                x, raw_t)
            return gx, graw[0]

        bench("pallas fwd+bwd (train path)", fwd_bwd, a.n, a.K,
              param_major=True)
    finally:
        # restore the shipped defaults — the sweep must not leak tuning
        # state into anything run after main() in the same process
        rqs_pallas.LANES_FWD, rqs_pallas.ROWS_FWD = shipped


if __name__ == "__main__":
    main()
