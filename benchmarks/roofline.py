"""Roofline / MFU accounting for the Pallas kernels and the training step
(VERDICT r2 item 4: "kernels at speed-of-light per chip" must be a number,
not a claim).

Model: TPU v5e (v5 lite) peaks — 197 TFLOP/s bf16 MXU, ~1/4 of that for
f32 (HIGHEST-precision matmuls run multi-pass), 819 GB/s HBM. Each
measurement reports an analytic flop/byte count per element or per step,
the achieved rate (two-size slope timing, host-fetch synced — same
methodology as bench.py), and the fraction of the binding roofline:

  * RQS spline kernel — elementwise, arithmetic-light (~60 flop/elem vs
    132 B/elem traffic → intensity ~0.45 flop/B, far left of the v5e
    ridge at ~240 flop/B): HBM-BANDWIDTH bound. Report achieved GB/s and
    % of 819 GB/s.
  * Fused coupling kernel / wide RealNVP training step — matmul-dominated:
    MXU bound. Report achieved TFLOP/s and % of the dtype's peak (MFU).

Writes benchmarks/ROOFLINE.md and prints one JSON line per measurement.

Usage: python benchmarks/roofline.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.ops import rqs_pallas
from normalizingflows.jl_tpu.utils.pytree import (
    apply_mask,
    trainable_mask,
)

HERE = Path(__file__).resolve().parent
MD_PATH = HERE / "ROOFLINE.md"

# v5e (TPU v5 lite) single-chip peaks
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 4  # multi-pass full-precision matmul
PEAK_HBM_BPS = 819e9


def _sync(x) -> float:
    """Host-fetch a scalar — the only reliable sync on tunneled backends."""
    return float(jnp.ravel(x)[0])


def _slope_stats(fn, n1: int, n2: int, reps: int = 5) -> dict:
    """Per-unit seconds via two-size slope, as a DISTRIBUTION.

    Runs ``reps`` independent paired measurements — each rep times one
    n1-unit and one n2-unit execution and forms the slope
    (t(n2) − t(n1)) / (n2 − n1), so the fixed dispatch overhead cancels
    within every rep — and reports the median slope with its IQR
    (VERDICT r4 item 2: every scoreboard number must carry spread; the
    old best-of-2 protocol produced a 25% unexplained envelope between
    artifacts). fn(n) must run n units on-device and return an array to
    fetch (host fetch = the only reliable sync on tunneled backends)."""
    def timed(n):
        t0 = time.perf_counter()
        _sync(fn(n))
        return time.perf_counter() - t0

    timed(n1), timed(n2)  # compile both sizes
    slopes = []
    for _ in range(reps):
        t1, t2 = timed(n1), timed(n2)
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-12))
    s = sorted(slopes)
    m = len(s) // 2
    median = s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])
    q1 = s[int(0.25 * (len(s) - 1))]
    q3 = s[int(0.75 * (len(s) - 1))]
    return {"median": median, "iqr": (q1, q3), "reps": reps,
            "slopes": slopes}


def _slope_time(fn, n1: int, n2: int, reps: int = 5) -> float:
    """Median per-unit seconds (see `_slope_stats`)."""
    return _slope_stats(fn, n1, n2, reps)["median"]


def _rate_fields(stats: dict, scale: float, round_to: int = 1) -> dict:
    """Convert a slope distribution into rate fields: median rate,
    [lo, hi] IQR band (note: rate = scale/slope, so the band flips), and
    rep count."""
    q1, q3 = stats["iqr"]
    return {
        "rate_median": round(scale / stats["median"], round_to),
        "rate_iqr": [round(scale / q3, round_to),
                     round(scale / q1, round_to)],
        "timing_reps": stats["reps"],
    }


# ---------------------------------------------------------------- RQS kernel

def rqs_flops_bytes(K: int):
    """Per-element analytic cost of the fused RQS forward.

    Traffic (f32): x in (4 B) + raw params in ((3K−1)·4 B) + y out (4 B)
    + logdet out (4 B). Compute: softmax+cumsum normalization ≈ 6 ops per
    raw param (exp, sum, div, cumsum add, scale, min-clamp) + bin search
    (K compares) + rational-quadratic eval (~30 flop).
    """
    bytes_per = 4 * (1 + (3 * K - 1) + 2)
    flops_per = 6 * (3 * K - 1) + K + 30
    return flops_per, bytes_per


def measure_rqs(n_elems: int = 1 << 22, K: int = 10, B: float = 30.0,
                interpret: bool = False):
    """Achieved HBM bandwidth of the fused RQS kernel at NSF-demo K.

    Operand convention: both operands resident in HBM in the kernel's
    native layouts (x (N,), raw param-major (3K−1, N) — what a fused
    conditioner emits); x varies per pass so XLA cannot CSE passes, raw
    stays resident (its producer's write traffic belongs to the producer's
    roofline, not this kernel's). ``interpret=True`` exists only to
    smoke-test the harness off-TPU."""
    kx, kr = jax.random.split(jax.random.key(0))
    x = jax.random.uniform(kx, (n_elems,), jnp.float32, -B, B)
    raw_t = jax.random.normal(kr, (3 * K - 1, n_elems), jnp.float32)

    # x/raw must be explicit ARGUMENTS: a closed-over device array is
    # embedded in the program as a constant, and on a remote-compile
    # backend a ~0.5 GB constant blows the compile-request size limit
    @functools.partial(jax.jit, static_argnums=3)
    def run(x, raw_t, key, m):
        def body(c, k):
            xi = x * jax.random.uniform(k, (), jnp.float32, 0.9, 1.1)
            y, ld = rqs_pallas.rqs_fused_t(xi, raw_t, B, inverse=False,
                                           interpret=interpret)
            return c + y[0] + ld[0], None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc

    st = _slope_stats(lambda m: run(x, raw_t, jax.random.key(1), m), 4, 12)
    per_pass = st["median"]
    flops_per, bytes_per = rqs_flops_bytes(K)
    gbps = n_elems * bytes_per / per_pass / 1e9
    rf = _rate_fields(st, n_elems / 1e9, 3)
    return {
        "measurement": "rqs_fused_forward",
        "config": f"n={n_elems}, K={K}, f32",
        "elems_per_s": rf["rate_median"],
        "elems_per_s_iqr": rf["rate_iqr"],
        "timing_reps": rf["timing_reps"],
        "unit_elems": "Gelem/s",
        "bytes_per_elem": bytes_per,
        "flops_per_elem": flops_per,
        "achieved_GBps": round(gbps, 1),
        "roofline": "HBM 819 GB/s",
        "pct_of_roofline": round(100 * gbps * 1e9 / PEAK_HBM_BPS, 1),
        "device": str(jax.devices()[0]),
    }


# ------------------------------------------------- wide RealNVP train step

def realnvp_train_flops(dim, hdims, nlayers, batch):
    """Matmul flops of ONE ELBO training step (fwd + backward ≈ 3× fwd:
    grad-wrt-input and grad-wrt-weight matmuls each cost one forward)."""
    half = dim // 2
    dims = [half, *hdims, half]
    mlp = sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))  # flops/sample
    fwd = batch * mlp * 2 * 2 * nlayers  # 2 MLPs (s,t) × 2 couplings
    return 3 * fwd


def measure_wide_train(dim=128, hdims=(256, 256), nlayers=10, batch=4096,
                       compute_dtype=None, n=30, presample=True):
    """MFU of the wide-RealNVP training step (MXU-bound regime).
    ``remat=True``: at this width the scan's saved activations cost ~1 ms
    of HBM traffic per step — recomputing them is the right trade
    (measured 2.7 → 2.0 ms bf16, benchmarks/wide_ablate.py).
    ``presample=True``: all steps' base draws in ONE fused RNG op before
    the scan (bench.py's established chunk methodology) — the per-step
    threefry otherwise charges RNG time to the train-step slope."""
    flow = jax.jit(
        lambda k: nf.realnvp(k, dim, hdims, nlayers=nlayers,
                             compute_dtype=compute_dtype, remat=True)
    )(jax.random.key(0))
    target = nf.Banana(dim, 1.0, 100.0)
    optimizer = optax.adam(1e-3)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def train_step(carry, xs_or_key):
        f, st = carry

        def loss(f):
            if presample:
                return -nf.elbo_from_samples(xs_or_key, f, target.log_prob)
            return -nf.elbo_batch(xs_or_key, f, target.log_prob, batch)

        loss_val, grads = jax.value_and_grad(loss)(f)
        grads = apply_mask(grads, mask)
        updates, st = optimizer.update(grads, st, f)
        return (optax.apply_updates(f, updates), st), loss_val

    opt_state = optimizer.init(flow)

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, m):
        xs = (flow.base.sample(key, (m, batch)) if presample
              else jax.random.split(key, m))
        (_, _), losses = jax.lax.scan(
            train_step, (flow, opt_state), xs
        )
        return losses[-1]

    st = _slope_stats(lambda m: run(jax.random.key(1), m), n, 3 * n)
    per_step = st["median"]
    flops = realnvp_train_flops(dim, hdims, nlayers, batch)
    achieved = flops / per_step
    peak = PEAK_BF16_FLOPS if compute_dtype == jnp.bfloat16 else PEAK_F32_FLOPS
    dt = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
    rf = _rate_fields(st, 1.0)
    q1, q3 = st["iqr"]
    return {
        "measurement": f"realnvp_wide_train_{dt}",
        "config": f"d={dim}, hdims={list(hdims)}, L={nlayers}, batch={batch}",
        "steps_per_s": rf["rate_median"],
        "steps_per_s_iqr": rf["rate_iqr"],
        "timing_reps": rf["timing_reps"],
        "matmul_flops_per_step": flops,
        "achieved_TFLOPs": round(achieved / 1e12, 2),
        "roofline": f"MXU {dt} {peak/1e12:.0f} TFLOP/s",
        "pct_of_roofline_MFU": round(100 * achieved / peak, 1),
        "pct_of_roofline_MFU_iqr": [round(100 * flops / q3 / peak, 1),
                                    round(100 * flops / q1 / peak, 1)],
        "device": str(jax.devices()[0]),
    }


def measure_nsf_wide_train(dim=64, hdims=(128, 128), K=10, nlayers=10,
                           batch=4096, compute_dtype=None, n=10,
                           remat=True, mxu_rate=None):
    """NSF training step in the THROUGHPUT regime (the bench's NSF row is
    the latency-class demo config, batch 64/d=2). The step mixes
    conditioner matmuls (MXU) with the fused RQS kernel (VPU), so the
    single-roof MFU model does not apply; reported as steps/s plus the
    spline-element throughput (batch × dim × nlayers per forward)."""
    flow = jax.jit(
        lambda k: nf.nsf(k, dim, hdims, K=K, nlayers=nlayers,
                         identity_init=True, compute_dtype=compute_dtype,
                         remat=remat)
    )(jax.random.key(0))
    target = nf.Banana(dim, 1.0, 100.0)
    optimizer = optax.adam(1e-3)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def train_step(carry, xs):
        f, st = carry
        loss_val, grads = jax.value_and_grad(
            lambda f: -nf.elbo_from_samples(xs, f, target.log_prob))(f)
        grads = apply_mask(grads, mask)
        updates, st = optimizer.update(grads, st, f)
        return (optax.apply_updates(f, updates), st), loss_val

    opt_state = optimizer.init(flow)

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, m):
        xs = flow.base.sample(key, (m, batch))
        (_, _), losses = jax.lax.scan(train_step, (flow, opt_state), xs)
        return losses[-1]

    st = _slope_stats(lambda m: run(jax.random.key(1), m), n, 3 * n)
    per_step = st["median"]
    elems = batch * dim * nlayers  # spline elements per forward
    dt = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
    rf = _rate_fields(st, 1.0)
    row = {
        "measurement": f"nsf_wide_train_{dt}"
                       + ("" if remat else "_noremat"),
        "config": f"d={dim}, hdims={list(hdims)}, K={K}, L={nlayers}, "
                  f"batch={batch}",
        "steps_per_s": rf["rate_median"],
        "steps_per_s_iqr": rf["rate_iqr"],
        "timing_reps": rf["timing_reps"],
        "spline_elems_per_fwd": elems,
        "spline_Melems_per_s": round(elems / per_step / 1e6, 1),
        "roofline": "mixed MXU(conditioners)+VPU(RQS) — two-term bound",
        "device": str(jax.devices()[0]),
    }
    bound = nsf_two_term_bound(dim, hdims, K, nlayers, batch,
                               compute_dtype, mxu_rate=mxu_rate)
    row.update(bound)
    row["pct_of_roofline"] = round(
        100 * bound["two_term_bound_s"] / per_step, 1)
    return row


def nsf_two_term_bound(dim, hdims, K, nlayers, batch, compute_dtype,
                       mxu_rate=None, vpu_gelem_s=None):
    """Combined lower bound on NSF train-step time (VERDICT r4 item 4):

        t_step ≥ conditioner matmul flops / achieved MXU rate
               + spline elems (fwd+bwd) / achieved VPU kernel rate

    Each term uses the MEASURED component ceiling for this chip, not the
    paper peak: the MXU rate is what the wide-RealNVP step achieves on
    comparable matmul shapes (`measure_wide_train`; pass its
    achieved_TFLOPs in as ``mxu_rate`` for a same-run bound), and the
    VPU rate is the fused RQS kernel's measured TRAIN-PATH throughput
    AT THE STEP'S ACTUAL PER-CALL SIZE — fwd + custom-VJP backward via
    value_and_grad over a chain of sequential dependent calls of
    batch×dim/2 elements each, exactly how the layer scan issues them:
    1.247 Gelem/s at 131k elems/call with the analytic backward
    (benchmarks/nsf_gap.py, 2026-08-21; 0.945 with the retired
    jax.vjp-tape backward; the 4M-element standalone figures in
    KERNELS.md are a different regime). The two resources CAN overlap
    in principle, so the sum is conservative by at most the smaller
    term."""
    half = dim // 2
    # conditioner: dim/2 -> hdims -> (3K-1)*dim/2, one per coupling,
    # 2 couplings per block; backward ≈ 3× forward matmul flops
    dims = [half, *hdims, (3 * K - 1) * half]
    mlp = sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))
    matmul_flops = 3 * batch * mlp * 2 * nlayers
    if mxu_rate is None:
        # measured wide-train achieved rate (ROOFLINE
        # realnvp_wide_train rows): ~55% of 197 TFLOP/s for bf16
        # conditioners, ~39% of 49 TFLOP/s for f32
        mxu_rate = (0.55 * PEAK_BF16_FLOPS
                    if compute_dtype == jnp.bfloat16
                    else 0.39 * PEAK_F32_FLOPS)
    if vpu_gelem_s is None:
        vpu_gelem_s = 1.247  # measured fwd+analytic-VJP rate at the
        # step's per-call size (benchmarks/nsf_gap.py)
    spline_elems = batch * dim * nlayers
    t_mxu = matmul_flops / mxu_rate
    t_vpu = spline_elems / (vpu_gelem_s * 1e9)
    return {
        "two_term_bound_s": t_mxu + t_vpu,
        "two_term_bound_steps_per_s": round(1.0 / (t_mxu + t_vpu), 1),
        "bound_matmul_ms": round(t_mxu * 1e3, 3),
        "bound_vpu_ms": round(t_vpu * 1e3, 3),
    }


# --------------------------------------------------- fused coupling forward

def coupling_fwd_flops_bytes(dim, hdims, nlayers, batch):
    half = dim // 2
    dims = [half, *hdims, half]
    mlp = sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))
    flops = batch * mlp * 2 * 2 * nlayers
    bytes_ = 4 * batch * dim * 2  # x in, y out (weights VMEM-resident)
    return flops, bytes_


def measure_fused_sampling(dim=2, hdims=(16, 16), nlayers=3,
                           batch=262144, fused=True):
    """Flow sampling path vs the HBM roof at small dim (16 B/sample of
    true I/O). ``fused=True`` = the whole-stack coupling kernel, measured
    at its winning batch (per-layer HBM round-trips eliminated;
    KERNELS.md); ``fused=False`` = the default XLA path at a saturating
    batch — the production sampling configuration bench.py reports."""
    flow = jax.jit(
        lambda k: nf.realnvp(k, dim, hdims, nlayers=nlayers, fused=fused)
    )(jax.random.key(0))

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, m):
        def body(c, k):
            s = flow.sample(k, (batch,))
            return c + s[0, 0] + s[-1, -1], None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, m))
        return acc

    st = _slope_stats(lambda m: run(jax.random.key(1), m), 4, 12)
    per_pass = st["median"]
    flops, bytes_ = coupling_fwd_flops_bytes(dim, hdims, nlayers, batch)
    gbps = bytes_ / per_pass / 1e9
    tflops = flops / per_pass / 1e12
    rf = _rate_fields(st, batch / 1e6, 2)
    # intensity 432 flop/B is ABOVE the v5e ridge (~240): the binding roof
    # is the f32 MXU, not HBM — but the [16,16] conditioner matmuls are far
    # too small to tile a 128×128 systolic array, so the honest reading of
    # this % is "occupancy-bound by tiny matmuls", quantified.
    return {
        "measurement": ("coupling_fused_sampling" if fused
                        else "sampling_xla_default"),
        "config": f"d={dim}, hdims={list(hdims)}, L={nlayers}, batch={batch}",
        "samples_per_s": rf["rate_median"],
        "samples_per_s_iqr": rf["rate_iqr"],
        "timing_reps": rf["timing_reps"],
        "unit_samples": "Msamples/s",
        "flops_per_pass": flops,
        "bytes_per_pass": bytes_,
        "achieved_GBps": round(gbps, 1),
        "achieved_TFLOPs": round(tflops, 2),
        "roofline": f"MXU f32 {PEAK_F32_FLOPS/1e12:.0f} TFLOP/s (intensity "
                    f"{flops/bytes_:.1f} flop/B > ridge → compute-bound; "
                    "tiny-matmul occupancy is the real ceiling)",
        "pct_of_roofline": round(100 * tflops * 1e12 / PEAK_F32_FLOPS, 1),
        "device": str(jax.devices()[0]),
    }


def write_md(rows):
    lines = [
        "# ROOFLINE — measured kernel rates vs v5e speed-of-light",
        "",
        "Peaks assumed: 197 TFLOP/s bf16 MXU (f32 ≈ 1/4 via multi-pass),",
        "819 GB/s HBM. Every rate is the MEDIAN of ≥5 independent",
        "two-size-slope measurements with its IQR in brackets (fixed",
        "dispatch overhead cancels within each rep; sync via host scalar",
        "fetch). Analytic flop/byte models in `benchmarks/roofline.py`",
        "docstrings.",
        "",
        "| measurement | config | rate (median [IQR]) | analytic cost | "
        "achieved | roofline | % of roof |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        def _band(key):
            iqr = r.get(key + "_iqr")
            return f" [{iqr[0]}–{iqr[1]}]" if iqr else ""
        rate = (f"{r.get('steps_per_s')}{_band('steps_per_s')} steps/s"
                if "steps_per_s" in r else
                f"{r.get('elems_per_s')}{_band('elems_per_s')} Gelem/s"
                if "elems_per_s" in r else
                f"{r.get('samples_per_s')}{_band('samples_per_s')} "
                "Msamples/s")
        cost = (f"{r['matmul_flops_per_step']:.3g} flop/step"
                if "matmul_flops_per_step" in r else
                f"{r['spline_elems_per_fwd']} spline elems/fwd "
                f"({r['spline_Melems_per_s']} M/s)"
                if "spline_elems_per_fwd" in r else
                f"{r.get('bytes_per_elem', r.get('bytes_per_pass'))} B, "
                f"{r.get('flops_per_elem', r.get('flops_per_pass'))} flop")
        ach = (f"{r['achieved_TFLOPs']} TFLOP/s" if "achieved_TFLOPs" in r
               else f"{r['achieved_GBps']} GB/s" if "achieved_GBps" in r
               else f"{r['spline_Melems_per_s']} Melem/s")
        pct = r.get("pct_of_roofline_MFU", r.get("pct_of_roofline", "—"))
        lines.append(
            f"| {r['measurement']} | {r['config']} | {rate} | {cost} | "
            f"{ach} | {r['roofline']} | {pct}% |"
        )
    lines += [
        "",
        "Interpretation:",
        "",
        "- The RQS kernel's naive flop/byte intensity (~1.7) puts it left",
        "  of the MXU ridge, but its binding roof is the VPU, NOT HBM —",
        "  MEASURED (2026-08-21, benchmarks/rqs_tune.py): reading raw in",
        "  bf16 (halving the dominant traffic term) moved throughput only",
        "  1.55 → 1.71 Gelem/s (+10%), and an 8-sublane element layout",
        "  (v3) that targets vreg occupancy was 20-35% SLOWER. Per element",
        "  the kernel executes ~30 transcendentals (2 softmaxes, softplus,",
        "  logs — multi-slot on the VPU) plus ~120 one-hot gather MACs",
        "  over K sublane rows, ~5 op-slots/B. The HBM %% below is kept",
        "  for continuity; the honest ceiling at K=10 is VPU throughput,",
        "  and the kernel's win over the XLA oracle (7.3x on the NSF",
        "  train config) already reflects eliminating the oracle's",
        "  materialized knot tables.",
        "- The wide-RealNVP training step is matmul-dominated; its figure",
        "  is MFU (model flops / peak). The demo-size configs (d=2,",
        "  [16,16]) are dispatch/latency-bound and intentionally NOT",
        "  presented as roofline evidence.",
        "- The NSF wide-train row's %% is against the TWO-TERM bound",
        "  (`roofline.nsf_two_term_bound`): step time ≥ conditioner",
        "  matmul flops / this run's measured bf16 MXU rate + spline",
        "  elems / the RQS kernel's measured fwd+VJP rate (0.67 Gelem/s,",
        "  KERNELS.md). The bound assumes zero overlap between MXU and",
        "  VPU work, so it is conservative by at most the smaller term.",
        "- The d=2 sampling rows have intensity ABOVE the ridge, so their",
        "  binding roof is the f32 MXU — but [16,16] conditioner matmuls",
        "  cannot fill a 128×128 systolic array, so the small % measures",
        "  tiny-matmul occupancy, not a fixable bandwidth gap. The",
        "  absolute samples/s figure is the deliverable for this",
        "  latency-class config.",
        "",
        f"Device: `{rows[0]['device'] if rows else '?'}`.",
    ]
    MD_PATH.write_text("\n".join(lines) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    a = p.parse_args()

    rows = []
    rows.append(measure_rqs(n_elems=1 << (18 if a.quick else 22)))
    print(json.dumps(rows[-1]), flush=True)
    rows.append(measure_wide_train(batch=1024 if a.quick else 4096,
                                   n=10 if a.quick else 30))
    print(json.dumps(rows[-1]), flush=True)
    rows.append(measure_wide_train(batch=1024 if a.quick else 4096,
                                   compute_dtype=jnp.bfloat16,
                                   n=10 if a.quick else 30))
    print(json.dumps(rows[-1]), flush=True)
    # same-run bound: the NSF two-term roof's MXU rate is THIS run's
    # measured bf16 wide-train rate (VERDICT r4 items 2+4 — one artifact,
    # one number)
    bf16_rate = rows[-1]["achieved_TFLOPs"] * 1e12
    rows.append(measure_nsf_wide_train(batch=1024 if a.quick else 4096,
                                       compute_dtype=jnp.bfloat16,
                                       n=5 if a.quick else 10,
                                       mxu_rate=bf16_rate))
    print(json.dumps(rows[-1]), flush=True)
    if jax.default_backend() == "tpu":
        # default XLA sampling at saturating batch (the production path;
        # the fused whole-stack kernel is a measured net loss at current
        # XLA — see KERNELS.md — so it is not a roofline row)
        rows.append(measure_fused_sampling(
            batch=32768 if a.quick else 262144, fused=False))
        print(json.dumps(rows[-1]), flush=True)
    write_md(rows)


if __name__ == "__main__":
    main()
