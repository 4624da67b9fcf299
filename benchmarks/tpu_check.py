"""TPU-compiled regression assertions (VERDICT r3 item 6).

The pytest suite pins everything on CPU (tests/conftest.py) — compiled-
Mosaic/XLA:TPU drift was previously only visible as benchmark noise. This
script is the assertion-backed lane: it compiles the Pallas kernels and the
training step ON THE REAL CHIP and asserts numerics against the CPU oracle
(reference CI analogue: `/root/reference/.github/workflows/CI.yml:22-29`
runs the whole suite on every push).

Run before each round snapshot:
    PYTHONPATH=.:/root/.axon_site python benchmarks/tpu_check.py
Exits non-zero on any failed assertion; prints one PASS line per check.
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import normalizingflows as nf
from normalizingflows.jl_tpu.ops import rqs as rqs_oracle
from normalizingflows.jl_tpu.ops import rqs_pallas

CHECKS = []


def check(fn):
    CHECKS.append(fn)
    return fn


def _cpu():
    return jax.devices("cpu")[0]


def _tpu():
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        raise SystemExit("tpu_check requires a TPU device (got CPU only)")
    return dev


@check
def rqs_forward_inverse_vs_oracle():
    """Compiled fused RQS fwd/inv vs the jnp ORACLE COMPILED ON THE SAME
    CHIP (Mosaic-vs-XLA:TPU is the drift this lane exists to catch; the
    cross-platform CPU comparison lives in the interpret-mode pytest
    suite, where rounding is shared). y is continuous in x, so a tight
    max-abs tolerance holds; the round-trip closes on-chip."""
    K, B, n = 10, 30.0, 1 << 16
    kx, kr = jax.random.split(jax.random.key(0))
    x = jax.random.uniform(kx, (n,), jnp.float32, -1.2 * B, 1.2 * B)
    raw = jax.random.normal(kr, (n, 3 * K - 1), jnp.float32)

    with jax.default_device(_tpu()):
        def oracle(x, raw):
            px, py, d = rqs_oracle.rqs_params_from_raw(raw, B)
            return rqs_oracle.rqs_forward(x, px, py, d)

        y_ref, ld_ref = jax.jit(oracle)(x, raw)
        y_ref, ld_ref = np.asarray(y_ref), np.asarray(ld_ref)
        y, ld = jax.jit(
            lambda x, raw: rqs_pallas.rqs_fused(x, raw, B)
        )(x, raw)
        yi, ldi = jax.jit(
            lambda y, raw: rqs_pallas.rqs_fused(y, raw, B, inverse=True)
        )(y, raw)
        y, ld = np.asarray(y), np.asarray(ld)
        yi, ldi = np.asarray(yi), np.asarray(ldi)

    # Mosaic and XLA:TPU exp/softmax differ at the ulp level; a 1e-6
    # relative knot shift scales by B=30 and the local spline slope to
    # ~2.7e-4 worst-element y diff (measured 2026-08-21 AFTER fixing the
    # oracle's cumsum, which was the real 6e-3 drift). 5e-4 = headroom
    # over that floor while still catching any structural regression.
    assert np.max(np.abs(y - y_ref)) <= 5e-4, np.max(np.abs(y - y_ref))
    assert np.max(np.abs(ld - ld_ref)) <= 1e-3, np.max(np.abs(ld - ld_ref))
    # round-trip conditioning: with RANDOM raw params the derivative
    # floor is min_derivative=1e-3, so the inverse amplifies y-side
    # rounding by up to 1e3 inside near-flat bins — the worst element
    # lands ~6e-3 (measured). Bound the bulk tightly and the worst
    # element by the conditioning-aware ceiling.
    rt = np.abs(yi - np.asarray(x))
    assert np.quantile(rt, 0.999) <= 1e-3, np.quantile(rt, 0.999)
    assert np.max(rt) <= 2e-2, np.max(rt)
    assert np.max(np.abs(ldi + ld)) <= 1e-2, np.max(np.abs(ldi + ld))


@check
def rqs_vjp_vs_oracle():
    """Compiled in-kernel VJP vs XLA:TPU autodiff of the oracle, same
    chip. Gradients JUMP at bin boundaries (the spline is C¹, so d(ld)/dx
    is discontinuous at knots) — a 1-ulp knot-position difference between
    Mosaic and XLA legitimately flips a borderline element's bin and
    produces an O(1) element diff. The check is therefore robust: the
    99.9th percentile must be tight AND outliers must be measure-zero-
    rare, instead of a bare max."""
    K, B, n = 10, 30.0, 1 << 14
    kx, kr, kg = jax.random.split(jax.random.key(1), 3)
    x = jax.random.uniform(kx, (n,), jnp.float32, -B, B)
    raw = jax.random.normal(kr, (n, 3 * K - 1), jnp.float32)
    gy = jax.random.normal(kg, (n,), jnp.float32)

    def loss_kernel(x, raw):
        y, ld = rqs_pallas.rqs_fused(x, raw, B)
        return jnp.sum(y * gy) + jnp.sum(ld)

    def loss_oracle(x, raw):
        px, py, d = rqs_oracle.rqs_params_from_raw(raw, B)
        y, ld = rqs_oracle.rqs_forward(x, px, py, d)
        return jnp.sum(y * gy) + jnp.sum(ld)

    with jax.default_device(_tpu()):
        gx_ref, graw_ref = jax.jit(
            jax.grad(loss_oracle, argnums=(0, 1)))(x, raw)
        gx_ref, graw_ref = np.asarray(gx_ref), np.asarray(graw_ref)
        gx, graw = jax.jit(jax.grad(loss_kernel, argnums=(0, 1)))(x, raw)
        gx, graw = np.asarray(gx), np.asarray(graw)

    for name, a, b in (("gx", gx, gx_ref), ("graw", graw, graw_ref)):
        d = np.abs(a - b).ravel()
        p999 = np.quantile(d, 0.999)
        outliers = float(np.mean(d > 1e-2))
        assert p999 <= 5e-4, (name, p999)
        assert outliers <= 2e-3, (name, outliers)


@check
def coupling_pair_stack_roundtrip():
    """Compiled split-carry RealNVP stack: fwd/inv round-trip + CPU parity."""
    flow = jax.jit(lambda k: nf.realnvp(k, 8, (16, 16), nlayers=4))(
        jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (256, 8))

    with jax.default_device(_tpu()):
        y, ld = jax.jit(flow.bijector.forward_and_log_det)(x)
        x2, ld2 = jax.jit(flow.bijector.inverse_and_log_det)(y)
        y, ld = np.asarray(y), np.asarray(ld)
        x2, ld2 = np.asarray(x2), np.asarray(ld2)
    # the CPU suite's f32 tier: rtol 1e-4 scaled by the data magnitude
    # (tests/test_flows.py::test_inverse_roundtrip); measured TPU drift is
    # ~3e-4 absolute at |x|~4 — same class as CPU f32, not a defect
    scale = max(float(np.max(np.abs(x))), 1.0)
    assert np.max(np.abs(x2 - np.asarray(x))) <= 1e-4 * scale, \
        np.max(np.abs(x2 - np.asarray(x)))
    ld_scale = max(float(np.max(np.abs(ld))), 1.0)
    assert np.max(np.abs(ld + ld2)) <= 1e-4 * ld_scale, \
        np.max(np.abs(ld + ld2))

    with jax.default_device(_cpu()):
        y_ref, ld_ref = jax.jit(flow.bijector.forward_and_log_det)(
            jax.device_put(x, _cpu()))
        y_ref, ld_ref = np.asarray(y_ref), np.asarray(ld_ref)
    # cross-PLATFORM sanity bound, deliberately loose: per-coupling
    # tanh/exp implementations differ by ~1e-6, and the conditioner
    # Lipschitz constant amplifies that multiplicatively across 8
    # couplings (measured 2.3e-3 worst element). The tight drift guards
    # are the same-platform roundtrip above and the end-to-end
    # train-trajectory check below.
    assert np.max(np.abs(y - y_ref)) <= 1e-2, np.max(np.abs(y - y_ref))
    assert np.max(np.abs(ld - ld_ref)) <= 5e-2, np.max(np.abs(ld - ld_ref))


@check
def nsf_pallas_flow_matches_oracle_backend():
    """NSF with the Pallas backend == NSF with the XLA-oracle backend,
    both compiled on the chip."""
    build = lambda backend: jax.jit(  # noqa: E731
        lambda k: nf.nsf(k, 3, (8, 8), K=8, B=5.0, nlayers=2,
                         backend=backend)
    )(jax.random.key(4))
    f_pal, f_ora = build("pallas"), build("oracle")
    x = jax.random.normal(jax.random.key(5), (512, 3))
    with jax.default_device(_tpu()):
        y1, ld1 = jax.jit(f_pal.bijector.forward_and_log_det)(x)
        y2, ld2 = jax.jit(f_ora.bijector.forward_and_log_det)(x)
        d_y = float(jnp.max(jnp.abs(y1 - y2)))
        d_ld = float(jnp.max(jnp.abs(ld1 - ld2)))
    assert d_y <= 1e-5, d_y
    assert d_ld <= 1e-4, d_ld


@check
def nsf_param_major_and_selective_remat_on_chip():
    """The round-5 NSF fast paths COMPILED on the chip: at a size above
    PARAM_MAJOR_MIN_ELEMS the param-major kernel feed engages; with
    remat=True the selective save_only_these_names policy drives the
    backward. Asserts (a) fwd/logdet agreement with the XLA-oracle
    backend, (b) gradient agreement between remat and no-remat, (c) a
    short compiled train segment is finite and descending."""
    import optax

    from normalizingflows.jl_tpu.models import spline
    from normalizingflows.jl_tpu.utils.pytree import (
        apply_mask, global_norm, trainable_mask,
    )

    dim, batch = 8, 8192  # batch*n_t = 32768 >= PARAM_MAJOR_MIN_ELEMS
    build = lambda backend, remat: jax.jit(  # noqa: E731
        lambda k: nf.nsf(k, dim, (32, 32), K=10, B=8.0, nlayers=2,
                         backend=backend, remat=remat,
                         compute_dtype=jnp.bfloat16)
    )(jax.random.key(10))
    x = jax.random.normal(jax.random.key(11), (batch, dim))

    with jax.default_device(_tpu()):
        f_pal = build("pallas", False)
        f_ora = build("oracle", False)
        y1, ld1 = jax.jit(f_pal.bijector.forward_and_log_det)(x)
        y2, ld2 = jax.jit(f_ora.bijector.forward_and_log_det)(x)
        d_y = float(jnp.max(jnp.abs(y1 - y2)))
        d_ld = float(jnp.max(jnp.abs(ld1 - ld2)))
        # bf16 raw feed quantizes the spline params on the pallas path
        # (the oracle consumes them in f32), so the bound is bf16-level
        # relative to the box width, not the f32 2e-6 of the f32 lane
        assert d_y <= 0.35, d_y
        assert d_ld <= 2.0, d_ld

        target = nf.Banana(dim, 1.0, 10.0)

        def gnorm_of(flow):
            mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
            g = jax.jit(jax.grad(
                lambda f: -nf.elbo_batch(jax.random.key(12), f,
                                         target.log_prob, batch)))(flow)
            return float(global_norm(apply_mask(g, mask)))

        g_plain = gnorm_of(f_pal)
        g_remat = gnorm_of(build("pallas", True))
        assert np.isfinite(g_plain) and g_plain > 0
        # selective remat must be a scheduling change only
        assert abs(g_remat - g_plain) <= 1e-2 * max(g_plain, 1.0), (
            g_plain, g_remat)

        flow = build("pallas", True)
        optimizer = optax.adam(1e-3)
        mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

        def step(carry, xs):
            f, st = carry
            loss, g = jax.value_and_grad(
                lambda f: -nf.elbo_from_samples(xs, f, target.log_prob))(f)
            g = apply_mask(g, mask)
            u, st = optimizer.update(g, st, f)
            return (optax.apply_updates(f, u), st), loss

        import functools

        @functools.partial(jax.jit, static_argnums=1)
        def train(key, n):
            xs = flow.base.sample(key, (n, batch))
            (_, _), losses = jax.lax.scan(
                step, (flow, optimizer.init(flow)), xs)
            return losses

        losses = np.asarray(train(jax.random.key(13), 60))
        assert np.all(np.isfinite(losses))
        assert losses[-10:].mean() < losses[:10].mean()
    assert spline.PARAM_MAJOR_FEED  # the default under test


@check
def glow_invertible_linear_roundtrip():
    """Compiled glow fwd/inv round-trip + CPU parity (ADVICE r4: the PLU
    permutation is applied as a matmul; without Precision.HIGHEST the MXU
    rounds the one-hot pick like bf16 — invisible to the CPU-pinned
    pytest suite, so this lane asserts it on the chip)."""
    flow = jax.jit(lambda k: nf.glow(k, 8, (16, 16), nlayers=3))(
        jax.random.key(8))
    x = jax.random.normal(jax.random.key(9), (256, 8))

    with jax.default_device(_tpu()):
        y, ld = jax.jit(flow.bijector.forward_and_log_det)(x)
        x2, ld2 = jax.jit(flow.bijector.inverse_and_log_det)(y)
        y, ld = np.asarray(y), np.asarray(ld)
        x2, ld2 = np.asarray(x2), np.asarray(ld2)
    scale = max(float(np.max(np.abs(x))), 1.0)
    assert np.max(np.abs(x2 - np.asarray(x))) <= 1e-4 * scale, \
        np.max(np.abs(x2 - np.asarray(x)))
    ld_scale = max(float(np.max(np.abs(ld))), 1.0)
    assert np.max(np.abs(ld + ld2)) <= 1e-4 * ld_scale, \
        np.max(np.abs(ld + ld2))

    with jax.default_device(_cpu()):
        y_ref, _ = jax.jit(flow.bijector.forward_and_log_det)(
            jax.device_put(x, _cpu()))
        y_ref = np.asarray(y_ref)
    # HIGHEST-precision P pick keeps the cross-platform drift in the same
    # class as the coupling stack's (exp/tanh ulp differences amplified
    # through 3 blocks); without it the one-hot matmul alone contributes
    # bf16-level (~1e-2·|x|) error
    assert np.max(np.abs(y - y_ref)) <= 1e-2, np.max(np.abs(y - y_ref))


@check
def train_trajectory_tpu_vs_cpu():
    """200 compiled ELBO train steps on the chip: finite, improving, and
    final loss within tolerance of the IDENTICAL program on CPU (catches
    compiled-numerics drift in the whole train step)."""
    import functools

    import optax

    from normalizingflows.jl_tpu.utils.pytree import (
        apply_mask, trainable_mask,
    )

    def run_on(device):
        with jax.default_device(device):
            flow = jax.jit(
                lambda k: nf.realnvp(k, 2, (16, 16), nlayers=3)
            )(jax.random.key(6))
            target = nf.Banana(2, 1.0, 100.0)
            optimizer = optax.adam(5e-4)
            mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

            def step(carry, xs):
                f, st = carry
                loss, g = jax.value_and_grad(
                    lambda f: -nf.elbo_from_samples(xs, f, target.log_prob)
                )(f)
                g = apply_mask(g, mask)
                u, st = optimizer.update(g, st, f)
                return (optax.apply_updates(f, u), st), loss

            @functools.partial(jax.jit, static_argnums=1)
            def train(key, n):
                xs = flow.base.sample(key, (n, 64))
                (_, _), losses = jax.lax.scan(
                    step, (flow, optimizer.init(flow)), xs)
                return losses

            return np.asarray(train(jax.random.key(7), 200))

    l_tpu = run_on(_tpu())
    assert np.all(np.isfinite(l_tpu))
    assert l_tpu[-20:].mean() < l_tpu[:20].mean()
    l_cpu = run_on(_cpu())
    # identical program, same keys: trajectories track within f32 slack
    assert abs(l_tpu[-20:].mean() - l_cpu[-20:].mean()) <= 0.15, (
        l_tpu[-20:].mean(), l_cpu[-20:].mean())


def main():
    failed = 0
    for fn in CHECKS:
        name = fn.__name__
        try:
            fn()
            print(f"PASS {name}", flush=True)
        except SystemExit:
            raise
        except Exception:
            failed += 1
            print(f"FAIL {name}", flush=True)
            traceback.print_exc()
    print(f"{len(CHECKS) - failed}/{len(CHECKS)} TPU checks passed",
          flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
