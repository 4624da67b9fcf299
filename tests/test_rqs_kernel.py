"""Pallas RQS kernel vs pure-jnp oracle (interpret mode on CPU).

SURVEY §4: "kernel-vs-reference numerics tests (Pallas kernel vs pure-jnp
oracle)". Values AND gradients must agree to float32 tolerance; the compiled
TPU path reuses the exact same kernel body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normalizingflows.jl_tpu.ops import rqs as oracle
from normalizingflows.jl_tpu.ops import rqs_pallas as kern

K = 10
B = 5.0
N = 300  # deliberately not a multiple of the kernel block size


def _setup(seed=0, dtype=jnp.float32):
    kx, kr = jax.random.split(jax.random.key(seed))
    # inputs spanning inside and outside the [−B, B] box
    x = jax.random.uniform(kx, (N,), dtype, minval=-1.5 * B, maxval=1.5 * B)
    raw = 0.5 * jax.random.normal(kr, (N, 3 * K - 1), dtype)
    return x, raw


def _oracle_fwd(x, raw):
    xs, ys, ds = oracle.rqs_params_from_raw(raw, B)
    return oracle.rqs_forward(x, xs, ys, ds)


def _oracle_inv(y, raw):
    xs, ys, ds = oracle.rqs_params_from_raw(raw, B)
    return oracle.rqs_inverse(y, xs, ys, ds)


def test_forward_matches_oracle():
    x, raw = _setup()
    y_o, ld_o = _oracle_fwd(x, raw)
    y_k, ld_k = kern.rqs_fused(x, raw, B, interpret=True)
    np.testing.assert_allclose(y_k, y_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ld_k, ld_o, rtol=1e-4, atol=1e-5)


def test_inverse_matches_oracle():
    x, raw = _setup(seed=1)
    y_o, ld_o = _oracle_inv(x, raw)
    y_k, ld_k = kern.rqs_fused(x, raw, B, inverse=True, interpret=True)
    np.testing.assert_allclose(y_k, y_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ld_k, ld_o, rtol=1e-4, atol=1e-5)


def test_kernel_roundtrip():
    x, raw = _setup(seed=2)
    y, ld_f = kern.rqs_fused(x, raw, B, interpret=True)
    x2, ld_i = kern.rqs_fused(y, raw, B, inverse=True, interpret=True)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ld_f, -ld_i, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("inverse", [False, True])
def test_gradients_match_oracle(inverse):
    x, raw = _setup(seed=3)
    ofn = _oracle_inv if inverse else _oracle_fwd

    def loss_oracle(x, raw):
        y, ld = ofn(x, raw)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld * 0.5)

    def loss_kernel(x, raw):
        y, ld = kern.rqs_fused(x, raw, B, inverse=inverse, interpret=True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld * 0.5)

    go_x, go_r = jax.grad(loss_oracle, argnums=(0, 1))(x, raw)
    gk_x, gk_r = jax.grad(loss_kernel, argnums=(0, 1))(x, raw)
    np.testing.assert_allclose(gk_x, go_x, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(gk_r, go_r, rtol=2e-3, atol=1e-4)


def test_param_major_entry_matches():
    """`rqs_fused_t` (the transpose-free param-major entry used by
    high-throughput callers) agrees with the elem-major wrapper in value
    and gradient."""
    x, raw = _setup(seed=5)
    y_e, ld_e = kern.rqs_fused(x, raw, B, interpret=True)
    y_t, ld_t = kern.rqs_fused_t(x, raw.T, B, interpret=True)
    np.testing.assert_allclose(y_t, y_e, rtol=1e-6)
    np.testing.assert_allclose(ld_t, ld_e, rtol=1e-6)

    def loss_t(x, raw_t):
        y, ld = kern.rqs_fused_t(x, raw_t, B, interpret=True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld * 0.5)

    def loss_e(x, raw):
        y, ld = kern.rqs_fused(x, raw, B, interpret=True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld * 0.5)

    gt_x, gt_r = jax.grad(loss_t, argnums=(0, 1))(x, raw.T)
    ge_x, ge_r = jax.grad(loss_e, argnums=(0, 1))(x, raw)
    np.testing.assert_allclose(gt_x, ge_x, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(gt_r.T, ge_r, rtol=1e-6, atol=1e-7)


def test_multi_dim_batch_shape():
    x, raw = _setup(seed=4)
    x3 = x[:296].reshape(4, 74)
    raw3 = raw[:296].reshape(4, 74, 3 * K - 1)
    y, ld = kern.rqs_fused(x3, raw3, B, interpret=True)
    assert y.shape == (4, 74) and ld.shape == (4, 74)
    y_f, ld_f = kern.rqs_fused(x3.ravel(), raw3.reshape(-1, 3 * K - 1), B,
                               interpret=True)
    np.testing.assert_allclose(y.ravel(), y_f, rtol=1e-6)


def test_elem_major_variant_matches_param_major():
    """`rqs_fused_e` (elem-major input, in-kernel transpose — kept as a
    measured-negative archive path, see ops/rqs_pallas.py::ELEM_MAJOR)
    must stay BITWISE identical to the shipping param-major kernel on
    the FORWARD (same tile function), and gradient-equal to f32
    reassociation tolerance on the backward (the param-major kernel
    ships the hand-derived analytic backward; the archive variant keeps
    the jax.vjp tape — same math, different op order)."""
    import jax
    import jax.numpy as jnp

    from normalizingflows.jl_tpu.ops import rqs_pallas

    K, B, n = 10, 30.0, 4096
    kx, kr, kg = jax.random.split(jax.random.key(0), 3)
    x = jax.random.uniform(kx, (n,), jnp.float32, -1.2 * B, 1.2 * B)
    raw = jax.random.normal(kr, (n, 3 * K - 1), jnp.float32)

    y1, ld1 = rqs_pallas.rqs_fused_e(x, raw, B, K, False, True)
    y2, ld2 = rqs_pallas.rqs_fused_t(x, raw.T, B, False, True)
    assert jnp.all(y1 == y2) and jnp.all(ld1 == ld2)

    # padded columns are ignored
    rawp = jnp.pad(raw, ((0, 0), (0, 3)))
    y3, _ = rqs_pallas.rqs_fused_e(x, rawp, B, K, False, True)
    assert jnp.all(y3 == y2)

    gy = jax.random.normal(kg, (n,), jnp.float32)

    def le(x, raw):
        y, ld = rqs_pallas.rqs_fused_e(x, raw, B, K, False, True)
        return jnp.sum(y * gy) + jnp.sum(ld)

    def lt(x, raw_t):
        y, ld = rqs_pallas.rqs_fused_t(x, raw_t, B, False, True)
        return jnp.sum(y * gy) + jnp.sum(ld)

    g1 = jax.grad(le, argnums=(0, 1))(x, raw)
    g2 = jax.grad(lt, argnums=(0, 1))(x, raw.T)
    import numpy as np
    np.testing.assert_allclose(g1[0], g2[0], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(g1[1], g2[1].T, rtol=1e-5, atol=1e-4)


def test_param_major_feed_matches_default(key):
    """The param-major kernel-feed layout (permuted last Dense +
    lane-aligned transpose; +81% on the wide NSF train step) is the SAME
    function as the default feed — forward, inverse, log-dets, and ELBO
    gradients, bitwise in interpret mode."""
    import normalizingflows as nf
    from normalizingflows.jl_tpu.models import spline
    from normalizingflows.jl_tpu.utils.pytree import global_norm

    flow = nf.nsf(key, 6, (16, 16), K=8, B=5.0, nlayers=2,
                  backend="pallas", interpret=True,
                  compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (64, 6))
    t = nf.Banana(6, 1.0, 10.0)

    old = spline.PARAM_MAJOR_FEED
    old_min = spline.PARAM_MAJOR_MIN_ELEMS
    try:
        spline.PARAM_MAJOR_MIN_ELEMS = 0  # force the path at test size
        outs = {}
        for pm in (False, True):
            spline.PARAM_MAJOR_FEED = pm
            y, ld = flow.bijector.forward_and_log_det(x)
            xi, ldi = flow.bijector.inverse_and_log_det(y)
            g = jax.grad(lambda f: -nf.elbo_batch(
                jax.random.key(2), f, t.log_prob, 32))(flow)
            outs[pm] = (np.asarray(y), np.asarray(ld), np.asarray(xi),
                        np.asarray(ldi), float(global_norm(g)))
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    finally:
        spline.PARAM_MAJOR_FEED = old
        spline.PARAM_MAJOR_MIN_ELEMS = old_min


@pytest.mark.parametrize("inverse", [False, True])
def test_analytic_backward_matches_vjp_tape(key, inverse):
    """The hand-derived analytic backwards (ops/rqs_pallas.py::
    _tile_bwd_analytic for the forward/training direction, and the
    implicit-differentiation _tile_bwd_analytic_inverse for the
    inverse/density direction) are the SAME derivative as the jax.vjp
    tape they replaced: f64 agreement at machine-epsilon scale across
    in-box and out-of-box elements. (EXACTLY at x = ±B the two give
    different — equally valid — subgradients: the tape routes through
    clip/maximum tie-breaking, the analytic form takes the interior
    limit. Measure-zero; excluded here. The inverse comparison carries
    a slightly looser atol: the IFT differentiates the exact root while
    the tape differentiates the closed-form root FORMULA — identical in
    real arithmetic, a few ulps apart after the quadratic's f64
    rounding on near-flat bins.)"""
    import numpy as np

    from normalizingflows.jl_tpu.ops import rqs_pallas as kern

    K, B, n = 10, 30.0, 4096
    kx, kr, kg, kl = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (n,), jnp.float64, -1.2 * B, 1.2 * B)
    raw = jax.random.normal(kr, (3 * K - 1, n), jnp.float64)
    gy = jax.random.normal(kg, (n,), jnp.float64)
    gld = jax.random.normal(kl, (n,), jnp.float64)

    def loss(x, raw):
        y, ld = kern.rqs_fused_t(x, raw, B, inverse, True)
        return jnp.sum(y * gy) + jnp.sum(ld * gld)

    old = kern.ANALYTIC_BWD
    try:
        kern.ANALYTIC_BWD = True
        ga = jax.grad(loss, argnums=(0, 1))(x, raw)
        kern.ANALYTIC_BWD = False
        gv = jax.grad(loss, argnums=(0, 1))(x, raw)
    finally:
        kern.ANALYTIC_BWD = old
    tol = 1e-10 if inverse else 1e-12
    for a, b in zip(ga, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol)
