"""Objective correctness — replicates reference `test/objectives.jl:1-37`.

Construct a flow that IS the target exactly (shift∘scale of a diag normal
matching the target's μ, Σ); then the ELBO must vanish and the identity
log q(x) + elbo ≈ log p(x) must hold; `loglikelihood` must rank
in-distribution samples above base-distribution samples.
"""

import jax
import jax.numpy as jnp
import pytest

import normalizingflows as nf


def _exact_flow_and_target(dtype):
    mu = jnp.asarray([2.0, -1.5], dtype)
    sigma = jnp.asarray([1.3, 0.4], dtype)
    target = nf.DiagNormal(mu, sigma)
    q0 = nf.DiagNormal.standard(2, dtype)
    flow = nf.create_flow([nf.Scale(sigma), nf.Shift(mu)], q0)
    return flow, target


def test_elbo_zero_for_exact_flow(key, dtype):
    flow, target = _exact_flow_and_target(dtype)
    for obj in (nf.elbo, nf.elbo_batch, nf.elbo_stl):
        val = obj(key, flow, target.log_prob, 10)
        assert abs(float(val)) <= 1e-5, obj.__name__


def test_elbo_logpdf_identity(key, dtype):
    """logpdf(flow, x) + elbo ≈ logp(x) when flow ≡ target
    (reference test/objectives.jl:20-26)."""
    flow, target = _exact_flow_and_target(dtype)
    el = nf.elbo_batch(key, flow, target.log_prob, 10)
    x = target.sample(jax.random.key(7), (50,))
    assert jnp.allclose(
        flow.log_prob(x) + el, target.log_prob(x), atol=1e-4
    )


def test_elbo_and_elbo_batch_agree(key, dtype):
    """Same RNG stream ⇒ identical estimates (they share the sample path)."""
    flow, target = _exact_flow_and_target(dtype)
    flow = nf.TransformedDistribution(
        flow.base,
        nf.chain(flow.bijector, nf.Shift(jnp.asarray([0.3, -0.2], dtype))),
    )
    a = nf.elbo(key, flow, target.log_prob, 64)
    b = nf.elbo_batch(key, flow, target.log_prob, 64)
    assert jnp.allclose(a, b, rtol=1e-5)


def test_loglikelihood_ranks_samples(key, dtype):
    """reference test/objectives.jl:28-35."""
    flow, target = _exact_flow_and_target(dtype)
    k1, k2 = jax.random.split(key)
    xs_good = target.sample(k1, (1000,))
    xs_bad = flow.base.sample(k2, (1000,))
    assert float(nf.loglikelihood(flow, xs_good)) > float(
        nf.loglikelihood(flow, xs_bad)
    )


def test_elbo_single_sample_matches_mean(key, dtype):
    flow, target = _exact_flow_and_target(dtype)
    xs = flow.base.sample(key, (16,))
    per = jax.vmap(
        lambda x: nf.elbo_single_sample(flow, target.log_prob, x)
    )(xs)
    assert per.shape == (16,)
    assert abs(float(jnp.mean(per))) < 1e-5


def test_stl_gradient_zero_at_optimum(key):
    """STL's hallmark: at flow ≡ target the ELBO gradient estimator is
    exactly zero (variance-free at the optimum), while the plain estimator
    has MC noise. (Roeder et al. 2017.)"""
    dtype = jnp.float64
    flow, target = _exact_flow_and_target(dtype)

    def stl_loss(f):
        return -nf.elbo_stl(key, f, target.log_prob, 8)

    def plain_loss(f):
        return -nf.elbo_batch(key, f, target.log_prob, 8)

    from normalizingflows.jl_tpu.utils.pytree import global_norm, \
        trainable_mask, apply_mask

    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
    g_stl = apply_mask(jax.grad(stl_loss)(flow), mask)
    g_plain = apply_mask(jax.grad(plain_loss)(flow), mask)
    assert float(global_norm(g_stl)) < 1e-8
    assert float(global_norm(g_plain)) > 1e-3


def test_elbo_iw_zero_for_exact_flow(key, dtype):
    """When flow ≡ target every importance weight is exactly 1, so the
    IW bound is 0 for any K."""
    flow, target = _exact_flow_and_target(dtype)
    for k_particles in (1, 4):
        val = nf.elbo_iw(key, flow, target.log_prob, 10,
                         n_particles=k_particles)
        assert abs(float(val)) <= 1e-5, k_particles


def test_elbo_iw_tighter_than_elbo(key):
    """IW bound with K>1 is (in expectation) tighter — i.e. larger —
    than the K=1 ELBO for a mismatched flow; K=1 reduces to elbo_batch."""
    dtype = jnp.float64
    flow, target = _exact_flow_and_target(dtype)
    # perturb the flow so the bound gap is nonzero
    flow = nf.TransformedDistribution(
        flow.base,
        nf.chain(flow.bijector, nf.Shift(jnp.asarray([0.8, -0.6], dtype))),
    )
    n = 4096
    k1 = float(nf.elbo_iw(key, flow, target.log_prob, n, n_particles=1))
    base = float(nf.elbo_batch(key, flow, target.log_prob, n))
    k16 = float(nf.elbo_iw(key, flow, target.log_prob, n, n_particles=16))
    assert k16 > k1 + 1e-3
    # K=1 is the plain ELBO estimator (same math, same magnitude)
    assert abs(k1 - base) < 0.1


def test_elbo_iw_gradient_finite(key):
    flow, target = _exact_flow_and_target(jnp.float32)
    g = jax.grad(
        lambda f: -nf.elbo_iw(key, f, target.log_prob, 8, n_particles=4)
    )(flow)
    for leaf in jax.tree_util.tree_leaves(g):
        assert jnp.all(jnp.isfinite(leaf))


def test_stl_on_fixed_point_inverse_flow(key):
    """STL × planar (VERDICT r4 item 9 / weak 7): `elbo_stl` routes
    log q through the flow's inverse, which for planar layers is a
    fixed-point bisection per layer under grad — documented as expensive
    in the docstring. This pins that the path is FINITE and correct:
    value matches elbo_batch's estimate on the same draws within MC
    tolerance, and the gradient is finite."""
    import jax

    from normalizingflows.jl_tpu.utils.pytree import (
        apply_mask, global_norm, trainable_mask,
    )

    flow = nf.planarflow(key, nf.DiagNormal.standard(2), nlayers=3)
    target = nf.DiagNormal(jnp.full((2,), 1.0), jnp.ones((2,)))

    v_stl = float(nf.elbo_stl(jax.random.key(0), flow, target.log_prob, 256))
    v_std = float(nf.elbo_batch(jax.random.key(0), flow, target.log_prob,
                                256))
    # same draws, same value up to the inverse's fixed-point tolerance
    assert abs(v_stl - v_std) < 5e-2, (v_stl, v_std)

    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
    g = apply_mask(
        jax.grad(lambda f: -nf.elbo_stl(jax.random.key(0), f,
                                        target.log_prob, 32))(flow),
        mask)
    gn = float(global_norm(g))
    assert jnp.isfinite(gn) and gn > 0.0
