"""Diagnostics: exactness on a flow ≡ target, sensitivity on a mismatch.

Same fixture idea as the reference's objective tests
(`test/objectives.jl:8-9`): build a Shift∘Scale flow that IS the target
exactly, then every diagnostic has a known value — ELBO = 0 (±0), ESS/n =
1, log Ẑ = 0. A deliberately wrong flow must score strictly worse on all
of them.
"""

import jax
import jax.numpy as jnp
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.diagnostics import (
    elbo_with_sem,
    ess,
    evaluate_flow,
    log_normalizer,
)


@pytest.fixture
def exact_pair():
    mu = jnp.array([1.5, -2.0, 0.5])
    sigma = jnp.array([2.0, 0.5, 1.0])
    target = nf.DiagNormal(mu, sigma)
    flow = nf.create_flow(
        [nf.Scale(sigma), nf.Shift(mu)], nf.DiagNormal.standard(3)
    )
    return flow, target


def test_exact_flow_is_perfect(exact_pair):
    flow, target = exact_pair
    key = jax.random.key(0)
    e, sem = elbo_with_sem(key, flow, target.log_prob, 256)
    assert abs(float(e)) < 1e-5 and float(sem) < 1e-6
    assert abs(float(log_normalizer(key, flow, target.log_prob, 256))) < 1e-5
    assert float(ess(key, flow, target.log_prob, 256)) > 1.0 - 1e-5


def test_mismatch_detected(exact_pair):
    flow, target = exact_pair
    bad = nf.create_flow(
        [nf.Scale(jnp.array([4.0, 0.1, 1.0]))], nf.DiagNormal.standard(3)
    )
    key = jax.random.key(1)
    d_good = evaluate_flow(key, flow, target.log_prob, 2048)
    d_bad = evaluate_flow(key, bad, target.log_prob, 2048)
    assert float(d_bad.elbo) < float(d_good.elbo) - 1.0
    assert float(d_bad.ess) < 0.5 < float(d_good.ess)
    assert float(d_bad.elbo_sem) > float(d_good.elbo_sem)
    # log Ẑ stays a consistent estimator of 0 even for the bad flow, but
    # with n=2048 and heavy weights it must sit below the good flow's
    assert abs(float(d_good.log_normalizer)) < 1e-4


def test_jit_and_trained_flow_improves():
    target = nf.Banana(2, 1.0, 10.0)
    key = jax.random.key(2)
    flow = nf.realnvp(key, 2, (8, 8), nlayers=2)
    before = jax.jit(lambda k, f: evaluate_flow(k, f, target.log_prob, 1024))(
        key, flow
    )
    res = nf.train_flow(
        key, nf.elbo_batch, flow, target.log_prob, 64, max_iters=400,
        optimizer=__import__("optax").adam(1e-2),
    )
    after = jax.jit(lambda k, f: evaluate_flow(k, f, target.log_prob, 1024))(
        key, res.flow
    )
    assert float(after.elbo) > float(before.elbo)
    assert float(after.ess) > float(before.ess)


def test_sliced_wasserstein2_identity_and_shift():
    key = jax.random.key(0)
    k1, k2, k3, kp = jax.random.split(key, 4)
    d, n = 4, 8192
    xs = jax.random.normal(k1, (n, d))
    ys = jax.random.normal(k2, (n, d))
    same = float(nf.sliced_wasserstein2(kp, xs, ys))
    assert same < 0.1  # MC floor for identical distributions

    # For equal-covariance Gaussians W2(θᵀx, θᵀy) = |θᵀΔμ|, so
    # SW2 = sqrt(E_θ[(θᵀΔμ)²]) = |Δμ|/√d
    mu = jnp.array([2.0, 0.0, 0.0, 0.0])
    zs = jax.random.normal(k3, (n, d)) + mu
    shifted = float(nf.sliced_wasserstein2(kp, xs, zs))
    expected = float(jnp.linalg.norm(mu)) / d ** 0.5
    assert abs(shifted - expected) < 0.15
    assert shifted > 5 * same


def test_grid_total_variation_bounds():
    key = jax.random.key(1)
    k1, k2, k3 = jax.random.split(key, 3)
    n = 65536
    xs = jax.random.normal(k1, (n, 2))
    ys = jax.random.normal(k2, (n, 2))
    same = float(nf.grid_total_variation(xs, ys))
    assert 0.0 <= same < 0.1  # MC floor ~ sqrt(bins^2/n)/2

    zs = jax.random.normal(k3, (n, 2)) + jnp.array([10.0, 0.0])
    far = float(nf.grid_total_variation(xs, zs))
    assert far > 0.95  # disjoint supports → TV → 1

    with pytest.raises(ValueError):
        nf.grid_total_variation(jnp.zeros((10, 3)), jnp.zeros((10, 3)))
