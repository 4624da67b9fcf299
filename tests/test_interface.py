"""End-to-end training — replicates reference `test/interface.jl:1-53`.

Mean-field Gaussian VI (scale-then-shift flow) trained with `train_flow` +
ELBO against MvNormal(10·1, diag(4)); asserts recovered parameters within
±0.2 of (μ=10, σ=2), trained ELBO > untrained, trained ELBO > −1, and
grad-norm convergence early stop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normalizingflows as nf


@pytest.mark.parametrize("objective", ["elbo", "elbo_batch", "elbo_stl"])
def test_meanfield_recovers_target(key, dtype, objective):
    mu_true, sigma_true = 10.0, 2.0
    target = nf.DiagNormal(
        jnp.full((2,), mu_true, dtype), jnp.full((2,), sigma_true, dtype)
    )
    q0 = nf.DiagNormal.standard(2, dtype)
    flow = nf.create_flow(
        [nf.Scale(jnp.ones((2,), dtype)), nf.Shift(jnp.zeros((2,), dtype))],
        q0,
    )
    obj = getattr(nf, objective)

    el_untrained = float(nf.elbo_batch(key, flow, target.log_prob, 1000))

    # reference config (test/interface.jl:27-41): 10 samples/iter, Adam(0.01),
    # ≤5k iters, stop at grad-norm < 1e-3
    result = nf.train_flow(
        key,
        obj,
        flow,
        target.log_prob,
        10,
        max_iters=5_000,
        optimizer=optax.adam(1e-2),
        hasconverged=lambda i, stat, f, st: stat["gradient_norm"] < 1e-3,
        check_every=250,
    )
    trained = result.flow
    scale = trained.bijector.bijectors[0].a
    shift = trained.bijector.bijectors[1].b
    assert np.all(np.abs(np.asarray(shift) - mu_true) < 0.2), shift
    assert np.all(np.abs(np.abs(np.asarray(scale)) - sigma_true) < 0.2), scale

    el_trained = float(
        nf.elbo_batch(jax.random.key(99), trained, target.log_prob, 1000)
    )
    assert el_trained > el_untrained
    assert el_trained > -1.0

    # stats plumbing (reference src/optimize.jl:89,96)
    assert set(result.stats) >= {"iteration", "loss", "gradient_norm"}
    assert len(result.stats["loss"]) == len(result.stats["iteration"])


def test_callback_and_resume(key):
    dtype = jnp.float32
    target = nf.DiagNormal(jnp.zeros((2,), dtype), jnp.ones((2,), dtype))
    flow = nf.create_flow(
        [nf.Scale(jnp.full((2,), 2.0, dtype)), nf.Shift(jnp.ones((2,), dtype))],
        nf.DiagNormal.standard(2, dtype),
    )
    seen = []

    def cb(i, stat, f):
        seen.append(i)
        return {"extra_metric": 1.0}

    res = nf.train_flow(
        key, nf.elbo_batch, flow, target.log_prob, 10,
        max_iters=100, check_every=25, callback=cb,
    )
    assert seen == [25, 50, 75, 100]
    assert "extra_metric" in res.stats

    # resume continues from the returned state (reference src/optimize.jl:106)
    res2 = nf.train_flow(
        key, nf.elbo_batch, flow, target.log_prob, 10,
        max_iters=50, resume_state=res.state, check_every=25,
    )
    assert res2.state.iteration == 150


def test_frozen_base_distribution(key):
    """train_base=False (default) keeps q0 fixed — the reference's
    `@leaf MvNormal` convention (test/interface.jl:21)."""
    dtype = jnp.float32
    target = nf.DiagNormal(jnp.full((2,), 3.0, dtype), jnp.ones((2,), dtype))
    q0 = nf.DiagNormal.standard(2, dtype)
    flow = nf.create_flow(
        [nf.Scale(jnp.ones((2,), dtype)), nf.Shift(jnp.zeros((2,), dtype))], q0
    )
    res = nf.train_flow(
        key, nf.elbo_batch, flow, target.log_prob, 10, max_iters=200
    )
    assert jnp.allclose(res.flow.base.loc, 0.0)
    assert jnp.allclose(res.flow.base.scale, 1.0)


def test_optimize_generic(key):
    """Standalone `optimize` minimizes a loss over an arbitrary pytree
    (reference src/optimize.jl:57-108)."""
    params = {"w": jnp.asarray([5.0, -3.0])}

    def loss(key, p):
        return jnp.sum(jnp.square(p["w"] - 1.0))

    res = nf.optimize(key, loss, params, max_iters=2000,
                      optimizer=optax.adam(1e-1))
    assert np.allclose(np.asarray(res.flow["w"]), 1.0, atol=1e-2)

def test_unroll_matches_unrolled_trajectory(key):
    """`unroll` is a pure scheduling knob: same keys → same loss trajectory
    (up to fusion reassociation roundoff)."""
    target = nf.Banana(2, 1.0, 10.0)
    flow = nf.realnvp(key, 2, (8, 8), nlayers=2)

    def run(unroll):
        return nf.train_flow(
            jax.random.key(5), nf.elbo_batch, flow, target.log_prob, 8,
            max_iters=64, optimizer=optax.adam(1e-3),
            check_every=32, unroll=unroll,
        ).stats["loss"]

    l1, l8 = run(1), run(8)
    np.testing.assert_allclose(l1, l8, rtol=1e-4)


def test_presampled_objective_matches_keyed(key):
    """`elbo_from_samples` + `presample_base` (RNG hoisted out of the scan)
    trains to the same place as the keyed `elbo_batch` path, and converges
    on the reference mean-field task."""
    dtype = jnp.float32
    mu_true, sigma_true = 10.0, 2.0
    target = nf.DiagNormal(
        jnp.full((2,), mu_true, dtype), jnp.full((2,), sigma_true, dtype)
    )
    flow = nf.create_flow(
        [nf.Scale(jnp.ones((2,), dtype)), nf.Shift(jnp.zeros((2,), dtype))],
        nf.DiagNormal.standard(2, dtype),
    )
    res = nf.train_flow(
        key, nf.elbo_from_samples, flow, target.log_prob,
        max_iters=3_000, optimizer=optax.adam(1e-2),
        scan_inputs=nf.presample_base(10), check_every=500,
    )
    shift = res.flow.bijector.bijectors[1].b
    scale = res.flow.bijector.bijectors[0].a
    assert np.all(np.abs(np.asarray(shift) - mu_true) < 0.2), shift
    assert np.all(np.abs(np.abs(np.asarray(scale)) - sigma_true) < 0.2), scale


def test_destructure_roundtrip():
    """`destructure` parity (reference `src/NormalizingFlows.jl:67`):
    flatten → reconstruct is the identity, and the reconstructor rebuilds
    the exact module type with static fields intact."""
    import jax
    import jax.numpy as jnp

    import normalizingflows as nf
    from normalizingflows.jl_tpu.utils.pytree import destructure, tree_size

    flow = nf.realnvp(jax.random.key(0), 2, (8, 8), nlayers=2)
    theta, re = destructure(flow)
    assert theta.ndim == 1 and theta.size == tree_size(flow)
    flow2 = re(theta * 1.0)
    assert type(flow2) is type(flow)
    x = flow.base.sample(jax.random.key(1), (16,))
    y1, ld1 = flow.bijector.forward_and_log_det(x)
    y2, ld2 = flow2.bijector.forward_and_log_det(x)
    assert jnp.allclose(y1, y2) and jnp.allclose(ld1, ld2)
