"""Annealed (tempered-path) training: `objectives.tempered` +
`train_flow_annealed`. β endpoints must recover the exact objectives; the
annealed run must reach a far-separated narrow target from N(0, I).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normalizingflows as nf


def _meanfield(dtype=jnp.float32, dim=2):
    q0 = nf.DiagNormal.standard(dim, dtype)
    return nf.create_flow(
        [nf.Scale(jnp.ones((dim,), dtype)),
         nf.Shift(jnp.zeros((dim,), dtype))], q0,
    )


def test_tempered_endpoints(key):
    flow = _meanfield()
    target = nf.DiagNormal(jnp.full((2,), 30.0), jnp.full((2,), 0.5))
    vo = nf.tempered(nf.elbo_batch, flow.base.log_prob)

    # β=0: the tempered target IS the base; the identity flow is exact
    at0 = float(vo(key, flow, target.log_prob, 4096, jnp.asarray(0.0)))
    assert abs(at0) < 1e-3

    # β=1: identical to the plain objective (same key → same samples)
    at1 = float(vo(key, flow, target.log_prob, 4096, jnp.asarray(1.0)))
    plain = float(nf.elbo_batch(key, flow, target.log_prob, 4096))
    assert at1 == pytest.approx(plain, rel=1e-6)


def test_annealed_reaches_far_target(key):
    # N(30, 0.5): ~42σ from init in flow-scale units — at β=1 from scratch
    # the first Adam(1e-2) segment barely moves; the annealed path walks it
    target = nf.DiagNormal(jnp.full((2,), 30.0), jnp.full((2,), 0.5))
    flow = _meanfield()

    res = nf.train_flow_annealed(
        key, nf.elbo_batch, flow, target.log_prob, 32,
        n_betas=8, iters_per_beta=400, final_iters=1200,
        optimizer=optax.adam(2e-2), check_every=400,
    )
    after = float(nf.elbo_batch(jax.random.key(9), res.flow,
                                target.log_prob, 4096))
    assert after > -0.5, after

    shift = res.flow.bijector.bijectors[1].b
    assert np.all(np.abs(np.asarray(shift) - 30.0) < 0.5), shift

    # stats carry the β schedule and concatenate across segments
    assert "beta" in res.stats
    assert len(res.stats["beta"]) == len(res.stats["loss"]) == 8 * 400 + 800
    assert res.stats["beta"][0] == pytest.approx(1 / 8)
    assert res.stats["beta"][-1] == 1.0
