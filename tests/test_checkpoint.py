"""Checkpoint/resume round-trip tests (new capability over the reference,
which has in-memory resume only — `src/optimize.jl:106-107`, SURVEY §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.checkpoint import (
    load_pytree,
    load_train_state,
    save_pytree,
    save_train_state,
)


def test_flow_roundtrip(tmp_path, key):
    flow = nf.realnvp(key, 3, (8, 8), nlayers=2)
    path = str(tmp_path / "flow.npz")
    save_pytree(path, flow)

    template = nf.realnvp(jax.random.key(99), 3, (8, 8), nlayers=2)
    restored = load_pytree(path, template)

    x = jax.random.normal(jax.random.key(1), (10, 3))
    y0, ld0 = flow.bijector.forward_and_log_det(x)
    y1, ld1 = restored.bijector.forward_and_log_det(x)
    np.testing.assert_allclose(y1, y0)
    np.testing.assert_allclose(ld1, ld0)


def test_train_state_resume(tmp_path, key):
    target = nf.DiagNormal(jnp.full((2,), 3.0), jnp.ones((2,)))
    def make_flow():
        return nf.create_flow(
            [nf.Scale(jnp.ones((2,))), nf.Shift(jnp.zeros((2,)))],
            nf.DiagNormal.standard(2),
        )

    res = nf.train_flow(key, nf.elbo_batch, make_flow(), target.log_prob,
                        10, max_iters=100, check_every=50)
    path = str(tmp_path / "state.npz")
    save_train_state(path, res.state)

    res2_template = nf.train_flow(
        jax.random.key(5), nf.elbo_batch, make_flow(), target.log_prob,
        10, max_iters=1, check_every=1,
    )
    restored = load_train_state(path, res2_template.state)
    assert restored.iteration == 100

    res3 = nf.train_flow(key, nf.elbo_batch, make_flow(), target.log_prob,
                         10, max_iters=50, resume_state=restored,
                         check_every=50)
    assert res3.state.iteration == 150


def test_leaf_count_mismatch_raises(tmp_path, key):
    flow = nf.realnvp(key, 3, (8, 8), nlayers=2)
    path = str(tmp_path / "flow.npz")
    save_pytree(path, flow)
    wrong_template = nf.realnvp(key, 3, (8, 8), nlayers=3)
    try:
        load_pytree(path, wrong_template)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "shape" in str(e) or "leaves" in str(e)


def test_orbax_backend_roundtrip(tmp_path, key):
    """The orbax backend (multi-host path) round-trips identically."""
    flow = nf.realnvp(key, 3, (8, 8), nlayers=2)
    path = str(tmp_path / "ckpt_orbax")
    save_pytree(path, flow, backend="orbax")

    template = nf.realnvp(jax.random.key(99), 3, (8, 8), nlayers=2)
    restored = load_pytree(path, template, backend="orbax")

    x = jax.random.normal(jax.random.key(1), (10, 3))
    y0, ld0 = flow.bijector.forward_and_log_det(x)
    y1, ld1 = restored.bijector.forward_and_log_det(x)
    np.testing.assert_allclose(y1, y0)
    np.testing.assert_allclose(ld1, ld0)
