"""Hamiltonian (leapfrog) flow tests — reference
`example/demo_hamiltonian_flow.jl` behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.models.hamiltonian import joint_logp
from normalizingflows.jl_tpu.utils.pytree import (
    apply_mask,
    global_norm,
    trainable_mask,
)


def _target(dtype=jnp.float64):
    # demo config (demo_hamiltonian_flow.jl:118): Funnel(2, −8, 5), Float64
    return nf.Funnel(2, jnp.asarray(-8.0, dtype), jnp.asarray(5.0, dtype))


def test_leapfrog_roundtrip(dtype):
    target = _target(dtype)
    lf = nf.LeapFrog.make(2, float(np.log(0.05)), 3, target.score, dtype)
    z = jax.random.normal(jax.random.key(0), (10, 4), dtype)
    y, ld = lf.forward_and_log_det(z)
    z2, ld2 = lf.inverse_and_log_det(y)
    tol = 1e-10 if dtype == jnp.float64 else 1e-4
    assert bool(jnp.all(jnp.abs(z - z2) < tol * jnp.maximum(jnp.max(jnp.abs(z)), 1)))
    # symplectic: logdet identically zero both ways
    assert jnp.allclose(ld, 0.0) and jnp.allclose(ld2, 0.0)


def test_volume_preservation_numerically():
    """The leapfrog Jacobian determinant really is 1: check via explicit
    jacfwd on the joint map (the 'symplectic ⇒ logdet 0' claim at
    demo_hamiltonian_flow.jl:84-91)."""
    dtype = jnp.float64
    target = _target(dtype)
    lf = nf.LeapFrog.make(2, float(np.log(0.05)), 3, target.score, dtype)
    z = jax.random.normal(jax.random.key(1), (4,), dtype)
    J = jax.jacfwd(lambda v: lf.forward_and_log_det(v)[0])(z)
    _, logdet = jnp.linalg.slogdet(J)
    assert abs(float(logdet)) < 1e-8


def test_hamiltonian_flow_elbo_and_second_order_grad():
    """ELBO through the Hamiltonian flow requires grad-of-score (second-order
    AD of the target logp) — must be finite and nonzero."""
    dtype = jnp.float64
    target = _target(dtype)
    dim = 2
    flow = nf.hamiltonian_flow(
        dim, target.score, n_blocks=3, L=3, eps0=0.05, dtype=dtype
    )
    lp_joint = joint_logp(target.log_prob, dim)

    val = nf.elbo(jax.random.key(2), flow, lp_joint, 16)
    assert np.isfinite(float(val))

    def loss(f):
        return -nf.elbo(jax.random.key(3), f, lp_joint, 8)

    grads = jax.grad(loss)(flow)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
    gn = float(global_norm(apply_mask(grads, mask)))
    assert np.isfinite(gn) and gn > 0

    # step sizes are trainable; momentum-normalization affines too
    leaf_count = len(jax.tree_util.tree_leaves(grads))
    assert leaf_count > 5


def test_hamiltonian_short_training_improves_elbo():
    dtype = jnp.float64
    target = _target(dtype)
    dim = 2
    flow = nf.hamiltonian_flow(
        dim, target.score, n_blocks=5, L=3, eps0=0.05, dtype=dtype
    )
    lp_joint = joint_logp(target.log_prob, dim)
    before = float(nf.elbo_batch(jax.random.key(5), flow, lp_joint, 512))
    res = nf.train_flow(
        jax.random.key(4), nf.elbo_batch, flow, lp_joint, 16,
        max_iters=300, optimizer=optax.adam(3e-4), check_every=100,
    )
    after = float(nf.elbo_batch(jax.random.key(5), res.flow, lp_joint, 512))
    assert after > before
