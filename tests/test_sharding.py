"""Multi-device (CPU-emulated pod slice) tests — SURVEY §4's addition over
the reference, which has no distributed tests at all (SURVEY §2c)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.parallel import (
    batch_mesh,
    sample_sharded,
    shard_objective,
)
from normalizingflows.jl_tpu.utils.pytree import (
    apply_mask,
    global_norm,
    trainable_mask,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return batch_mesh(8)


def _setup(dtype=jnp.float32):
    key = jax.random.key(0)
    flow = nf.realnvp(key, 2, (16, 16), nlayers=2, dtype=dtype)
    target = nf.Banana(2, 1.0, 100.0)
    return flow, target


def test_sharded_elbo_finite_and_close_to_unsharded(mesh):
    flow, target = _setup()
    sharded = shard_objective(nf.elbo_batch, mesh)
    key = jax.random.key(3)
    v_sharded = float(sharded(key, flow, target.log_prob, 4096))
    v_local = float(nf.elbo_batch(key, flow, target.log_prob, 4096))
    assert np.isfinite(v_sharded)
    # different PRNG partitioning → statistically, not bitwise, equal;
    # the untrained-flow ELBO on the hard banana is O(−5000) with large MC
    # variance, so compare relatively
    assert abs(v_sharded - v_local) < 0.02 * abs(v_local), (
        v_sharded, v_local,
    )


def test_sharded_gradients_match_statistics(mesh):
    flow, target = _setup()
    sharded = shard_objective(nf.elbo_batch, mesh)

    def loss_sharded(f, k):
        return -sharded(k, f, target.log_prob, 4096)

    def loss_local(f, k):
        return -nf.elbo_batch(k, f, target.log_prob, 4096)

    k = jax.random.key(4)
    g_s = jax.grad(loss_sharded)(flow, k)
    g_l = jax.grad(loss_local)(flow, k)
    n_s = float(global_norm(g_s))
    n_l = float(global_norm(g_l))
    assert np.isfinite(n_s) and n_s > 0
    # MC noise only; norms should agree within ~20% at 4096 samples
    assert abs(n_s - n_l) / n_l < 0.2, (n_s, n_l)


def test_sharded_sampling(mesh):
    flow, _ = _setup()
    ys = sample_sharded(flow, jax.random.key(5), 1024, mesh)
    assert ys.shape == (1024, 2)
    assert bool(jnp.all(jnp.isfinite(ys)))
    # batch axis is actually sharded over 8 devices
    assert len(ys.sharding.device_set) == 8


def test_sharded_train_step_under_jit(mesh):
    """The full sharded train step jits and executes (the dryrun path)."""
    flow, target = _setup()
    objective = shard_objective(nf.elbo_batch, mesh)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(flow)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    @jax.jit
    def step(flow, opt_state, key):
        def loss(f):
            return -objective(key, f, target.log_prob, 64)

        loss_val, grads = jax.value_and_grad(loss)(flow)
        grads = apply_mask(grads, mask)
        updates, opt_state = optimizer.update(grads, opt_state, flow)
        return optax.apply_updates(flow, updates), opt_state, loss_val

    f2, st2, lv = step(flow, opt_state, jax.random.key(6))
    assert np.isfinite(float(lv))


def test_train_flow_with_sharded_objective(mesh):
    """shard_objective drops into train_flow unchanged: mean-field VI
    recovers the target across 8 devices."""
    dtype = jnp.float32
    target = nf.DiagNormal(jnp.full((2,), 3.0, dtype),
                           jnp.full((2,), 0.5, dtype))
    flow = nf.create_flow(
        [nf.Scale(jnp.ones((2,), dtype)), nf.Shift(jnp.zeros((2,), dtype))],
        nf.DiagNormal.standard(2, dtype),
    )
    res = nf.train_flow(
        jax.random.key(7),
        shard_objective(nf.elbo_batch, mesh),
        flow,
        target.log_prob,
        64,
        max_iters=2000,
        optimizer=optax.adam(1e-2),
        check_every=500,
    )
    shift = np.asarray(res.flow.bijector.bijectors[1].b)
    scale = np.abs(np.asarray(res.flow.bijector.bijectors[0].a))
    assert np.all(np.abs(shift - 3.0) < 0.2)
    assert np.all(np.abs(scale - 0.5) < 0.2)


def test_per_shard_keys_differ(mesh):
    """Shards draw independent streams (fold_in on axis index)."""
    flow, _ = _setup()
    ys = sample_sharded(flow, jax.random.key(8), 64, mesh)
    per_dev = np.asarray(ys).reshape(8, 8, 2)
    # no two device blocks identical
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.allclose(per_dev[i], per_dev[j])
