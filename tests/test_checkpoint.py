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


def test_resume_trajectory_bitwise(tmp_path, key):
    """Train 200 steps vs train 100 → save → load → train 100: the loss
    trajectories and final parameters must be BITWISE identical, optimizer
    state included (VERDICT r4 item 6a — the checkpoint must preserve the
    exact optimization trajectory, not merely approximate state).

    Key contract for exact resume: `train_flow` advances its PRNG as
    ``key, sub = split(key)`` once per chunk, so the resumed run must be
    given the advanced key ``split(key0)[0]`` to see the same sample
    stream the uninterrupted run saw."""
    target = nf.Banana(2, 1.0, 10.0)

    def make_flow():
        return nf.realnvp(key, 2, (8, 8), nlayers=2)

    k0 = jax.random.key(3)
    resA = nf.train_flow(k0, nf.elbo_batch, make_flow(), target.log_prob,
                         8, max_iters=200, check_every=100)

    resB1 = nf.train_flow(k0, nf.elbo_batch, make_flow(), target.log_prob,
                          8, max_iters=100, check_every=100)
    path = str(tmp_path / "traj.npz")
    save_train_state(path, resB1.state)
    restored = load_train_state(path, resB1.state)

    k1, _ = jax.random.split(k0)  # the chunk-advanced key
    resB2 = nf.train_flow(k1, nf.elbo_batch, make_flow(), target.log_prob,
                          8, max_iters=100, check_every=100,
                          resume_state=restored)

    lossA = np.asarray(resA.stats["loss"])
    lossB = np.concatenate([np.asarray(resB1.stats["loss"]),
                            np.asarray(resB2.stats["loss"])])
    np.testing.assert_array_equal(lossB, lossA)
    for a, b in zip(jax.tree_util.tree_leaves(resA.flow),
                    jax.tree_util.tree_leaves(resB2.flow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state too (Adam moments + count)
    for a, b in zip(jax.tree_util.tree_leaves(resA.state.opt_state),
                    jax.tree_util.tree_leaves(resB2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_train_state_and_sharded_leaf(tmp_path, key):
    """Orbax backend round-trips a full TrainState AND a mesh-sharded
    array leaf with its sharding preserved through the templated restore
    (the multi-host contract, exercised for real across two processes in
    tests/test_distributed.py::test_two_process_orbax_checkpoint)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from normalizingflows.jl_tpu.parallel.mesh import batch_mesh

    mesh = batch_mesh()
    sh = NamedSharding(mesh, P("batch"))
    n_dev = len(jax.devices())
    data = jax.device_put(
        jnp.arange(4.0 * n_dev).reshape(n_dev, 4), sh)
    flow = nf.realnvp(key, 2, (8, 8), nlayers=2)
    path = str(tmp_path / "ckpt_sharded")
    save_pytree(path, {"flow": flow, "data": data}, backend="orbax")

    template = {
        "flow": nf.realnvp(jax.random.key(9), 2, (8, 8), nlayers=2),
        "data": jax.device_put(jnp.zeros((n_dev, 4)), sh),
    }
    restored = load_pytree(path, template, backend="orbax")
    np.testing.assert_array_equal(np.asarray(restored["data"]),
                                  np.asarray(data))
    assert restored["data"].sharding.is_equivalent_to(sh, data.ndim)
    for a, b in zip(jax.tree_util.tree_leaves(restored["flow"]),
                    jax.tree_util.tree_leaves(flow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
