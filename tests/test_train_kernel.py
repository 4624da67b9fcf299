"""Whole-run fused train kernel (`experimental/train_pallas.py`) vs optax.

Same presampled base draws through (a) `train_flow`-style unfused
jax.value_and_grad + optax.adam scan and (b) the single-`pallas_call`
on-chip training run — loss trajectory and trained weights must agree to
f32 tolerance. Runs in Pallas interpret mode on the CPU test backend;
compiled on TPU (where bench.py exercises it).
"""

import math

import jax
import jax.numpy as jnp
import optax
import pytest

import normalizingflows as nf

pytestmark = pytest.mark.archive  # retired-kernel archive (VERDICT r4 item 7)
from normalizingflows.jl_tpu.experimental.train_pallas import (
    adam_train_realnvp_fused,
)
from normalizingflows.jl_tpu.utils.pytree import apply_mask, trainable_mask

N_STEPS, BATCH, DIM = 25, 16, 2
LR = 5e-4


def _banana_logp_static(target):
    """Banana log-density with Python-scalar closure constants (the
    wrapper's documented contract for in-kernel targets)."""
    b, var = float(target.b), float(target.var)

    def logp(x):
        z2 = x[..., 1] + b * jnp.square(x[..., 0]) - var * b
        log_z = 0.5 * (DIM * math.log(2 * math.pi) + math.log(var))
        quad = jnp.square(x[..., 0]) / var + jnp.square(z2)
        return -log_z - 0.5 * quad

    return logp


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(0)
    flow = nf.realnvp(key, DIM, (16, 16), nlayers=3)
    fused = nf.realnvp(key, DIM, (16, 16), nlayers=3, fused=True,
                       interpret=True)
    target = nf.Banana(DIM, 1.0, 100.0)
    xs = flow.base.sample(jax.random.key(1), (N_STEPS, BATCH))
    return flow, fused, target, xs


def _optax_reference(flow, target, xs):
    opt = optax.adam(LR)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)

    def step(carry, x):
        f, st = carry
        loss, g = jax.value_and_grad(
            lambda f: -nf.elbo_from_samples(x, f, target.log_prob)
        )(f)
        g = apply_mask(g, mask)
        u, st = opt.update(g, st, f)
        return (optax.apply_updates(f, u), st), loss

    (f_tr, _), losses = jax.lax.scan(step, (flow, opt.init(flow)), xs)
    return f_tr, losses


def test_fused_train_matches_optax(setup):
    flow, fused, target, xs = setup
    _, losses_ref = _optax_reference(flow, target, xs)

    fb = fused.bijector.bijectors[0]
    groups, losses = adam_train_realnvp_fused(
        xs, fb.groups, fb.idx_even, fb.idx_odd,
        _banana_logp_static(target),
        fused.base.loc, fused.base.scale, LR, interpret=True,
    )
    # identical math module-vs-kernel: first step exact, trajectory within
    # f32 accumulation drift
    assert float(losses[0]) == pytest.approx(float(losses_ref[0]), rel=1e-6)
    ref = jnp.abs(losses_ref) + 1.0
    assert float(jnp.max(jnp.abs(losses - losses_ref) / ref)) < 5e-5
    # trained weights finite and actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), groups, fb.groups
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-4
    assert all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(groups)
    )


def test_fused_train_multi_chunk_matches_single(setup):
    """chunk < n_steps exercises the weight/Adam-moment threading between
    kernel launches and the global-step bias correction (step0): the
    trajectory must be identical to one single-chunk launch."""
    _, fused, target, xs = setup
    fb = fused.bijector.bijectors[0]
    args = (xs, fb.groups, fb.idx_even, fb.idx_odd,
            _banana_logp_static(target), fused.base.loc, fused.base.scale,
            LR)
    groups_1, losses_1 = adam_train_realnvp_fused(*args, interpret=True)
    groups_8, losses_8 = adam_train_realnvp_fused(*args, interpret=True,
                                                  chunk=8)
    assert jnp.allclose(losses_1, losses_8, rtol=1e-6, atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), groups_1, groups_8
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_train_realnvp_fused_api(setup):
    _, fused, target, _ = setup
    result = nf.train_realnvp_fused(
        jax.random.key(2), fused, _banana_logp_static(target),
        BATCH, max_iters=N_STEPS, learning_rate=LR, interpret=True,
    )
    assert result.stats["loss"].shape == (N_STEPS,)
    # the returned flow must be a working TransformedDistribution
    s = result.flow.sample(jax.random.key(3), (8,))
    lp = result.flow.log_prob(s)
    assert s.shape == (8, DIM) and lp.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_train_realnvp_fused_rejects_unfused(setup):
    flow, _, target, _ = setup
    with pytest.raises(ValueError, match="fused=True"):
        nf.train_realnvp_fused(
            jax.random.key(2), flow, _banana_logp_static(target), BATCH,
            max_iters=2,
        )
