"""Mixed-precision policy (SURVEY §7 hard part 3): params master-f32,
conditioner matmuls in bf16 with f32 accumulation (`nets.Dense
compute_dtype`). The policy must (a) keep parameters and log-densities in
f32, (b) track the full-precision program within bf16 tolerance, and
(c) train: gradients finite, updates keep the master dtype.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import (
    apply_mask,
    global_norm,
    trainable_mask,
)

DIM = 8


def _flows():
    key = jax.random.key(0)
    f32 = nf.realnvp(key, DIM, (32, 32), nlayers=3)
    bf16 = nf.realnvp(key, DIM, (32, 32), nlayers=3,
                      compute_dtype=jnp.bfloat16)
    return f32, bf16


def test_bf16_policy_params_stay_f32():
    _, flow = _flows()
    for leaf in jax.tree_util.tree_leaves(flow):
        assert leaf.dtype in (jnp.float32,), leaf.dtype


def test_bf16_policy_tracks_f32_forward():
    f32, bf16 = _flows()
    x = jax.random.normal(jax.random.key(1), (64, DIM), jnp.float32)
    y32, ld32 = f32.bijector.forward_and_log_det(x)
    y16, ld16 = bf16.bijector.forward_and_log_det(x)
    assert y16.dtype == jnp.float32  # f32 accumulation / outputs
    # bf16 has ~8 mantissa bits → relative error ~4e-3 per matmul; allow
    # headroom for 6 couplings of depth-3 MLPs
    scale = jnp.maximum(jnp.abs(y32), 1.0)
    assert float(jnp.max(jnp.abs(y16 - y32) / scale)) < 0.05
    ld_scale = jnp.maximum(jnp.abs(ld32), 1.0)
    assert float(jnp.max(jnp.abs(ld16 - ld32) / ld_scale)) < 0.05


def test_bf16_policy_roundtrip():
    _, bf16 = _flows()
    x = jax.random.normal(jax.random.key(2), (32, DIM), jnp.float32)
    y, ld = bf16.bijector.forward_and_log_det(x)
    x2, ld2 = bf16.bijector.inverse_and_log_det(y)
    # the SAME bf16 program is applied in both directions, so the analytic
    # coupling inverse is still a tight roundtrip
    assert float(jnp.max(jnp.abs(x - x2))) < 1e-4 * float(
        jnp.maximum(jnp.max(jnp.abs(x)), 1.0)
    )
    assert float(jnp.max(jnp.abs(ld + ld2))) < 1e-4


def test_bf16_policy_trains():
    _, flow = _flows()
    target = nf.Banana(DIM, 1.0, 10.0)

    def loss(f):
        return -nf.elbo_batch(jax.random.key(3), f, target.log_prob, 32)

    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
    val, grads = jax.value_and_grad(loss)(flow)
    grads = apply_mask(grads, mask)
    gn = float(global_norm(grads))
    assert jnp.isfinite(val) and jnp.isfinite(gn) and gn > 0.0

    opt = optax.adam(1e-3)
    updates, _ = opt.update(grads, opt.init(flow), flow)
    flow2 = optax.apply_updates(flow, updates)
    for leaf in jax.tree_util.tree_leaves(flow2):
        assert leaf.dtype == jnp.float32  # master params unchanged by policy


@pytest.mark.parametrize("shape", [(16,), (4, 16)])
def test_dense_compute_dtype_unit(shape):
    from normalizingflows.jl_tpu.models.nets import Dense

    d = Dense.make(jax.random.key(0), 16, 8, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    y = d(x)
    assert y.dtype == jnp.float32
    ref = Dense(d.W, d.b, None, None)(x)
    assert float(jnp.max(jnp.abs(y - ref))) < 0.05 * float(
        jnp.maximum(jnp.max(jnp.abs(ref)), 1.0)
    )
