"""ActNorm + PLU InvertibleLinear (models/linear.py): exact inverse,
O(d) log-det vs slogdet of the assembled matrix, data-dependent init,
trainability inside a coupling flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.models.linear import ActNorm, InvertibleLinear

DIM = 6


def test_actnorm_data_init_normalizes(key):
    x = jax.random.normal(key, (512, DIM)) * 3.0 + 7.0
    an = ActNorm.initialize(x)
    y, ld = an.forward_and_log_det(x)
    assert float(jnp.max(jnp.abs(jnp.mean(y, axis=0)))) < 1e-4
    assert float(jnp.max(jnp.abs(jnp.std(y, axis=0) - 1.0))) < 1e-3
    assert ld.shape == (512,)

    x2, ld2 = an.inverse_and_log_det(y)
    assert float(jnp.max(jnp.abs(x - x2))) < 1e-4
    assert float(jnp.max(jnp.abs(ld + ld2))) == 0.0


def test_invertible_linear_roundtrip_and_logdet(key, dtype):
    lin = InvertibleLinear.make(key, DIM, dtype)
    x = jax.random.normal(jax.random.key(1), (16, DIM), dtype)
    y, ld = lin.forward_and_log_det(x)
    x2, ld2 = lin.inverse_and_log_det(y)
    tol = 1e-10 if dtype == jnp.float64 else 1e-5
    assert float(jnp.max(jnp.abs(x - x2))) < tol * 100
    assert float(jnp.max(jnp.abs(ld + ld2))) < tol

    # O(d) log-det == slogdet of the full assembled W (W = P L U')
    L, U = lin._plu()
    P = np.asarray(lin.pmat, np.float64)
    W = P @ np.asarray(L, np.float64) @ np.asarray(U, np.float64)
    _, logabsdet = np.linalg.slogdet(W)
    assert float(ld[0]) == pytest.approx(float(logabsdet), abs=1e-5)

    # forward really is x @ W^T
    y_ref = x @ jnp.asarray(W, dtype).T
    assert float(jnp.max(jnp.abs(y - y_ref))) < 1e-4


def test_invertible_linear_init_is_rotation(key):
    lin = InvertibleLinear.make(key, DIM, jnp.float64)
    x = jax.random.normal(jax.random.key(2), (8, DIM), jnp.float64)
    y, ld = lin.forward_and_log_det(x)
    # rotation init: norms preserved, logdet 0
    assert float(jnp.max(jnp.abs(
        jnp.linalg.norm(y, axis=-1) - jnp.linalg.norm(x, axis=-1)))) < 1e-8
    assert float(jnp.max(jnp.abs(ld))) < 1e-8


def test_mixing_flow_trains(key):
    """The `glow` zoo constructor (ActNorm → PLU mixing → coupling pair
    per block) trains end to end and improves the ELBO."""
    k1, k3 = jax.random.split(key)
    target = nf.DiagNormal(jnp.full((DIM,), 3.0), jnp.full((DIM,), 0.7))
    flow = nf.glow(k1, DIM, (16, 16), nlayers=3)

    before = float(nf.elbo_batch(k3, flow, target.log_prob, 512))
    res = nf.train_flow(k3, nf.elbo_batch, flow, target.log_prob, 64,
                        max_iters=600, optimizer=optax.adam(5e-3),
                        check_every=200)
    after = float(nf.elbo_batch(jax.random.key(9), res.flow,
                                target.log_prob, 512))
    assert after > before
    assert after > -1.0

    # P / sign(s) must stay frozen (non-trainable leaves) while log_s
    # trains; the scan layout keeps them in the stacked GlowBlock
    rep0 = flow.bijector.bijectors[0]
    rep1 = res.flow.bijector.bijectors[0]
    assert float(jnp.max(jnp.abs(
        rep0.stacked.mix.sign_s - rep1.stacked.mix.sign_s))) == 0.0
    assert float(jnp.max(jnp.abs(
        rep0.stacked.mix.pmat - rep1.stacked.mix.pmat))) == 0.0
    assert float(jnp.max(jnp.abs(
        rep0.stacked.mix.log_s - rep1.stacked.mix.log_s))) > 0.0


def test_glow_roundtrip_and_jit(key):
    flow = jax.jit(lambda k: nf.glow(k, DIM, (8, 8), nlayers=2))(key)
    x = jax.random.normal(jax.random.key(3), (32, DIM))
    y, ld = flow.bijector.forward_and_log_det(x)
    x2, ld2 = flow.bijector.inverse_and_log_det(y)
    assert float(jnp.max(jnp.abs(x - x2))) < 1e-4
    assert float(jnp.max(jnp.abs(ld + ld2))) < 1e-4
    # log_prob/sample agree under jit
    lp = jax.jit(flow.log_prob)(y)
    assert lp.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def _unstack_blocks(rep):
    from normalizingflows.jl_tpu.models.linear import GlowBlock

    assert isinstance(rep.stacked, GlowBlock)
    return [
        jax.tree_util.tree_map(lambda leaf: leaf[i], rep.stacked)
        for i in range(rep.n)
    ]


def test_glow_init_actnorms(key):
    """Data-dependent init: every ActNorm output over the init batch is
    zero-mean/unit-variance at its position in the stack (scan layout)."""
    flow = nf.glow(key, DIM, (8, 8), nlayers=3)
    x = jax.random.normal(jax.random.key(5), (1024, DIM)) * 2.0 + 1.0
    flow2 = nf.glow_init_actnorms(flow, x)

    h = x
    n_checked = 0
    for block in _unstack_blocks(flow2.bijector.bijectors[0]):
        out, _ = block.actnorm.forward_and_log_det(h)
        assert float(jnp.max(jnp.abs(jnp.mean(out, axis=0)))) < 1e-3
        assert float(jnp.max(jnp.abs(jnp.std(out, axis=0) - 1))) < 1e-2
        n_checked += 1
        h, _ = block.forward_and_log_det(h)
    assert n_checked == 3
    # original flow untouched (immutability)
    assert float(jnp.max(jnp.abs(
        flow.bijector.bijectors[0].stacked.actnorm.log_scale))) == 0.0


def test_glow_scan_matches_flat_chain(key):
    """scan=True (Repeated GlowBlock) and scan=False (flat Chain) are the
    same flow; deep glow compiles one block body (VERDICT r3 item 9)."""
    stacked = nf.glow(key, DIM, (8, 8), nlayers=3, scan=True)
    flat = nf.glow(key, DIM, (8, 8), nlayers=3, scan=False)
    x = jax.random.normal(jax.random.key(6), (16, DIM))
    y1, ld1 = stacked.bijector.forward_and_log_det(x)
    y2, ld2 = flat.bijector.forward_and_log_det(x)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-5
    assert float(jnp.max(jnp.abs(ld1 - ld2))) < 1e-5
    x1, li1 = stacked.bijector.inverse_and_log_det(y1)
    assert float(jnp.max(jnp.abs(x1 - x))) < 1e-4
    assert float(jnp.max(jnp.abs(li1 + ld1))) < 1e-4


def test_glow_mix_seed_varies_rotations(key):
    """ADVICE r3: random restarts must be able to vary the host-side PLU
    rotations via ``mix_seed``."""
    f0 = nf.glow(key, DIM, (8, 8), nlayers=2, mix_seed=0)
    f1 = nf.glow(key, DIM, (8, 8), nlayers=2, mix_seed=1)
    p0 = f0.bijector.bijectors[0].stacked.mix.pmat
    l0 = f0.bijector.bijectors[0].stacked.mix.lower
    p1 = f1.bijector.bijectors[0].stacked.mix.pmat
    l1 = f1.bijector.bijectors[0].stacked.mix.lower
    assert (float(jnp.max(jnp.abs(p0 - p1))) > 0.0
            or float(jnp.max(jnp.abs(l0 - l1))) > 0.0)
