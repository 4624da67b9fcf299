"""Flow-zoo invariants — replicates reference `test/flow.jl:1-262`.

For each flow family × dtype: (a) sampling shape/dtype and log_prob shape;
(b) inverse round-trip `x ≈ T⁻¹(T(x))` with `logdet_fwd ≈ −logdet_inv` on a
single vector AND a 10-row batch (rtol 1e-6 RealNVP, 1e-4 NSF/planar/radial,
matching the reference's tolerance tiers — checked in float64; float32 gets
the precision-limited tier); (c) ELBO finite at batch 64 and batch 1;
(d) gradients exist and are finite for every flow (the reference's AD-matrix
suite, `test/ad.jl` — including NSF, which is Zygote-only there).
"""

import jax
import jax.numpy as jnp
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.utils.pytree import (
    apply_mask,
    global_norm,
    trainable_mask,
)

DIM = 5


def make_flow(name, key, dtype):
    if name == "realnvp":
        return nf.realnvp(key, nf.DiagNormal.standard(DIM, dtype), (32, 32),
                          nlayers=2, dtype=dtype)
    if name == "nsf":
        return nf.nsf(key, nf.DiagNormal.standard(DIM, dtype), (32, 32),
                      K=10, B=5.0, nlayers=2, dtype=dtype)
    if name == "planar":
        return nf.planarflow(key, nf.DiagNormal.standard(DIM, dtype),
                             nlayers=10, dtype=dtype)
    if name == "radial":
        return nf.radialflow(key, nf.DiagNormal.standard(DIM, dtype),
                             nlayers=10, dtype=dtype)
    if name == "maf":
        return nf.maf(key, nf.DiagNormal.standard(DIM, dtype), (32, 32),
                      nlayers=3, dtype=dtype)
    if name == "iaf":
        return nf.iaf(key, nf.DiagNormal.standard(DIM, dtype), (32, 32),
                      nlayers=3, dtype=dtype)
    raise ValueError(name)


FLOWS = ["realnvp", "nsf", "planar", "radial", "maf", "iaf"]


def rtol_for(name, dtype):
    if dtype == jnp.float64:
        # maf/iaf inverses are exact after `dim` fixed-point sweeps
        # (strictly triangular dependency) — same tier as analytic RealNVP
        return 1e-6 if name in ("realnvp", "maf", "iaf") else 1e-4
    return 1e-4  # float32 tier


@pytest.mark.parametrize("name", FLOWS)
def test_sampling_shapes(name, key, dtype):
    flow = make_flow(name, key, dtype)
    ys = flow.sample(jax.random.key(1), (100,))
    assert ys.shape == (100, DIM)
    assert ys.dtype == dtype
    lp = flow.log_prob(ys)
    assert lp.shape == (100,)
    assert bool(jnp.all(jnp.isfinite(lp)))


@pytest.mark.parametrize("name", FLOWS)
def test_inverse_roundtrip(name, key, dtype):
    flow = make_flow(name, key, dtype)
    b = flow.bijector
    rtol = rtol_for(name, dtype)

    for shape in [(DIM,), (10, DIM)]:
        x = jax.random.normal(jax.random.key(2), shape, dtype)
        y, ld = b.forward_and_log_det(x)
        x2, ld2 = b.inverse_and_log_det(y)
        scale = jnp.maximum(jnp.max(jnp.abs(x)), 1.0)
        assert bool(jnp.all(jnp.abs(x - x2) <= rtol * scale)), (
            f"{name} {dtype} roundtrip: {float(jnp.max(jnp.abs(x - x2)))}"
        )
        ld_scale = jnp.maximum(jnp.max(jnp.abs(ld)), 1.0)
        assert bool(jnp.all(jnp.abs(ld + ld2) <= rtol * ld_scale))


@pytest.mark.parametrize("name", FLOWS)
def test_elbo_finite(name, key, dtype):
    flow = make_flow(name, key, dtype)
    target = nf.Banana(DIM, 1.0, 10.0)
    for n in (64, 1):
        val = nf.elbo_batch(jax.random.key(3), flow, target.log_prob, n)
        assert bool(jnp.isfinite(val)), f"{name} n={n}"
        val = nf.elbo(jax.random.key(3), flow, target.log_prob, n)
        assert bool(jnp.isfinite(val))


@pytest.mark.parametrize("name", FLOWS)
def test_elbo_gradients_finite(name, key):
    """AD through every flow (reference test/ad.jl:78-170; NSF included —
    the Zygote-only restriction is lifted)."""
    dtype = jnp.float32
    flow = make_flow(name, key, dtype)
    target = nf.Banana(DIM, 1.0, 10.0)

    def loss(f):
        return -nf.elbo_batch(jax.random.key(4), f, target.log_prob, 16)

    grads = jax.grad(loss)(flow)
    mask = trainable_mask(flow, frozen=lambda m: m is flow.base)
    grads = apply_mask(grads, mask)
    gn = float(global_norm(grads))
    assert jnp.isfinite(gn) and gn > 0.0


@pytest.mark.parametrize("name", ["realnvp", "nsf", "maf", "iaf"])
def test_log_prob_gradients_finite(name, key):
    """Gradients through the INVERSE path (forward-KL training)."""
    dtype = jnp.float32
    flow = make_flow(name, key, dtype)
    data = jax.random.normal(jax.random.key(5), (32, DIM), dtype)

    def loss(f):
        return -nf.loglikelihood(f, data)

    gn = float(global_norm(jax.grad(loss)(flow)))
    assert jnp.isfinite(gn) and gn > 0.0


def test_jit_compilation(key):
    """The full sample→logdet→elbo path compiles under jit (static shapes)."""
    flow = nf.realnvp(key, DIM, (16, 16), nlayers=2)
    target = nf.Banana(DIM, 1.0, 10.0)

    @jax.jit
    def f(flow, key):
        return nf.elbo_batch(key, flow, target.log_prob, 32)

    v1 = f(flow, jax.random.key(0))
    v2 = f(flow, jax.random.key(0))
    assert jnp.allclose(v1, v2)


@pytest.mark.parametrize("name", ["maf", "iaf"])
def test_autoregressive_jitted_both_directions(name, key):
    """Both log_prob (Permute.inverse path) and sample compile and run
    under jit — regression test for the traced-argsort inverse-permutation
    crash (autoregressive.py Permute.inverse_and_log_det)."""
    flow = make_flow(name, key, jnp.float32)
    ys = jax.jit(lambda k: flow.sample(k, (16,)))(jax.random.key(1))
    lp = jax.jit(flow.log_prob)(ys)
    assert ys.shape == (16, DIM) and lp.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_autoregressive_logdet_vs_autodiff_jacobian(key):
    """MaskedAutoregressive log-det matches the exact autodiff Jacobian,
    and the Jacobian is triangular in the MADE ordering (MADE mask proof)."""
    layer = nf.maf_layer(key, DIM, (16, 16), dtype=jnp.float64)
    x = jax.random.normal(jax.random.key(2), (DIM,), jnp.float64)
    y, ld = layer.forward_and_log_det(x)
    J = jax.jacfwd(lambda v: layer.forward_and_log_det(v)[0])(x)
    # strictly upper-triangular part must be exactly zero: output i depends
    # only on inputs j <= i (diagonal is the elementwise affine scale)
    assert bool(jnp.all(jnp.triu(J, k=1) == 0.0))
    ld_exact = jnp.sum(jnp.log(jnp.abs(jnp.diag(J))))
    assert jnp.allclose(ld, ld_exact, rtol=1e-10)


def test_remat_matches_no_remat(key):
    """`remat=True` (backward-pass activation recompute in the Repeated
    scan) changes scheduling only: values and gradients must be identical
    to the default within float tolerance."""
    import optax  # noqa: F401

    mk = lambda remat: nf.realnvp(key, DIM, (16, 16), nlayers=3,
                                  remat=remat)
    f0, f1 = mk(False), mk(True)
    xs = jax.random.normal(jax.random.key(3), (32, DIM))

    def loss(f):
        return -nf.elbo_from_samples(xs, f, lambda y: -0.5 * jnp.sum(
            jnp.square(y), axis=-1))

    l0, g0 = jax.jit(jax.value_and_grad(loss))(f0)
    l1, g1 = jax.jit(jax.value_and_grad(loss))(f1)
    assert jnp.allclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        assert jnp.allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["realnvp", "nsf"])
def test_pair_stack_matches_flat_chain(name, key):
    """The split-carry scan layouts (CouplingPairStack / SplinePairStack)
    are the SAME flow as the flat per-layer Chain (scan=False) — fwd, ld,
    inverse, and ELBO gradients all agree (VERDICT r3 item 2 rewrite)."""
    if name == "realnvp":
        build = lambda scan: nf.realnvp(  # noqa: E731
            key, DIM, (16, 16), nlayers=3, scan=scan)
    else:
        build = lambda scan: nf.nsf(  # noqa: E731
            key, DIM, (16, 16), K=8, B=5.0, nlayers=3, scan=scan)
    stacked, flat = build(True), build(False)
    x = jax.random.normal(jax.random.key(1), (32, DIM))
    y1, ld1 = stacked.bijector.forward_and_log_det(x)
    y2, ld2 = flat.bijector.forward_and_log_det(x)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-5
    assert float(jnp.max(jnp.abs(ld1 - ld2))) < 1e-5
    x1, li1 = stacked.bijector.inverse_and_log_det(y2)
    x2, li2 = flat.bijector.inverse_and_log_det(y2)
    assert float(jnp.max(jnp.abs(x1 - x2))) < 1e-5
    assert float(jnp.max(jnp.abs(li1 - li2))) < 1e-5

    target = nf.Banana(DIM, 1.0, 10.0)
    kk = jax.random.key(2)
    g1 = jax.grad(lambda f: -nf.elbo_batch(kk, f, target.log_prob, 16))(
        stacked)
    g2 = jax.grad(lambda f: -nf.elbo_batch(kk, f, target.log_prob, 16))(
        flat)
    n1, n2 = float(global_norm(g1)), float(global_norm(g2))
    assert abs(n1 - n2) / max(n2, 1e-9) < 1e-4, (n1, n2)


def test_nsf_affine_wrap_invariants(key):
    """`nsf(..., affine_wrap=True)` (VERDICT r4 item 1: the trainable
    envelope that lifts the [-B,B] box ceiling): starts as the exact
    identity under identity_init, round-trips, and the envelope ActNorms
    actually receive gradient signal."""
    flow = nf.nsf(key, DIM, (16, 16), K=8, B=5.0, nlayers=2,
                  identity_init=True, affine_wrap=True)

    # exact identity map at init (identity splines + identity ActNorms)
    x = jax.random.normal(jax.random.key(1), (32, DIM))
    y, ld = flow.bijector.forward_and_log_det(x)
    assert float(jnp.max(jnp.abs(y - x))) < 1e-6
    assert float(jnp.max(jnp.abs(ld))) < 1e-6

    # round-trip after perturbing the envelope away from identity
    from normalizingflows.jl_tpu.models.linear import ActNorm

    bijs = list(flow.bijector.bijectors)
    assert isinstance(bijs[0], ActNorm) and isinstance(bijs[-1], ActNorm)
    bijs[-1] = ActNorm(jnp.full((DIM,), 1.5), jnp.full((DIM,), 3.0))
    warped = nf.create_flow(bijs, flow.base)
    y, ld = warped.bijector.forward_and_log_det(x)
    x2, ld2 = warped.bijector.inverse_and_log_det(y)
    assert float(jnp.max(jnp.abs(x2 - x))) < 1e-4
    assert float(jnp.max(jnp.abs(ld + ld2))) < 1e-4
    # samples now escape the [-B,B] box the bare architecture is pinned to
    s = warped.sample(jax.random.key(2), (256,))
    assert float(jnp.max(jnp.abs(s))) > 5.0

    # envelope params get gradient signal (they are trainable leaves)
    target = nf.Banana(DIM, 1.0, 10.0)
    g = jax.grad(lambda f: -nf.elbo_batch(jax.random.key(3), f,
                                          target.log_prob, 32))(flow)
    g_out = g.bijector.bijectors[-1]
    assert float(global_norm(g_out)) > 0.0
