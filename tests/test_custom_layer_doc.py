"""The docs/customized_layer.md worked example, executed as a test.

Guards the extension tutorial (counterpart of reference
`docs/src/customized_layer.md:82-151`) against API drift: the
InvertibleAffine layer is defined exactly as in the doc, then checked
against the framework invariants it tells users to verify."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import normalizingflows as nf
from normalizingflows.jl_tpu.models.bijector import Bijector
from normalizingflows.jl_tpu.utils.pytree import module


@module
class InvertibleAffine(Bijector):
    """y = W x + b with W lower-triangular, positive diagonal."""

    W_raw: jax.Array
    b: jax.Array

    def _W_and_logdiag(self):
        d = self.b.shape[-1]
        L = jnp.tril(self.W_raw, -1)
        log_diag = self.W_raw[jnp.arange(d), jnp.arange(d)]
        W = L + jnp.diag(jnp.exp(log_diag))
        return W, log_diag

    def forward_and_log_det(self, x):
        W, log_diag = self._W_and_logdiag()
        y = x @ W.T + self.b
        ld = jnp.broadcast_to(jnp.sum(log_diag), x.shape[:-1])
        return y, ld

    def inverse_and_log_det(self, y):
        W, log_diag = self._W_and_logdiag()
        d = self.b.shape[-1]
        z = (y - self.b).reshape(-1, d).T
        x = jax.scipy.linalg.solve_triangular(
            W, z, lower=True).T.reshape(y.shape)
        ld = jnp.broadcast_to(-jnp.sum(log_diag), y.shape[:-1])
        return x, ld


def _make_flow(key, d=4):
    layer = InvertibleAffine(
        0.1 * jax.random.normal(key, (d, d)), jnp.zeros(d)
    )
    return nf.create_flow(
        [layer, nf.Shift(jnp.ones(d))], nf.DiagNormal.standard(d)
    )


def test_doc_layer_roundtrip(key):
    flow = _make_flow(key)
    x = jax.random.normal(jax.random.key(1), (10, 4))
    y, ld = flow.bijector.forward_and_log_det(x)
    xi, ldi = flow.bijector.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(x), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldi), -np.asarray(ld), rtol=1e-6)


def test_doc_layer_trains(key):
    target = nf.DiagNormal(jnp.full((4,), 2.0), jnp.full((4,), 0.5))
    flow = _make_flow(key)
    before = float(nf.elbo_batch(key, flow, target.log_prob, 256))
    result = nf.train_flow(
        key, nf.elbo_batch, flow, target.log_prob, 64,
        max_iters=500, optimizer=optax.adam(5e-2), check_every=250,
    )
    after = float(
        nf.elbo_batch(jax.random.key(9), result.flow, target.log_prob, 256)
    )
    assert after > before
    assert after > -0.5


def test_doc_layer_stacks(key):
    layers = [
        InvertibleAffine(0.1 * jax.random.normal(k, (4, 4)), jnp.zeros(4))
        for k in jax.random.split(key, 3)
    ]
    flow = nf.create_flow([nf.stack_bijectors(layers)],
                          nf.DiagNormal.standard(4))
    x = jax.random.normal(jax.random.key(1), (6, 4))
    y, ld = flow.bijector.forward_and_log_det(x)
    xi, ldi = flow.bijector.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(x), rtol=1e-5,
                               atol=1e-6)
