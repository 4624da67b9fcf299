"""Invertible linear-algebra bijectors: ActNorm and PLU-parameterized
dense mixing (the Glow components generalized to flat vectors).

No reference counterpart (its zoo is planar/radial/RealNVP/NSF,
`src/flows/`); cited against Kingma & Dhariwal, "Glow: Generative Flow
with Invertible 1x1 Convolutions" (NeurIPS 2018). Rationale: coupling
flows only mix dimensions through the fixed even/odd partition; a learned
invertible linear layer between coupling blocks lets every dimension
condition on every other at a cost of one (dim × dim) matmul — MXU-native.

TPU design notes:

  * `InvertibleLinear` stores W = P·L·(U + diag(s)) with a STATIC
    permutation P and sign(s) frozen at init (Glow's PLU trick): the
    log-determinant is `Σ log|s|` — O(d) instead of O(d³) — and the
    inverse is two triangular solves. Masks enforcing the triangular
    structure are traced constants XLA folds away.
  * `ActNorm` is an elementwise affine with a data-dependent
    initializer (`ActNorm.initialize(x)`: first-batch output is
    zero-mean/unit-variance per dim) — the Glow replacement for batch
    norm that keeps the program free of running statistics.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.pytree import module, static_field
from .bijector import Bijector

__all__ = ["ActNorm", "InvertibleLinear", "glow", "glow_init_actnorms"]


@module
class ActNorm(Bijector):
    """Per-dimension affine `y = x·exp(log_scale) + shift` with
    data-dependent init; log|det J| = Σ log_scale."""

    log_scale: jax.Array  # (dim,)
    shift: jax.Array      # (dim,)

    @staticmethod
    def identity(dim: int, dtype=jnp.float32) -> "ActNorm":
        return ActNorm(jnp.zeros((dim,), dtype), jnp.zeros((dim,), dtype))

    @staticmethod
    def initialize(x: jax.Array, eps: float = 1e-6) -> "ActNorm":
        """Glow data-dependent init from a (batch, dim) sample batch: the
        initialized layer maps that batch to zero mean / unit variance."""
        mu = jnp.mean(x, axis=0)
        sigma = jnp.std(x, axis=0) + jnp.asarray(eps, x.dtype)
        log_scale = -jnp.log(sigma)
        return ActNorm(log_scale, -mu * jnp.exp(log_scale))

    def forward_and_log_det(self, x):
        y = x * jnp.exp(self.log_scale) + self.shift
        ld = jnp.sum(self.log_scale)
        return y, jnp.broadcast_to(ld, x.shape[:-1])

    def inverse_and_log_det(self, y):
        x = (y - self.shift) * jnp.exp(-self.log_scale)
        ld = -jnp.sum(self.log_scale)
        return x, jnp.broadcast_to(ld, y.shape[:-1])


@module
class InvertibleLinear(Bijector):
    """Dense invertible mixing `y = x @ Wᵀ`, W = P·L·(U + diag(s)).

    P is a static permutation and sign(s) is frozen at init, so W stays
    invertible throughout training and log|det J| = Σ log|s| in O(d).
    """

    lower: jax.Array   # (d, d), strictly-lower part used
    upper: jax.Array   # (d, d), strictly-upper part used
    log_s: jax.Array   # (d,)
    perm: tuple = static_field(default=())      # rows of P
    sign_s: tuple = static_field(default=())    # frozen signs of s

    @staticmethod
    def make(key: "jax.Array | int", dim: int, dtype=jnp.float32
             ) -> "InvertibleLinear":
        """Initialize W as a random rotation (logdet 0), PLU-decomposed
        host-side so P is static. The rotation draw happens on the HOST
        (the permutation/sign structure must be static), so ``key`` must
        be concrete — or pass a plain int seed, which works under jit
        tracing too (the PLU factors become traced-in constants)."""
        if isinstance(key, (int, np.integer)):
            a = np.random.default_rng(int(key)).normal(size=(dim, dim))
        else:
            a = np.asarray(jax.random.normal(key, (dim, dim), jnp.float32))
        q, _ = np.linalg.qr(np.asarray(a, np.float64))
        import scipy.linalg

        p, l, u = scipy.linalg.lu(q)
        s = np.diag(u)
        perm = tuple(int(i) for i in np.argmax(p, axis=0))
        return InvertibleLinear(
            jnp.asarray(np.tril(l, -1), dtype),
            jnp.asarray(np.triu(u, 1), dtype),
            jnp.asarray(np.log(np.abs(s)), dtype),
            perm,
            tuple(float(np.sign(si)) for si in s),
        )

    def _plu(self):
        d = self.log_s.shape[0]
        eye = jnp.eye(d, dtype=self.log_s.dtype)
        L = jnp.tril(self.lower, -1) + eye
        s = jnp.asarray(self.sign_s, self.log_s.dtype) * jnp.exp(self.log_s)
        U = jnp.triu(self.upper, 1) + jnp.diag(s)
        return L, U

    def forward_and_log_det(self, x):
        L, U = self._plu()
        y = (x @ U.T) @ L.T
        # P·v in row-batch convention: gather with argmax(P, axis=1),
        # which is the inverse of the stored column permutation
        y = y[..., jnp.asarray(self._inv_perm())]
        ld = jnp.sum(self.log_s)
        return y, jnp.broadcast_to(ld, x.shape[:-1])

    def inverse_and_log_det(self, y):
        from jax.scipy.linalg import solve_triangular

        L, U = self._plu()
        z = y[..., jnp.asarray(self.perm)]  # Pᵀ y
        # solve for the whole batch in one (d, n) triangular solve
        d = z.shape[-1]
        batch_shape = z.shape[:-1]
        cols = jnp.moveaxis(z.reshape((-1, d)), -1, 0)  # (d, n)
        cols = solve_triangular(L, cols, lower=True)
        cols = solve_triangular(U, cols, lower=False)
        x = jnp.moveaxis(cols, 0, -1).reshape(batch_shape + (d,))
        ld = -jnp.sum(self.log_s)
        return x, jnp.broadcast_to(ld, y.shape[:-1])

    def _inv_perm(self):
        return tuple(sorted(range(len(self.perm)),
                            key=self.perm.__getitem__))


def glow(
    key: jax.Array,
    q0,
    hdims: Sequence[int] = (32, 32),
    nlayers: int = 3,
    dtype=jnp.float32,
    compute_dtype=None,
):
    """Glow-style flow for flat vectors: ``nlayers`` blocks of
    ActNorm → InvertibleLinear (PLU mixing) → RealNVP coupling pair.

    No reference counterpart (Kingma & Dhariwal 2018 applied to the
    reference's flat-vector setting). The learned dense mixing replaces
    Glow's invertible 1×1 conv — one (d×d) matmul per block keeps the
    layer MXU-native while letting every dimension condition on every
    other, instead of only across the fixed even/odd partition.

    ActNorms start as the identity; call :func:`glow_init_actnorms` with a
    base-sample batch for Glow's data-dependent initialization. ``q0`` may
    be a base distribution or an int dim.
    """
    from .coupling import RealNVP_layer
    from .distributions import DiagNormal
    from .flows import create_flow

    if isinstance(q0, int):
        q0 = DiagNormal.standard(q0, dtype)
    dim = q0.event_dim
    layers = []
    for i, k in enumerate(jax.random.split(key, nlayers)):
        layers.append(ActNorm.identity(dim, dtype))
        # static int seed: the PLU rotation init is host-side (static
        # permutation), so it must not depend on the (possibly traced) key
        layers.append(InvertibleLinear.make(i, dim, dtype))
        layers.extend(RealNVP_layer(k, dim, hdims, dtype, compute_dtype))
    return create_flow(layers, q0)


def glow_init_actnorms(flow, x: jax.Array):
    """Glow data-dependent init: run ``x`` (a (batch, dim) draw from the
    data/base) through the flow front-to-back, re-initializing every
    ActNorm so its output over the batch is zero-mean/unit-variance per
    dim. Returns a new flow (pytrees are immutable)."""
    bijs = list(flow.bijector.bijectors)
    for i, b in enumerate(bijs):
        if isinstance(b, ActNorm):
            b = ActNorm.initialize(x)
            bijs[i] = b
        x, _ = b.forward_and_log_det(x)
    chain = type(flow.bijector)(tuple(bijs))
    return type(flow)(flow.base, chain)
