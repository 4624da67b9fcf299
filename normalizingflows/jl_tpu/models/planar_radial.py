"""Planar and radial flows (Rezende & Mohamed 2015).

Replaces the Bijectors.jl `PlanarLayer` / `RadialLayer` consumed by the
reference's constructors (`src/flows/planar_radial.jl:21-29,52-60`).

Planar: T(x) = x + û·tanh(wᵀx + b), with the invertibility
reparameterization û = u + ((softplus(wᵀu) − 1 − wᵀu)/‖w‖²)·w so that
wᵀû = softplus(wᵀu) − 1 > −1 (the `get_u_hat` formula reproduced in the
reference's CUDA test, `test/ext/CUDA/cuda.jl:12-17`).

Radial: T(x) = x + β·(x − z₀)/(α + r), r = ‖x − z₀‖, with α = softplus(α̂)
and β = −α + softplus(β̂) ≥ −α guaranteeing invertibility (Bijectors.jl's
parameterization).

Neither inverse has a closed form; both reduce to a scalar monotone
root-find (`test/flow.jl:158-172,224-238` exercises them at rtol 1e-4),
done here with a fixed-iteration vectorized bisection+Newton solve
(`ops/solvers.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.solvers import solve_monotone
from ..utils.pytree import module
from .bijector import Bijector, stack_bijectors
from .distributions import DiagNormal, Distribution, TransformedDistribution
from .flows import create_flow

__all__ = ["PlanarLayer", "RadialLayer", "planarflow", "radialflow"]


@module
class PlanarLayer(Bijector):
    u: jax.Array  # (dim,)
    w: jax.Array  # (dim,)
    b: jax.Array  # ()

    @staticmethod
    def make(key: jax.Array, dim: int, dtype=jnp.float32) -> "PlanarLayer":
        """Init matches Bijectors.jl: standard-normal u, w, b."""
        ku, kw, kb = jax.random.split(key, 3)
        return PlanarLayer(
            jax.random.normal(ku, (dim,), dtype),
            jax.random.normal(kw, (dim,), dtype),
            jax.random.normal(kb, (), dtype),
        )

    def _u_hat(self):
        wu = jnp.dot(self.w, self.u)
        m = jax.nn.softplus(wu) - 1.0  # = log1pexp(wᵀu) − 1 > −1
        u_hat = self.u + (m - wu) / jnp.sum(jnp.square(self.w)) * self.w
        return u_hat, m  # m == wᵀû

    def forward_and_log_det(self, x):
        u_hat, wu_hat = self._u_hat()
        a = x @ self.w + self.b  # (...,)
        h = jnp.tanh(a)
        y = x + h[..., None] * u_hat
        # d/da tanh = 1 − tanh²; |det J| = |1 + h'(a)·wᵀû|
        psi = (1.0 - jnp.square(h)) * wu_hat
        log_det = jnp.log(jnp.abs(1.0 + psi))
        return y, log_det

    def inverse_and_log_det(self, y):
        u_hat, wu_hat = self._u_hat()
        rhs = y @ self.w + self.b  # = a + wᵀû·tanh(a), solve for a
        c = wu_hat

        def f(a):
            return a + c * jnp.tanh(a) - rhs

        # a = rhs − c·tanh(a) ⇒ a ∈ [rhs − |c|, rhs + |c|]
        lo = rhs - jnp.abs(c)
        hi = rhs + jnp.abs(c)
        a = solve_monotone(f, lo, hi)
        h = jnp.tanh(a)
        x = y - h[..., None] * u_hat
        psi = (1.0 - jnp.square(h)) * wu_hat
        log_det = -jnp.log(jnp.abs(1.0 + psi))
        return x, log_det


@module
class RadialLayer(Bijector):
    alpha_raw: jax.Array  # () — α = softplus(alpha_raw)
    beta_raw: jax.Array   # () — β = −α + softplus(beta_raw)
    z0: jax.Array         # (dim,)

    @staticmethod
    def make(key: jax.Array, dim: int, dtype=jnp.float32) -> "RadialLayer":
        ka, kb, kz = jax.random.split(key, 3)
        return RadialLayer(
            jax.random.normal(ka, (), dtype),
            jax.random.normal(kb, (), dtype),
            jax.random.normal(kz, (dim,), dtype),
        )

    def _alpha_beta(self):
        alpha = jax.nn.softplus(self.alpha_raw)
        beta = -alpha + jax.nn.softplus(self.beta_raw)
        return alpha, beta

    def forward_and_log_det(self, x):
        alpha, beta = self._alpha_beta()
        d = x.shape[-1]
        diff = x - self.z0
        r = jnp.linalg.norm(diff, axis=-1)
        h = 1.0 / (alpha + r)
        y = x + (beta * h)[..., None] * diff
        # J = (1+βh)I + βh'(r) (x−z₀)(x−z₀)ᵀ/r, h' = −h²:
        # det = (1+βh)^{d−1} · (1+βh − βh²r)
        log_det = (d - 1) * jnp.log1p(beta * h) + jnp.log1p(
            beta * h - beta * jnp.square(h) * r
        )
        return y, log_det

    def inverse_and_log_det(self, y):
        alpha, beta = self._alpha_beta()
        d = y.shape[-1]
        diff = y - self.z0
        R = jnp.linalg.norm(diff, axis=-1)

        # r·(1 + β/(α+r)) = R is increasing in r for β > −α; bracket:
        # β ≥ 0 ⇒ r ∈ [R−β, R];  β < 0 ⇒ r ∈ [R, R−β]
        def f(r):
            return r + beta * r / (alpha + r) - R

        lo = jnp.maximum(R - jnp.maximum(beta, 0.0), 0.0)
        hi = R + jnp.maximum(-beta, 0.0)
        r = solve_monotone(f, jnp.broadcast_to(lo, R.shape),
                           jnp.broadcast_to(hi, R.shape))
        scale = r / jnp.maximum(R, jnp.finfo(y.dtype).tiny)
        x = self.z0 + scale[..., None] * diff

        h = 1.0 / (alpha + r)
        log_det = -(
            (d - 1) * jnp.log1p(beta * h)
            + jnp.log1p(beta * h - beta * jnp.square(h) * r)
        )
        return x, log_det


def planarflow(
    key: jax.Array,
    q0: Distribution | int,
    nlayers: int = 10,
    dtype=jnp.float32,
    scan: bool = True,
) -> TransformedDistribution:
    """Stack of planar layers (reference `src/flows/planar_radial.jl:21-29`);
    ``scan=True`` composes them via a depth-independent `Repeated` scan."""
    if isinstance(q0, int):
        q0 = DiagNormal.standard(q0, dtype)
    dim = q0.event_dim
    layers = [
        PlanarLayer.make(k, dim, dtype) for k in jax.random.split(key, nlayers)
    ]
    if scan and nlayers > 1:
        return create_flow([stack_bijectors(layers)], q0)
    return create_flow(layers, q0)


def radialflow(
    key: jax.Array,
    q0: Distribution | int,
    nlayers: int = 10,
    dtype=jnp.float32,
    scan: bool = True,
) -> TransformedDistribution:
    """Stack of radial layers (reference `src/flows/planar_radial.jl:52-60`);
    ``scan=True`` composes them via a depth-independent `Repeated` scan."""
    if isinstance(q0, int):
        q0 = DiagNormal.standard(q0, dtype)
    dim = q0.event_dim
    layers = [
        RadialLayer.make(k, dim, dtype) for k in jax.random.split(key, nlayers)
    ]
    if scan and nlayers > 1:
        return create_flow([stack_bijectors(layers)], q0)
    return create_flow(layers, q0)
