"""Synthetic target distributions (test fixtures + demo targets).

Re-derivations of the reference's `example/targets/` zoo:
  * Banana       — `example/targets/banana.jl:33-83`
  * Funnel       — `example/targets/neal_funnel.jl:26-72` (+ analytic score)
  * Cross        — `example/targets/cross.jl:30-38`
  * WarpedGauss  — `example/targets/warped_gaussian.jl:25-87`

All `log_prob` implementations are pure jnp on ``(..., dim)`` arrays
(batched natively — no vmap needed), and all `sample` paths are exact
(transform-of-Gaussian / mixture), so these dual as ground-truth oracles for
the parity tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.pytree import Module, module, static_field
from .distributions import Distribution

__all__ = ["Banana", "Funnel", "Cross", "WarpedGauss", "GaussianMixture"]

_LOG_2PI = math.log(2.0 * math.pi)


@module
class Banana(Distribution):
    """Banana distribution of Roberts & Rosenthal (2009).

    N(0, diag(var, 1, …, 1)) pushed through the unit-Jacobian map
    ``ϕ(x) = (x₁, x₂ − b·x₁² + var·b, x₃, …)`` — formulas per reference
    `example/targets/banana.jl:53-83`. ``b`` is the curvature, ``var`` the
    first-dimension variance. Demo configs: Banana(2, 1, 10) "easy"
    (`demo_planar_flow.jl:16`), Banana(2, 1, 100) "hard"
    (`demo_RealNVP.jl:20`)."""

    dim: int = static_field()
    b: jax.Array = 1.0
    var: jax.Array = 10.0

    def __post_init__(self):
        if self.dim < 2:
            raise ValueError("Banana dim must be >= 2")

    @property
    def event_dim(self) -> int:
        return self.dim

    def _phi_inv(self, x):
        # reference banana.jl:57-60 (ϕ⁻¹): y₂ = x₂ + b x₁² − var·b
        y2 = x[..., 1] + self.b * jnp.square(x[..., 0]) - self.var * self.b
        return jnp.concatenate(
            [x[..., :1], y2[..., None], x[..., 2:]], axis=-1
        )

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.b, self.var, jnp.float32)
        z = jax.random.normal(key, tuple(sample_shape) + (self.dim,), dtype)
        z = z.at[..., 0].multiply(jnp.sqrt(self.var))
        # ϕ: x₂ ← x₂ − b x₁² + var·b   (banana.jl:52-55)
        y2 = z[..., 1] - self.b * jnp.square(z[..., 0]) + self.var * self.b
        return z.at[..., 1].set(y2)

    def log_prob(self, x):
        # banana.jl:77-83: -logZ - Σ (ϕ⁻¹x)²/diag(var,1..) / 2
        z = self._phi_inv(x)
        log_z = 0.5 * (self.dim * _LOG_2PI + jnp.log(self.var))
        quad = jnp.square(z[..., 0]) / self.var + jnp.sum(
            jnp.square(z[..., 1:]), axis=-1
        )
        return -log_z - 0.5 * quad

    def score(self, x):
        return jax.grad(lambda v: jnp.sum(self.log_prob(v)))(x)


@module
class Funnel(Distribution):
    """Neal's funnel: x₁ ~ N(μ, σ²), x_{2:d} | x₁ ~ N(0, exp(x₁) I).

    Reference `example/targets/neal_funnel.jl:26-72`; defaults (μ=0, σ=9)
    per `:41`; analytic score at `:63-72` (used by the Hamiltonian flow
    demo as a flow ingredient)."""

    dim: int = static_field()
    mu: jax.Array = 0.0
    sigma: jax.Array = 9.0

    def __post_init__(self):
        if self.dim < 2:
            raise ValueError("Funnel dim must be >= 2")

    @property
    def event_dim(self) -> int:
        return self.dim

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.mu, self.sigma, jnp.float32)
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape)
        x1 = self.mu + self.sigma * jax.random.normal(k1, shape + (1,), dtype)
        rest = jax.random.normal(k2, shape + (self.dim - 1,), dtype)
        rest = rest * jnp.exp(0.5 * x1)
        return jnp.concatenate([x1, rest], axis=-1)

    def log_prob(self, x):
        x1 = x[..., 0]
        rest = x[..., 1:]
        d1 = self.dim - 1
        lp1 = -0.5 * (
            jnp.square((x1 - self.mu) / self.sigma)
            + _LOG_2PI
        ) - jnp.log(self.sigma)
        # x_{2:d} | x1 ~ N(0, exp(x1) I): var = exp(x1) per dim
        lp2 = -0.5 * (
            jnp.sum(jnp.square(rest), axis=-1) * jnp.exp(-x1)
            + d1 * (x1 + _LOG_2PI)
        )
        return lp1 + lp2

    def score(self, x):
        """Analytic ∇ log p (neal_funnel.jl:63-72): with a = e^{−x₁},
        ∂₁ = (μ−x₁)/σ² − (d−1)/2 + a·Σx²/2; ∂ᵢ = −a·xᵢ."""
        x1 = x[..., 0]
        rest = x[..., 1:]
        a = jnp.exp(-x1)
        g1 = (
            (self.mu - x1) / jnp.square(self.sigma)
            - 0.5 * (self.dim - 1)
            + 0.5 * a * jnp.sum(jnp.square(rest), axis=-1)
        )
        grest = -a[..., None] * rest
        return jnp.concatenate([g1[..., None], grest], axis=-1)


@module
class GaussianMixture(Distribution):
    """Diagonal-covariance Gaussian mixture (MixtureModel equivalent).

    ``locs``: (k, d), ``scales``: (k, d), ``weights``: (k,)."""

    locs: jax.Array
    scales: jax.Array
    weights: jax.Array

    @property
    def event_dim(self) -> int:
        return self.locs.shape[-1]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape)
        k1, k2 = jax.random.split(key)
        comp = jax.random.categorical(
            k1, jnp.log(self.weights), shape=shape
        )
        eps = jax.random.normal(
            k2, shape + (self.event_dim,), dtype=self.locs.dtype
        )
        loc = self.locs[comp]
        scale = self.scales[comp]
        return loc + scale * eps

    def log_prob(self, x):
        # per-component diag-normal logpdf, then logsumexp over components
        z = (x[..., None, :] - self.locs) / self.scales  # (..., k, d)
        comp_lp = (
            -0.5 * jnp.sum(jnp.square(z), axis=-1)
            - jnp.sum(jnp.log(self.scales), axis=-1)
            - 0.5 * self.event_dim * _LOG_2PI
        )
        return jax.scipy.special.logsumexp(
            comp_lp + jnp.log(self.weights), axis=-1
        )

    def score(self, x):
        return jax.grad(lambda v: jnp.sum(self.log_prob(v)))(x)


def Cross(mu: float = 2.0, sigma: float = 0.15, dtype=jnp.float32) -> GaussianMixture:
    """Cross-shaped 4-component 2-D mixture.

    Matches the reference CODE at `example/targets/cross.jl:31-38`, whose
    component means are (0,μ), (−μ,1), (μ,1), (0,−μ) — note the reference's
    docstring says (±μ, 0) for the horizontal arms but its code uses
    ``one(μ)`` = 1 for the second coordinate; we reproduce the code's
    behavior for parity."""
    locs = jnp.asarray(
        [[0.0, mu], [-mu, 1.0], [mu, 1.0], [0.0, -mu]], dtype=dtype
    )
    scales = jnp.asarray(
        [[sigma, 1.0], [1.0, sigma], [1.0, sigma], [sigma, 1.0]], dtype=dtype
    )
    weights = jnp.full((4,), 0.25, dtype=dtype)
    return GaussianMixture(locs, scales, weights)


@module
class WarpedGauss(Distribution):
    """2-D warped (twisted) Gaussian — reference
    `example/targets/warped_gaussian.jl:25-87`.

    N(0, diag(σ₁², σ₂²)) pushed through the radius-dependent rotation
    ``ϕ(x) = (r cos(θ − r/2), r sin(θ − r/2))`` with r=‖x‖, θ=atan2(y,x);
    the inverse adds r/2 to θ and contributes log-Jacobian log(r)
    (warped_gaussian.jl:54-68)."""

    sigma1: jax.Array = 1.0
    sigma2: jax.Array = 0.12
    ref_compat: bool = static_field(default=False)

    @property
    def event_dim(self) -> int:
        return 2

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.sigma1, self.sigma2, jnp.float32)
        z = jax.random.normal(key, tuple(sample_shape) + (2,), dtype)
        z = z * jnp.stack([self.sigma1, self.sigma2]).astype(dtype)
        r = jnp.linalg.norm(z, axis=-1)
        theta = jnp.arctan2(z[..., 1], z[..., 0]) - 0.5 * r
        return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)

    def log_prob(self, x):
        # ϕ⁻¹ (warped_gaussian.jl:60-68): θ += r/2.
        #
        # NOTE — deliberate deviation: the reference adds logJ = log(r)
        # (`warped_gaussian.jl:66-68,85`), but the radius-dependent rotation
        # (r, θ) ↦ (r, θ − r/2) is AREA-PRESERVING (unit Jacobian in
        # Cartesian coordinates), so the density of the reference's own
        # sampler has NO log(r) term; with it, the "density" integrates to
        # E[r] ≈ 0.815, not 1 (verified numerically). The default here is
        # the correct, normalized density matching `sample`; construct with
        # ``ref_compat=True`` to reproduce the reference's unnormalized
        # log-density bit-for-bit (it only shifts the trained ELBO by a
        # constant-free reweighting toward large radii).
        r = jnp.linalg.norm(x, axis=-1)
        theta = jnp.arctan2(x[..., 1], x[..., 0]) + 0.5 * r
        zx = r * jnp.cos(theta)
        zy = r * jnp.sin(theta)
        quad = jnp.square(zx / self.sigma1) + jnp.square(zy / self.sigma2)
        lp = (
            -0.5 * quad
            - _LOG_2PI
            - jnp.log(self.sigma1)
            - jnp.log(self.sigma2)
        )
        if self.ref_compat:
            lp = lp + jnp.log(r)
        return lp

    def score(self, x):
        return jax.grad(lambda v: jnp.sum(self.log_prob(v)))(x)
