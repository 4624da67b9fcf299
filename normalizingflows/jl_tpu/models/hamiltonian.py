"""Hamiltonian flow: leapfrog bijector + momentum normalization.

Re-design of the reference's demo-level Hamiltonian flow
(`example/demo_hamiltonian_flow.jl:27-147`, after Chen, Xu & Campbell,
"Bayesian inference via sparse Hamiltonian flows", NeurIPS 2022):

  * The flow lives on the JOINT space z = [x, ρ] ∈ ℝ^{2d} and targets
    π(x, ρ) = π(x)·N(ρ; 0, I) (`demo_hamiltonian_flow.jl:117-124`).
  * `LeapFrog`: L leapfrog steps with trainable per-dimension step size
    ϵ = exp(logϵ) (`:27-61`); the inverse negates ϵ (`:74-82`);
    log|det J| ≡ 0 because leapfrog is symplectic (`:84-91`).
  * The target's score ∇log π is an ingredient of the transform itself —
    differentiating the ELBO therefore takes second-order AD of the target
    (`:128`; free in JAX via `jax.grad` composition).
  * `momentum_normalization_layer`: affine Shift∘Scale applied to the
    momentum half only (`:93-99`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.pytree import module, static_field
from .bijector import (
    Bijector,
    Chain,
    Identity,
    Scale,
    Shift,
    Stacked,
    _zero_log_det,
    stack_bijectors,
)
from .distributions import (
    DiagNormal,
    Distribution,
    TransformedDistribution,
)
from .flows import create_flow

__all__ = [
    "LeapFrog",
    "momentum_normalization_layer",
    "hamiltonian_flow",
    "joint_logp",
]


@module
class LeapFrog(Bijector):
    """L leapfrog steps on z = [x, ρ] with trainable per-dim log step size."""

    __trainable__ = ("log_eps",)  # `@functor LeapFrog (logϵ,)`,
    # reference `demo_hamiltonian_flow.jl:38`

    log_eps: jax.Array  # (dim,)
    dim: int = static_field()
    L: int = static_field()
    score_fn: Callable = static_field()  # ∇log π on (..., dim)

    @staticmethod
    def make(
        dim: int,
        log_eps0: float,
        L: int,
        score_fn: Callable,
        dtype=jnp.float32,
    ) -> "LeapFrog":
        """`LeapFrog(dim, logϵ, L, ∇logp)` (`demo_hamiltonian_flow.jl:40-43`):
        logϵ is broadcast to a per-dimension vector."""
        return LeapFrog(
            jnp.full((dim,), log_eps0, dtype=dtype), dim, L, score_fn
        )

    def _steps(self, x, v, eps):
        """The integrator at `demo_hamiltonian_flow.jl:50-61`:
        v += ϵ/2·∇logp(x); (L−1)×[x += ϵ·v; v += ϵ·∇logp(x)];
        x += ϵ·v; v += ϵ/2·∇logp(x)."""
        g = self.score_fn
        v = v + 0.5 * eps * g(x)
        for _ in range(self.L - 1):
            x = x + eps * v
            v = v + eps * g(x)
        x = x + eps * v
        v = v + 0.5 * eps * g(x)
        return x, v

    def forward_and_log_det(self, z):
        d = self.dim
        x, v = z[..., :d], z[..., d:]
        x, v = self._steps(x, v, jnp.exp(self.log_eps))
        out = jnp.concatenate([x, v], axis=-1)
        return out, _zero_log_det(z)  # symplectic

    def inverse_and_log_det(self, z):
        d = self.dim
        x, v = z[..., :d], z[..., d:]
        x, v = self._steps(x, v, -jnp.exp(self.log_eps))
        out = jnp.concatenate([x, v], axis=-1)
        return out, _zero_log_det(z)


def momentum_normalization_layer(dim: int, dtype=jnp.float32) -> Stacked:
    """Identity on position, Scale-then-Shift on momentum
    (`demo_hamiltonian_flow.jl:93-99`; init shift=0, scale=1)."""
    affine = Chain(
        (Scale(jnp.ones((dim,), dtype)), Shift(jnp.zeros((dim,), dtype)))
    )
    return Stacked((Identity(), affine), [(0, dim), (dim, 2 * dim)])


def joint_logp(logp: Callable, dim: int) -> Callable:
    """Lift a target log-density to the joint (x, ρ) space:
    log π(x) + log N(ρ; 0, I) (`demo_hamiltonian_flow.jl:117-124`)."""
    import math

    log_2pi = math.log(2.0 * math.pi)

    def lp(z):
        x, rho = z[..., :dim], z[..., dim:]
        lp_rho = -0.5 * jnp.sum(jnp.square(rho), axis=-1) - 0.5 * dim * log_2pi
        return logp(x) + lp_rho

    return lp


def hamiltonian_flow(
    dim: int,
    score_fn: Callable,
    n_blocks: int = 15,
    L: int = 3,
    eps0: float = 0.05,
    dtype=jnp.float32,
    scan: bool = True,
) -> TransformedDistribution:
    """Full Hamiltonian flow on the joint space, replicating the demo build
    (`demo_hamiltonian_flow.jl:139-147`): a trainable mean-field affine
    (Scale then Shift) on the 2d joint base N(0, I_{2d}), then `n_blocks`
    of [LeapFrog(L, ϵ₀) → momentum normalization], composed via a
    depth-independent `Repeated` scan when ``scan=True``."""
    base = DiagNormal.standard(2 * dim, dtype)
    layers: list[Bijector] = [
        Scale(jnp.ones((2 * dim,), dtype)),
        Shift(jnp.zeros((2 * dim,), dtype)),
    ]
    import math

    log_eps0 = math.log(eps0)  # host-side: traceable under jit-construction
    blocks = [
        Chain((
            LeapFrog.make(dim, log_eps0, L, score_fn, dtype),
            momentum_normalization_layer(dim, dtype),
        ))
        for _ in range(n_blocks)
    ]
    if scan and n_blocks > 1:
        layers.append(stack_bijectors(blocks))
    else:
        layers.extend(blocks)
    return create_flow(layers, base)
