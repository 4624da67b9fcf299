"""VI quality diagnostics: error bars, normalizing-constant bounds, ESS.

The reference trains flows but offers no way to judge the RESULT beyond
eyeballing loss curves and scatter plots (`example/utils.jl`). These are
the standard importance-sampling diagnostics for a trained flow q against
an unnormalized target density log p̃ — new capability, no reference
counterpart. All estimators are jit-compatible batched passes (one flow
traversal per call) and all return plain scalars.

Math recap: with draws y ~ q and log-weights log w = log p̃(y) − log q(y),
  * ELBO = E_q[log w]            (lower-bounds log Z; gap = KL(q‖p))
  * log Ẑ = logsumexp(log w) − log n   (consistent estimator of log Z,
    and in expectation a bound tighter than the ELBO — IWAE with K=n)
  * ESS  = (Σ w̃)² / Σ w̃²  ∈ (0, n]  (effective number of independent
    target draws the n weighted flow samples are worth; ESS/n → 1 iff
    q ≡ p on the support)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .models.distributions import TransformedDistribution
from .objectives import _elbo_terms

__all__ = [
    "FlowDiagnostics",
    "elbo_with_sem",
    "ess",
    "evaluate_flow",
    "grid_total_variation",
    "log_normalizer",
    "log_weights",
    "sliced_wasserstein2",
]

LogDensity = Callable[[jax.Array], jax.Array]


def log_weights(
    key: jax.Array,
    flow: TransformedDistribution,
    logp: LogDensity,
    n_samples: int,
) -> jax.Array:
    """Per-sample importance log-weights ``log p̃(T(x)) − log q(T(x))``.

    Computed on the forward path (base draw → transform → logdet), so no
    inverse is needed: ``log q(T(x)) = log q₀(x) − logdet`` exactly.
    """
    xs = flow.base.sample(key, (n_samples,))
    return _elbo_terms(flow, logp, xs)


def elbo_with_sem(
    key: jax.Array,
    flow: TransformedDistribution,
    logp: LogDensity,
    n_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """ELBO Monte-Carlo estimate and its standard error (SEM).

    The reference reports bare ELBO values; the funnel target showed why
    error bars matter (heavy-tailed estimator — benchmarks/PARITY.md).
    """
    lw = log_weights(key, flow, logp, n_samples)
    sem = jnp.std(lw, ddof=1) / jnp.sqrt(jnp.asarray(n_samples, lw.dtype))
    return jnp.mean(lw), sem


def log_normalizer(
    key: jax.Array,
    flow: TransformedDistribution,
    logp: LogDensity,
    n_samples: int,
) -> jax.Array:
    """Importance-sampling estimate of ``log Z`` of the unnormalized target:
    ``logsumexp(log w) − log n``. For a normalized target this → 0 as q → p
    (useful as a convergence check with a known ground truth)."""
    lw = log_weights(key, flow, logp, n_samples)
    n = jnp.asarray(n_samples, lw.dtype)
    return jax.scipy.special.logsumexp(lw) - jnp.log(n)


def ess(
    key: jax.Array,
    flow: TransformedDistribution,
    logp: LogDensity,
    n_samples: int,
    normalize: bool = True,
) -> jax.Array:
    """Effective sample size of self-normalized importance weights
    (Kong 1992): ``(Σw)²/Σw²``. With ``normalize=True`` returns ESS/n in
    (0, 1]. Computed in log-space for stability."""
    lw = log_weights(key, flow, logp, n_samples)
    lse1 = jax.scipy.special.logsumexp(lw)
    lse2 = jax.scipy.special.logsumexp(2.0 * lw)
    out = jnp.exp(2.0 * lse1 - lse2)
    if normalize:
        out = out / n_samples
    return out


class FlowDiagnostics(NamedTuple):
    elbo: jax.Array
    elbo_sem: jax.Array
    log_normalizer: jax.Array
    ess: jax.Array           # normalized, in (0, 1]
    n_samples: int


def evaluate_flow(
    key: jax.Array,
    flow: TransformedDistribution,
    logp: LogDensity,
    n_samples: int = 4096,
) -> FlowDiagnostics:
    """One-call quality report for a trained flow (single batched forward
    pass; jit-compatible). ESS/n near 1 and log Ẑ near the known log Z
    (0 for normalized targets) indicate a good fit; ELBO ± SEM gives the
    bound with error bars."""
    lw = log_weights(key, flow, logp, n_samples)
    n = jnp.asarray(n_samples, lw.dtype)
    sem = jnp.std(lw, ddof=1) / jnp.sqrt(n)
    lse1 = jax.scipy.special.logsumexp(lw)
    lse2 = jax.scipy.special.logsumexp(2.0 * lw)
    return FlowDiagnostics(
        elbo=jnp.mean(lw),
        elbo_sem=sem,
        log_normalizer=lse1 - jnp.log(n),
        ess=jnp.exp(2.0 * lse1 - lse2) / n,
        n_samples=n_samples,
    )


def sliced_wasserstein2(
    key: jax.Array,
    xs: jax.Array,
    ys: jax.Array,
    n_projections: int = 128,
) -> jax.Array:
    """Sliced 2-Wasserstein distance between two sample sets.

    SW₂² = E_θ[ W₂²(θᵀxs, θᵀys) ] over uniform unit directions θ; each 1-D
    W₂ is the L2 distance of sorted projections (exact for equal sample
    counts). A distribution-level parity metric: unlike per-coordinate
    mean/std it detects shape mismatch (a flow hugging one banana arm vs
    the full target), and unlike grid TV it scales past 2-D. Units of the
    data. One jit-compatible batched pass: (n_proj, n) sorts on device.
    """
    if xs.shape != ys.shape:
        raise ValueError(f"sample sets must match: {xs.shape} vs {ys.shape}")
    dim = xs.shape[-1]
    theta = jax.random.normal(key, (n_projections, dim), xs.dtype)
    theta = theta / jnp.linalg.norm(theta, axis=-1, keepdims=True)
    px = jnp.sort(xs @ theta.T, axis=0)   # (n, n_proj)
    py = jnp.sort(ys @ theta.T, axis=0)
    return jnp.sqrt(jnp.mean(jnp.square(px - py)))


def grid_total_variation(
    xs: jax.Array,
    ys: jax.Array,
    bins: int = 64,
    lims: tuple | None = None,
) -> jax.Array:
    """Total-variation distance between 2-D histograms of two sample sets:
    ``0.5 · Σ|p̂ − q̂|`` on a ``bins×bins`` grid covering ``lims``
    (default: the joint sample bounding box). In [0, 1]; its MC floor for
    identical distributions is O(√(bins²/n)) — report alongside n."""
    if xs.shape[-1] != 2 or ys.shape[-1] != 2:
        raise ValueError("grid_total_variation is 2-D only")
    both = jnp.concatenate([xs, ys], axis=0)
    if lims is None:
        lo = jnp.min(both, axis=0)
        hi = jnp.max(both, axis=0)
    else:
        lo = jnp.asarray([lims[0], lims[2]], xs.dtype)
        hi = jnp.asarray([lims[1], lims[3]], xs.dtype)

    def hist(s):
        ij = jnp.clip(
            ((s - lo) / (hi - lo + 1e-12) * bins).astype(jnp.int32),
            0, bins - 1,
        )
        flat = ij[:, 0] * bins + ij[:, 1]
        h = jnp.zeros((bins * bins,), xs.dtype).at[flat].add(1.0)
        return h / s.shape[0]

    return 0.5 * jnp.sum(jnp.abs(hist(xs) - hist(ys)))
