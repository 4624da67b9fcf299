"""Static partition masks for coupling layers.

Replaces Bijectors.jl's `PartitionMask` / `partition` / `combine`
(consumed at reference `src/flows/realnvp.jl:57-63` and
`src/flows/neuralspline.jl:102-108`). Index sets are STATIC tuples (pytree
aux data), so under jit every partition/combine lowers to fixed gathers /
scatters that XLA folds into cheap lane shuffles — no dynamic indexing.

Set naming follows Bijectors: A = transformed dims, B = dims fed to the
conditioner, C = passthrough dims (empty for the standard coupling masks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import Module, module, static_field

__all__ = ["PartitionMask"]


def _as_strided(idx: tuple[int, ...], dim: int):
    """If ``idx`` equals ``range(start, dim, step)`` return ``(start, step)``
    (a static strided slice — on TPU a lane shuffle XLA fuses into
    neighboring elementwise work, vs a general gather which materializes).
    Decided at trace time from static aux data; None → gather fallback."""
    if not idx:
        return None
    start = idx[0]
    if len(idx) == 1:
        # any step > dim-1-start reproduces the single element; prefer 2 so
        # the d=2 alternating masks keep the riffle-combine fast path
        if start >= dim:
            return None
        step = 2 if start + 2 >= dim else dim - start
        return start, step
    step = idx[1] - idx[0]
    if step > 0 and idx == tuple(range(start, dim, step)):
        return start, step
    return None


def interleave(first: jax.Array, second: jax.Array, dim: int) -> jax.Array:
    """Riffle two last-axis arrays: out[..., 0::2] = first,
    out[..., 1::2] = second. ``dim`` may be odd (first one longer); lowers
    to stack+reshape — no scatter."""
    n1, n2 = first.shape[-1], second.shape[-1]
    if n2 < n1:  # odd dim: pad the shorter stream, slice the tail off
        pad = [(0, 0)] * (second.ndim - 1) + [(0, n1 - n2)]
        second = jnp.pad(second, pad)
    out = jnp.stack([first, second], axis=-1)
    return out.reshape(*first.shape[:-1], 2 * n1)[..., :dim]


@module
class PartitionMask(Module):
    dim: int = static_field()
    idx_a: tuple[int, ...] = static_field()  # transformed
    idx_b: tuple[int, ...] = static_field()  # conditioner input
    idx_c: tuple[int, ...] = static_field(default=())  # passthrough

    @staticmethod
    def make(dim: int, idx_a) -> "PartitionMask":
        """PartitionMask(dim, A) with B = complement, C = ∅ — matches
        `Bijectors.PartitionMask(dim, idx)` as used at
        reference `src/flows/realnvp.jl:49`."""
        idx_a = tuple(int(i) for i in idx_a)
        in_a = set(idx_a)
        idx_b = tuple(i for i in range(dim) if i not in in_a)
        return PartitionMask(dim, idx_a, idx_b, ())

    @staticmethod
    def alternating(dim: int, parity: int) -> "PartitionMask":
        """Even (parity=0) or odd (parity=1) strided mask — the reference's
        `1:2:d` / `2:2:d` pair (`src/flows/realnvp.jl:139-140`), 0-based."""
        return PartitionMask.make(dim, range(parity, dim, 2))

    @property
    def n_transformed(self) -> int:
        return len(self.idx_a)

    @property
    def n_conditioned(self) -> int:
        return len(self.idx_b)

    def _take(self, x: jax.Array, idx: tuple[int, ...]):
        """Select static last-axis indices, preferring a strided slice over
        a gather (VERDICT r3 item 2: even/odd masks at d=128 are static
        slices — gathers were a measured non-matmul overhead in the wide
        train step)."""
        if not idx:
            return x[..., :0]
        s = _as_strided(idx, self.dim)
        if s is not None:
            start, step = s
            return x[..., start::step]
        return x[..., jnp.asarray(idx, dtype=jnp.int32)]

    def partition(self, x: jax.Array):
        """Split (..., dim) into (x_A, x_B, x_C)."""
        return (
            self._take(x, self.idx_a),
            self._take(x, self.idx_b),
            self._take(x, self.idx_c),
        )

    def combine(self, x_a: jax.Array, x_b: jax.Array, x_c: jax.Array):
        """Reassemble a (..., dim) array from parts. The standard
        alternating even/odd pair lowers to a riffle (stack+reshape); other
        index sets fall back to a scatter."""
        sa = _as_strided(self.idx_a, self.dim)
        sb = _as_strided(self.idx_b, self.dim)
        if (not self.idx_c and sa is not None and sb is not None
                and sa[1] == 2 and sb[1] == 2 and {sa[0], sb[0]} == {0, 1}):
            first, second = (x_a, x_b) if sa[0] == 0 else (x_b, x_a)
            return interleave(first, second, self.dim)
        shape = x_a.shape[:-1] + (self.dim,)
        out = jnp.zeros(shape, dtype=x_a.dtype)
        out = out.at[..., jnp.asarray(self.idx_a, dtype=jnp.int32)].set(x_a)
        out = out.at[..., jnp.asarray(self.idx_b, dtype=jnp.int32)].set(x_b)
        if self.idx_c:
            out = out.at[..., jnp.asarray(self.idx_c, dtype=jnp.int32)].set(x_c)
        return out
