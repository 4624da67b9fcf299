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

    def partition(self, x: jax.Array):
        """Split (..., dim) into (x_A, x_B, x_C)."""
        ia = jnp.asarray(self.idx_a, dtype=jnp.int32)
        ib = jnp.asarray(self.idx_b, dtype=jnp.int32)
        x_c = (
            x[..., jnp.asarray(self.idx_c, dtype=jnp.int32)]
            if self.idx_c
            else x[..., :0]
        )
        return x[..., ia], x[..., ib], x_c

    def combine(self, x_a: jax.Array, x_b: jax.Array, x_c: jax.Array):
        """Scatter parts back into a (..., dim) array."""
        shape = x_a.shape[:-1] + (self.dim,)
        out = jnp.zeros(shape, dtype=x_a.dtype)
        out = out.at[..., jnp.asarray(self.idx_a, dtype=jnp.int32)].set(x_a)
        out = out.at[..., jnp.asarray(self.idx_b, dtype=jnp.int32)].set(x_b)
        if self.idx_c:
            out = out.at[..., jnp.asarray(self.idx_c, dtype=jnp.int32)].set(x_c)
        return out
