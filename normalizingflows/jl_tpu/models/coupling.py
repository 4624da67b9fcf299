"""RealNVP affine-coupling flow.

Re-design of reference `src/flows/realnvp.jl`:
  * `AffineCoupling` (`realnvp.jl:33-110`): y_A = x_A ⊙ exp(s(x_B)) + t(x_B),
    log|det J| = Σ s(x_B); analytic inverse x_A = (y_A − t(y_B)) ⊙ exp(−s(y_B)).
    The log-scale net `s` ends in tanh BEFORE exponentiation for stability
    (`realnvp.jl:49-52`).
  * `RealNVP_layer` (`realnvp.jl:132-145`): two couplings with complementary
    even/odd alternating masks.
  * `realnvp` (`realnvp.jl:170-192`): stack of layers; defaults hdims=[32,32],
    nlayers=10 per Agrawal–Sheldon–Domke 2020 App. E.

All methods are natively batched over ``(..., dim)``; a single compiled
program serves the vector and matrix call sites that the reference implements
twice (`realnvp.jl:57-83`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import coupling_pallas
from ..ops.masks import PartitionMask
from ..utils.pytree import module, static_field
from .bijector import Bijector, Chain, stack_bijectors
from .distributions import DiagNormal, Distribution, TransformedDistribution
from .flows import create_flow
from .nets import MLP, fnn

__all__ = ["AffineCoupling", "FusedRealNVP", "RealNVP_layer", "realnvp"]


@module
class AffineCoupling(Bijector):
    """Affine coupling layer (Dinh et al. 2017, RealNVP)."""

    __trainable__ = ("s", "t")  # mirrors `@functor AffineCoupling (s, t)`,
    # reference `src/flows/realnvp.jl:40`

    s: MLP  # log-scale conditioner (tanh-bounded output)
    t: MLP  # shift conditioner
    mask: PartitionMask = static_field()

    @staticmethod
    def make(
        key: jax.Array,
        dim: int,
        hdims: Sequence[int],
        mask_idx: Sequence[int],
        dtype=jnp.float32,
        compute_dtype=None,
    ) -> "AffineCoupling":
        """Constructor per reference `realnvp.jl:45-54`: conditioners map the
        complement (size dim−|A|) to the transformed set (size |A|); `s` gets
        a tanh output activation. ``compute_dtype`` sets the conditioner
        matmul precision policy (see `nets.Dense`)."""
        mask = PartitionMask.make(dim, mask_idx)
        c = mask.n_transformed
        ks, kt = jax.random.split(key)
        s = fnn(ks, dim - c, hdims, c, output_activation=jnp.tanh,
                dtype=dtype, compute_dtype=compute_dtype)
        t = fnn(kt, dim - c, hdims, c, dtype=dtype,
                compute_dtype=compute_dtype)
        return AffineCoupling(s, t, mask)

    def forward_and_log_det(self, x):
        x_a, x_b, x_c = self.mask.partition(x)
        log_s = self.s(x_b)
        y_a = x_a * jnp.exp(log_s) + self.t(x_b)
        log_det = jnp.sum(log_s, axis=-1)
        return self.mask.combine(y_a, x_b, x_c), log_det

    def inverse_and_log_det(self, y):
        y_a, y_b, y_c = self.mask.partition(y)
        log_s = self.s(y_b)
        x_a = (y_a - self.t(y_b)) * jnp.exp(-log_s)
        log_det = -jnp.sum(log_s, axis=-1)
        return self.mask.combine(x_a, y_b, y_c), log_det


def RealNVP_layer(
    key: jax.Array, dim: int, hdims: Sequence[int], dtype=jnp.float32,
    compute_dtype=None,
) -> list[AffineCoupling]:
    """One RealNVP block: two couplings with complementary alternating masks
    (reference `realnvp.jl:132-145`, masks `1:2:d` and `2:2:d`)."""
    k1, k2 = jax.random.split(key)
    c1 = AffineCoupling.make(k1, dim, hdims, range(0, dim, 2), dtype,
                             compute_dtype)
    c2 = AffineCoupling.make(k2, dim, hdims, range(1, dim, 2), dtype,
                             compute_dtype)
    return [c1, c2]


@module
class FusedRealNVP(Bijector):
    """Whole-stack RealNVP applied by the fused Pallas kernel
    (`ops/coupling_pallas.py`): all blocks execute in one kernel with
    activations VMEM-resident. Mathematically identical to
    `Repeated(Chain([AffineCoupling_even, AffineCoupling_odd]))` — the
    equivalence is pinned in tests/test_coupling_kernel.py."""

    groups: dict  # {'even'|'odd': {'s'|'t': ((W, b), ...)}} stacked arrays
    idx_even: tuple = static_field()
    idx_odd: tuple = static_field()
    interpret: bool = static_field(default=False)

    @staticmethod
    def from_blocks(blocks, interpret: bool = False) -> "FusedRealNVP":
        """Build from a list of `[c_even, c_odd]` AffineCoupling pairs (as
        produced by `RealNVP_layer`), stacking weights across blocks."""

        def mlp_params(mlp: MLP):
            return tuple((l.W, l.b) for l in mlp.layers)

        def stack_group(pick):
            per_block = [pick(b) for b in blocks]
            return jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *per_block
            )

        groups = {
            "even": {
                "s": stack_group(lambda b: mlp_params(b[0].s)),
                "t": stack_group(lambda b: mlp_params(b[0].t)),
            },
            "odd": {
                "s": stack_group(lambda b: mlp_params(b[1].s)),
                "t": stack_group(lambda b: mlp_params(b[1].t)),
            },
        }
        return FusedRealNVP(
            groups, blocks[0][0].mask.idx_a, blocks[0][1].mask.idx_a,
            interpret,
        )

    def forward_and_log_det(self, x):
        return coupling_pallas.coupling_stack_fused(
            x, self.groups, self.idx_even, self.idx_odd,
            inverse=False, interpret=self.interpret,
        )

    def inverse_and_log_det(self, y):
        return coupling_pallas.coupling_stack_fused(
            y, self.groups, self.idx_even, self.idx_odd,
            inverse=True, interpret=self.interpret,
        )


def realnvp(
    key: jax.Array,
    q0: Distribution | int,
    hdims: Sequence[int] = (32, 32),
    nlayers: int = 10,
    dtype=jnp.float32,
    scan: bool = True,
    fused: bool = False,
    interpret: bool = False,
    compute_dtype=None,
    remat: bool = False,
) -> TransformedDistribution:
    """RealNVP flow (reference `realnvp.jl:170-192`); ``q0`` may be a base
    distribution or an int dim (→ standard DiagNormal base). Defaults
    hdims=[32,32], nlayers=10.

    ``scan=True`` (default) stacks the blocks into a `Repeated` scan so
    compile time is depth-independent; ``scan=False`` lays them out as a
    flat `Chain` (same math, per-layer call sites). ``fused=True`` runs the
    whole stack through the single fused Pallas kernel instead
    (`FusedRealNVP`; TPU, or anywhere with ``interpret=True``). Measured
    on a real v5e (benchmarks/kernels.py, recorded in
    benchmarks/KERNELS.md): the fused kernel wins the forward/sampling
    path at small dims (2.1× at d=2/L=3, batch 4096) where per-layer HBM
    round-trips dominate; for TRAINING, XLA's autodiff of the module path
    is faster at every size measured (the hand-written backward must run
    full-f32 matmuls and is VMEM-capped on wide flows) — keep the default
    ``fused=False`` for training."""
    if isinstance(q0, int):
        q0 = DiagNormal.standard(q0, dtype)
    dim = q0.event_dim
    pairs = [
        RealNVP_layer(k, dim, hdims, dtype, compute_dtype)
        for k in jax.random.split(key, nlayers)
    ]
    if fused:
        return create_flow(
            [FusedRealNVP.from_blocks(pairs, interpret=interpret)], q0
        )
    blocks = [Chain(p) for p in pairs]
    if scan and nlayers > 1:
        # remat=True: recompute block activations in the backward pass
        # (wide-flow HBM-residual trade; see bijector.Repeated.remat)
        return create_flow([stack_bijectors(blocks, remat=remat)], q0)
    return create_flow(blocks, q0)
