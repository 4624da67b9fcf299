"""RETIRED (archive path): the `FusedRealNVP` bijector and the whole-run
`train_realnvp_fused` trainer — the module-level entry points for the two
archived Pallas kernels (see this subpackage's __init__ docstring and
benchmarks/KERNELS.md for the measured negative results).

Moved out of `models/coupling.py` / `train.py` (VERDICT r4 item 7) so the
default `import normalizingflows` never loads the 837 lines of retired
kernel code; `realnvp(..., fused=True)` imports this module lazily.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bijector import Bijector
from ..models.distributions import DiagNormal, TransformedDistribution
from ..models.nets import MLP
from ..train import TrainResult, TrainState
from ..utils.pytree import module, static_field
from . import coupling_pallas

__all__ = ["FusedRealNVP", "train_realnvp_fused"]


@module
class FusedRealNVP(Bijector):
    """Whole-stack RealNVP applied by the fused Pallas kernel
    (`experimental/coupling_pallas.py`): all blocks execute in one kernel
    with activations VMEM-resident. Mathematically identical to
    `Repeated(Chain([AffineCoupling_even, AffineCoupling_odd]))` — the
    equivalence is pinned in tests/test_coupling_kernel.py (-m archive)."""

    groups: dict  # {'even'|'odd': {'s'|'t': ((W, b), ...)}} stacked arrays
    idx_even: tuple = static_field()
    idx_odd: tuple = static_field()
    interpret: bool = static_field(default=False)
    # bf16-operand/f32-accum policy for the in-kernel conditioner matmuls
    # (fwd AND hand-written backward); selection matmuls stay exact
    compute_dtype: object = static_field(default=None)

    @staticmethod
    def from_blocks(blocks, interpret: bool = False,
                    compute_dtype=None) -> "FusedRealNVP":
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
            interpret, compute_dtype,
        )

    def forward_and_log_det(self, x):
        return coupling_pallas.coupling_stack_fused(
            x, self.groups, self.idx_even, self.idx_odd,
            inverse=False, interpret=self.interpret,
            compute_dtype=self.compute_dtype,
        )

    def inverse_and_log_det(self, y):
        return coupling_pallas.coupling_stack_fused(
            y, self.groups, self.idx_even, self.idx_odd,
            inverse=True, interpret=self.interpret,
            compute_dtype=self.compute_dtype,
        )


def train_realnvp_fused(
    key: jax.Array,
    flow: TransformedDistribution,
    logp: Callable[[jax.Array], jax.Array],
    n_samples: int,
    max_iters: int = 1_000,
    learning_rate: float = 5e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
) -> TrainResult:
    """ELBO-train a fused RealNVP flow with the WHOLE-RUN Pallas kernel.

    One kernel launch per 512-step chunk executes the Adam scan on-chip
    (`experimental/train_pallas.py`): weights and Adam moments stay
    VMEM-resident, each step's presampled base draws stream in, per-step
    losses stream out. Same math as ``train_flow(key, elbo_batch, flow,
    logp, n_samples)`` with ``optax.adam(learning_rate)`` — pinned in
    tests/test_train_kernel.py (-m archive).

    NOTE — measured to be ~180x SLOWER than `train_flow` on real TPU
    (benchmarks/KERNELS.md "Whole-run train kernel"): `lax.scan` already
    compiles the whole loop into one executable, so there is no per-step
    dispatch for the kernel to eliminate, and the Mosaic grid serializes
    on SMEM scalar stores and tiny non-MXU-shaped matmuls. Prefer
    `train_flow`; this entry point exists as a correctness-tested
    experiment in on-chip full-loop fusion.

    Requirements: ``flow`` built with ``realnvp(..., fused=True)``,
    a `DiagNormal` base, and ``logp`` jnp-traceable with Python-scalar
    closure constants (Mosaic cannot lower captured constant arrays;
    shape-() array fields of the built-in targets are fine).
    """
    from .train_pallas import adam_train_realnvp_fused

    bijectors = getattr(flow.bijector, "bijectors", (flow.bijector,))
    if len(bijectors) != 1 or not isinstance(bijectors[0], FusedRealNVP):
        raise ValueError(
            "train_realnvp_fused requires a flow built with "
            "realnvp(..., fused=True); got " + type(flow.bijector).__name__
        )
    if not isinstance(flow.base, DiagNormal):
        raise ValueError("train_realnvp_fused requires a DiagNormal base")
    fb = bijectors[0]

    xs = flow.base.sample(key, (max_iters, n_samples))
    groups, losses = adam_train_realnvp_fused(
        xs, fb.groups, fb.idx_even, fb.idx_odd, logp,
        flow.base.loc, flow.base.scale, learning_rate,
        b1=b1, b2=b2, eps=eps, interpret=interpret or fb.interpret,
    )
    fb_new = FusedRealNVP(groups, fb.idx_even, fb.idx_odd, fb.interpret)
    if hasattr(flow.bijector, "bijectors"):  # Chain wrapper from create_flow
        bij_new = type(flow.bijector)((fb_new,))
    else:
        bij_new = fb_new
    flow_new = TransformedDistribution(flow.base, bij_new)
    stats = {
        "iteration": np.arange(1, max_iters + 1),
        "loss": np.asarray(losses),
    }
    return TrainResult(flow_new, stats, TrainState(flow_new, None, max_iters))
