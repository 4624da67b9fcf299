"""Multi-host startup and cross-host conventions.

The reference is strictly single-process (SURVEY §2c). On TPU pods the same
SPMD program runs on every host: `initialize()` wires up the JAX distributed
runtime (`jax.distributed.initialize` reads the TPU metadata automatically
on Cloud TPU; explicit args cover other launchers), after which
`jax.devices()` spans the whole slice and the 1-D batch mesh from
`parallel.mesh` covers all chips — gradient psum and the ELBO mean ride ICI
within a slice and DCN across slices with no further code changes.

Reproducibility contract: per-shard PRNG streams are derived by
`fold_in(key, global_shard_index)` (`parallel/sharded.py`), so an N-host run
is statistically equivalent to a 1-host run with N× the Monte-Carlo batch —
not bitwise, since sample partitioning differs (SURVEY §7 hard-part #5).
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "is_multi_host", "host_count", "host_index"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent, safe on 1 host).

    On Cloud TPU all arguments are auto-detected; pass them explicitly for
    custom launchers (e.g. SLURM or bare-metal multi-NIC hosts)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def is_multi_host() -> bool:
    return jax.process_count() > 1


def host_count() -> int:
    return jax.process_count()


def host_index() -> int:
    return jax.process_index()
