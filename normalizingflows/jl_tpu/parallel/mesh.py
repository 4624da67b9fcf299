"""Device mesh construction for data-parallel ELBO training.

The reference has NO multi-device parallelism (SURVEY §2c — its only device
awareness is single-GPU array offload in `ext/NormalizingFlowsCUDAExt.jl`).
The natural distributed design for this workload is a single 1-D mesh over
the Monte-Carlo sample batch: the ELBO is a mean of i.i.d. per-sample terms
(`src/objectives/elbo.jl:27-33,89-92`) and flow parameters are tiny (KB),
so parameters replicate and only two collectives exist — the ELBO mean and
the gradient psum — both riding ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["batch_mesh", "batch_sharding", "replicated_sharding", "BATCH_AXIS"]

BATCH_AXIS = "batch"


def batch_mesh(
    n_devices: int | None = None, devices=None
) -> Mesh:
    """1-D mesh with axis name 'batch' over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (batch, dim) sample block: rows over the batch axis."""
    return NamedSharding(mesh, P(BATCH_AXIS, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
