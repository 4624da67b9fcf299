"""Flow composition DSL.

Reference `create_flow(Ls, q0) = transformed(q0, reduce(∘, Ls))`
(`src/flows/utils.jl:23-26`). The reference's `reduce(∘, ...)` applies the
LAST layer first — a documented footgun (`src/flows/utils.jl:10-12`). Here
the order is explicit and first-to-last: ``create_flow([l1, l2], q0)``
applies ``l1`` first in the sampling direction.
"""

from __future__ import annotations

from typing import Sequence

from .bijector import Bijector, Chain
from .distributions import Distribution, TransformedDistribution

__all__ = ["create_flow"]


def create_flow(
    layers: Sequence[Bijector], q0: Distribution
) -> TransformedDistribution:
    """Compose ``layers`` (applied first-to-last) on base distribution ``q0``."""
    return TransformedDistribution(q0, Chain(tuple(layers)))
