"""Checkpoint / resume for flows and optimizer state.

The reference has NO on-disk serialization — only in-memory resume via the
returned `(θ, opt_stats, st)` tuple (`src/optimize.jl:106-107`, SURVEY §5).
This module adds durable checkpointing as a genuine capability: the array
leaves of any pytree (flow, TrainState, opt state) are saved to a single
`.npz` (default) or an Orbax checkpoint directory (``backend="orbax"`` —
distributed-array aware, the right choice on multi-host pods); the treedef
is recovered from a template on load.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_train_state", "load_train_state"]


def _leaf_dict(tree: Any) -> dict:
    return {
        f"leaf_{i}": leaf
        for i, leaf in enumerate(jax.tree_util.tree_leaves(tree))
    }


def save_pytree(path: str, tree: Any, backend: str = "npz") -> None:
    """Save all array leaves of ``tree`` to ``path``.

    ``backend="npz"``: single file, host-gathered numpy arrays.
    ``backend="orbax"``: Orbax StandardCheckpointer directory — handles
    sharded `jax.Array`s natively (every host writes its own shards), so it
    is the multi-host path.
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        state = {
            k: jax.numpy.asarray(v) for k, v in _leaf_dict(tree).items()
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    arrays = {k: np.asarray(v) for k, v in _leaf_dict(tree).items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any, backend: str = "npz") -> Any:
    """Load leaves saved by :func:`save_pytree` into ``template``'s
    structure (same flow/optimizer constructed the same way)."""
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        data = ckptr.restore(os.path.abspath(path))
        leaves = [data[f"leaf_{i}"] for i in range(len(data))]
    elif backend == "npz":
        with np.load(path) as data:
            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
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
