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


def _replicated_sharding():
    """Fully-replicated NamedSharding over every device of the pod (the
    global form host-local replicated leaves take on a multi-host save)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    return NamedSharding(
        Mesh(np.array(jax.devices()), ("_ckpt_all",)), PartitionSpec()
    )


def save_pytree(path: str, tree: Any, backend: str = "npz") -> None:
    """Save all array leaves of ``tree`` to ``path``.

    ``backend="npz"``: single file, host-gathered numpy arrays.
    ``backend="orbax"``: Orbax StandardCheckpointer directory — handles
    sharded `jax.Array`s natively (every host writes its own shards), so it
    is the multi-host path.
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        multi = jax.process_count() > 1
        rep_sh = _replicated_sharding() if multi else None
        state = {}
        for k, v in _leaf_dict(tree).items():
            if not isinstance(v, jax.Array):
                v = jax.numpy.asarray(v)
            if multi and v.is_fully_addressable:
                # replicated host-local leaves must become GLOBAL
                # fully-replicated arrays: orbax refuses to serialize
                # host-local jax.Arrays on a pod (every process holds the
                # same values; the converted array spans all devices)
                host = np.asarray(v)
                v = jax.make_array_from_callback(
                    host.shape, rep_sh, lambda idx, h=host: h[idx])
            state[k] = v
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
        # Sharding-aware restore: build an abstract target from the
        # template so each leaf is restored WITH the template's sharding
        # (on a multi-host pod every process then reads only its own
        # shards — restoring without a target would read sharding from
        # the checkpoint file, which orbax documents as unsafe across
        # topology changes). Host-local template leaves mirror the save
        # path: on a pod they restore as global fully-replicated arrays
        # and are lowered back to host-local values afterwards.
        multi = jax.process_count() > 1
        rep_sh = _replicated_sharding() if multi else None
        abstract = {}
        was_local = {}
        for k, tl in _leaf_dict(template).items():
            arr = tl if isinstance(tl, jax.Array) else jax.numpy.asarray(tl)
            local = not isinstance(arr, jax.Array) or arr.is_fully_addressable
            was_local[k] = local
            abstract[k] = jax.ShapeDtypeStruct(
                arr.shape, arr.dtype,
                sharding=(rep_sh if (multi and local)
                          else getattr(arr, "sharding", None)),
            )
        data = ckptr.restore(os.path.abspath(path), abstract)
        leaves = []
        for i in range(len(data)):
            v = data[f"leaf_{i}"]
            if multi and was_local[f"leaf_{i}"] and isinstance(v, jax.Array):
                v = np.asarray(v.addressable_data(0))
            leaves.append(v)
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
