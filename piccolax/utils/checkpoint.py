"""Checkpoint / resume for solver state and trajectories.

TPU-native counterpart of the reference persistence mechanisms
(reference: pulse JLD2 save/load primitives/pulses.jl:1024-1035;
trajectory save via NamedTrajectories; SURVEY.md section 5.4). Saves the
full (primal, dual) IPM iterate so preempted jobs warm-start exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_solver_state", "load_solver_state", "save_pytree",
           "load_pytree"]


def save_pytree(path: str, tree) -> None:
    """Flat .npz serialization of an array pytree (structure via key paths)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for keypath, leaf in leaves_with_paths:
        key = "/".join(str(k) for k in keypath)
        arrays[key] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load arrays saved by `save_pytree` back into the structure of `like`."""
    raw = np.load(path, allow_pickle=False)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for keypath, leaf in leaves_with_paths:
        key = "/".join(str(k) for k in keypath)
        arr = jnp.asarray(raw[key])
        new_leaves.append(arr.astype(leaf.dtype) if hasattr(leaf, "dtype")
                          else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_solver_state(path: str, state) -> None:
    """Persist a full IPMState (primal + dual iterates, barrier, counters)."""
    save_pytree(path, state)


def load_solver_state(path: str, like):
    """Restore an IPMState saved by `save_solver_state` (warm start:
    pass the restored state's Z/g/lam back into solve or resume loops)."""
    return load_pytree(path, like)
