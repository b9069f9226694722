"""Content-hash solve cache.

TPU-native counterpart of the reference docs solve cache
(reference: src/docs_cache.jl:8,180 — cached_solve!): cache a solved
trajectory keyed by a content hash of the problem inputs, invalidating
automatically when the inputs change.
"""

from __future__ import annotations

import hashlib
import os

import jax
import numpy as np

from ..trajectory import Trajectory

__all__ = ["problem_hash", "cached_solve"]


def problem_hash(problem, extra: str = "") -> str:
    """Content hash of the problem's numeric inputs + term structure."""
    h = hashlib.sha256()
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(
            problem.traj)[0]:
        h.update(str(keypath).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    for obj in problem.objectives:
        h.update(type(obj).__name__.encode())
    for it in problem.integrators:
        h.update(type(it).__name__.encode())
    for con in problem.constraints:
        h.update(type(con).__name__.encode())
    h.update(extra.encode())
    return h.hexdigest()[:16]


def cached_solve(problem, cache_dir: str = ".piccolax_cache", name: str = "",
                 **solve_kwargs):
    """Solve with a content-hash cache: if a matching solution exists on
    disk, load it into the problem instead of re-solving."""
    os.makedirs(cache_dir, exist_ok=True)
    key = problem_hash(problem, extra=f"{name}|{sorted(solve_kwargs.items())}")
    path = os.path.join(cache_dir, f"{name or 'solve'}_{key}.npz")
    if os.path.exists(path):
        traj = Trajectory.load(path)
        problem.traj = traj
        problem.sync_trajectory()
        return problem
    problem.solve(**solve_kwargs)
    problem.traj.save(path)
    return problem
