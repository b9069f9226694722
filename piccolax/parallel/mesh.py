"""Device-mesh parallelism for batched collocation solves.

The TPU-native replacement for everything the reference lacks
(SURVEY.md section 2.8): ensembles/calibration sweeps/robustness batches
become a sharded batch axis over a `jax.sharding.Mesh` — each chip runs
the same fixed-shape IPM on its shard of problems; the only collectives
are reductions for logging/convergence (inserted automatically by XLA
from the sharded jit).

Knot-axis (sequence-parallel) sharding via block cyclic reduction lives
in `parallel/sharded_kkt.py` (shard_map + ppermute over the knot axis);
the single-device building block is `solver/kkt.py:cr_factor/cr_solve`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.ipm import IPMOptions, solve_nlp

__all__ = ["get_mesh", "shard_batch", "batch_solve"]


def get_mesh(axis_name: str = "batch", devices=None) -> Mesh:
    """1-D device mesh over all (or given) devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Place a batched pytree (leading batch axis on every leaf) so the
    batch axis is sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def place(x):
        if x.ndim == 0:
            return x
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, tree)


def batch_solve(nlp, params_batch, Z0_batch, g0_batch=None,
                options: IPMOptions | None = None, mesh: Mesh | None = None,
                axis_name: str = "batch"):
    """Solve a batch of collocation NLPs (shared structure, different
    params/initial guesses), optionally sharded across a device mesh.

    params_batch: pytree with leading batch axis on every leaf (use
    tree_map(stack) or jnp.broadcast arrays). Returns the vmapped IPMState.
    """
    options = options or IPMOptions()

    def solve_one(params, Z0, g0):
        return solve_nlp(nlp, params, Z0, g0, options)

    if g0_batch is None:
        B = jax.tree_util.tree_leaves(Z0_batch)[0].shape[0]
        g0_batch = jnp.zeros((B, nlp.dg))

    fn = jax.vmap(solve_one)
    if mesh is not None:
        spec = P(axis_name)
        sharding = NamedSharding(mesh, spec)
        params_batch = shard_batch(params_batch, mesh, axis_name)
        Z0_batch = jax.device_put(Z0_batch, sharding)
        g0_batch = jax.device_put(g0_batch, sharding)
        fn = jax.jit(fn)
    else:
        fn = jax.jit(fn)
    return fn(params_batch, Z0_batch, g0_batch)
