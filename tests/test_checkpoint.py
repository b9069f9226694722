"""Checkpoint / preemption-resume tests (SURVEY.md sections 5.3-5.4).

The reference's warm-start workflow is load-bearing
(reference: src/control/CONTEXT.md:105-132 — solve, save, reload,
continue). Here the contract is stronger: saving the FULL IPMState
mid-solve and resuming reproduces the uninterrupted run bit-for-bit
(same dtype, same device), because `solve_nlp(resume_from=...)`
restores every adaptation counter alongside the primal/dual iterate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions, solve_nlp
from piccolax.utils.checkpoint import load_solver_state, save_solver_state


@pytest.fixture(scope="module")
def sx_nlp():
    prob = bm.sx_gate_problem(N=15, T=10.0)
    return prob.build()


def _solve(nlp, params, Z0, g0, iters, resume_from=None):
    opts = IPMOptions(max_iter=iters, tol=1e-10, constr_viol_tol=1e-10)
    return jax.jit(
        lambda Z, g, r: solve_nlp(nlp, params, Z, g, opts, resume_from=r)
    )(Z0, g0, resume_from)


def test_resume_reproduces_uninterrupted_run(sx_nlp, tmp_path):
    nlp, params, Z0, g0, layout = sx_nlp
    full = _solve(nlp, params, Z0, g0, 40)

    # preempt at 15 iterations, persist to disk, restore, resume for 25
    part = _solve(nlp, params, Z0, g0, 15)
    path = str(tmp_path / "ipm_ckpt.npz")
    save_solver_state(path, part)
    restored = load_solver_state(path, like=part)
    # round-trip is exact
    for a, b in zip(jax.tree_util.tree_leaves(part),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    resumed = _solve(nlp, params, Z0, g0, 25, resume_from=restored)
    assert int(part.it) == 15
    np.testing.assert_array_equal(np.asarray(resumed.Z), np.asarray(full.Z))
    np.testing.assert_array_equal(np.asarray(resumed.lam),
                                  np.asarray(full.lam))
    np.testing.assert_allclose(float(resumed.kkt_err), float(full.kkt_err),
                               rtol=0, atol=0)


def test_resume_batched_under_vmap(sx_nlp, tmp_path):
    """Preemption recovery of a BATCH solve (the production shape)."""
    nlp, params, Z0, g0, layout = sx_nlp
    B = 3
    rng = np.random.default_rng(0)
    u_sl = layout.slices["u"]
    Zb = np.broadcast_to(np.asarray(Z0)[None], (B, *Z0.shape)).copy()
    Zb[:, :, u_sl] += 0.02 * rng.standard_normal(
        (B, Z0.shape[0], u_sl.stop - u_sl.start))
    Zb = jnp.asarray(Zb)
    gb = jnp.zeros((B, 0))

    def batch(iters, resume=None):
        opts = IPMOptions(max_iter=iters, tol=1e-10, constr_viol_tol=1e-10)
        if resume is None:
            return jax.jit(jax.vmap(
                lambda Z, g: solve_nlp(nlp, params, Z, g, opts)))(Zb, gb)
        return jax.jit(jax.vmap(
            lambda Z, g, r: solve_nlp(nlp, params, Z, g, opts,
                                      resume_from=r)))(Zb, gb, resume)

    full = batch(30)
    part = batch(12)
    path = str(tmp_path / "batch_ckpt.npz")
    save_solver_state(path, part)
    restored = load_solver_state(path, like=part)
    resumed = batch(18, resume=restored)
    np.testing.assert_array_equal(np.asarray(resumed.Z), np.asarray(full.Z))
    np.testing.assert_array_equal(np.asarray(resumed.converged),
                                  np.asarray(full.converged))
