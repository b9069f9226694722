"""BASELINE benchmark configurations solve end-to-end (reduced sizes for CI).

Full sizes run in bench.py on TPU; these verify correctness of each
config family: qutrit leakage suppression, CNOT on coupled transmons,
vmapped robustness ensembles, Lindblad density optimization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import piccolax as px
from piccolax import benchmarks as bm


def test_qutrit_x_leakage():
    # keep dt*||H|| ~< 1 per knot (collocation resolution guidance)
    prob = bm.qutrit_x_problem(N=60, T=12.0, leakage_cost=1.0)
    prob.solve(max_iter=250, tol=1e-6, verbose=False)
    F = float(prob.fidelity())
    assert F > 0.99, F
    # leakage population of the final unitary's subspace columns is small
    U = np.asarray(prob.qtraj.Us[-1])
    leak = np.abs(U[2, :2]) ** 2
    assert leak.sum() < 1e-2, leak


def test_cnot_coupled_transmons():
    prob = bm.cnot_problem(N=60, T=12.0)
    prob.solve(max_iter=250, tol=1e-6, verbose=False)
    F = float(prob.fidelity())
    assert F > 0.99, F


def test_lindblad_density_transfer():
    prob = bm.lindblad_problem(N=80, T=8.0, gamma=0.005)
    prob.solve(max_iter=120, tol=1e-6, verbose=False)
    F = float(prob.fidelity())
    assert F > 0.95, F


def test_robustness_ensemble_vmap():
    from piccolax.parallel import batch_solve
    from piccolax.solver.ipm import IPMOptions

    B = 4
    nlp, params_batch, Z0_batch, layout = bm.robustness_ensemble(
        n_samples=B, N=15, T=6.0, eps_scale=0.01)
    sts = batch_solve(nlp, params_batch, Z0_batch,
                      options=IPMOptions(max_iter=200, tol=1e-6,
                                         constr_viol_tol=1e-6))
    assert sts.Z.shape[0] == B
    from piccolax.quantum import isomorphisms as iso
    from piccolax.quantum.dynamics import unitary_fidelity

    U_sl = layout.slices["U"]
    U_final = iso.iso_vec_to_operator(sts.Z[:, -1, U_sl])
    F = np.asarray(unitary_fidelity(U_final, jnp.asarray(px.GATES["SX"])))
    assert (F > 0.995).all(), F
