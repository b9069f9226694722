"""Variational sensitivity problems end-to-end.

Mirrors the reference variational path (VariationalQuantumSystem +
VariationalUnitaryIntegrator stacking base+sensitivity states +
UnitarySensitivityObjective; reference: integrators.jl:187-218,
objectives.jl:457): penalizing the terminal sensitivity norm yields a
pulse whose fidelity spread over a detuning ensemble shrinks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import piccolax as px
from piccolax.control import integrators as intg
from piccolax.quantum import dynamics as dyn

N, T = 25, 6.0
TIMES = np.linspace(0, T, N)
ZHALF = px.PAULIS["Z"] / 2


def _initial_pulse(seed=0):
    us = 0.01 * np.random.default_rng(seed).standard_normal((N, 2))
    return px.ZeroOrderPulse(us, TIMES)


def _drives():
    return [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2]


def _ensemble_min_F(pulse, eps=0.1):
    """Worst fidelity under a +-eps Z/2 detuning error."""
    out = []
    for e in (-eps, 0.0, eps):
        s = px.QuantumSystem(e * ZHALF, _drives(), 1.0)
        Us = dyn.unitary_rollout(s, pulse, TIMES)
        out.append(float(dyn.unitary_fidelity(
            Us[-1], jnp.asarray(px.GATES["SX"]))))
    return min(out)


def test_variational_problem_structure():
    sysv = px.VariationalQuantumSystem(np.zeros((2, 2)), _drives(), 1.0,
                                       H_vars=[ZHALF])
    qtraj = px.UnitaryTrajectory(sysv, _initial_pulse(), px.GATES["SX"])
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
    # single stacked state component [base; sens] of dim 2*2n^2
    assert prob.traj.dims["U"] == 2 * (2 * 4)
    assert any(isinstance(i, intg.VariationalUnitaryIntegrator)
               for i in prob.integrators)
    # sensitivity blocks start at zero
    U0 = np.asarray(prob.traj["U"][0])
    assert np.all(U0[8:] == 0.0)


def test_variational_solve_reduces_detuning_spread():
    plain = px.SmoothPulseProblem(
        px.UnitaryTrajectory(px.QuantumSystem(np.zeros((2, 2)), _drives(),
                                              1.0),
                             _initial_pulse(), px.GATES["SX"]),
        N, Q=100.0, R=1e-2)
    plain.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(plain.fidelity()) > 0.999

    sysv = px.VariationalQuantumSystem(np.zeros((2, 2)), _drives(), 1.0,
                                       H_vars=[ZHALF])
    qtraj = px.UnitaryTrajectory(sysv, _initial_pulse(), px.GATES["SX"])
    robust = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2,
                                   sensitivity_cost=0.3)
    robust.solve(max_iter=250, tol=1e-7, verbose=False)
    assert float(robust.fidelity()) > 0.999    # base fidelity holds

    F_plain = _ensemble_min_F(plain.pulse)
    F_robust = _ensemble_min_F(robust.pulse)
    assert F_robust > F_plain, (F_robust, F_plain)
    # mechanism check: the sensitivity penalty must shrink the terminal
    # sensitivity norm vs the SAME variational problem without the
    # penalty (an absolute bar is brittle — the optimum shifts with the
    # initialization policy)
    qtraj0 = px.UnitaryTrajectory(
        px.VariationalQuantumSystem(np.zeros((2, 2)), _drives(), 1.0,
                                    H_vars=[ZHALF]),
        _initial_pulse(), px.GATES["SX"])
    unpen = px.SmoothPulseProblem(qtraj0, N, Q=100.0, R=1e-2,
                                  sensitivity_cost=0.0)
    unpen.solve(max_iter=250, tol=1e-7, verbose=False)
    sens_pen = np.linalg.norm(np.asarray(robust.traj["U"][-1][8:]))
    sens_unpen = np.linalg.norm(np.asarray(unpen.traj["U"][-1][8:]))
    assert sens_pen < 0.9 * sens_unpen, (sens_pen, sens_unpen)
