"""End-to-end collocation solves on tiny problems (real solver, no mocks).

Mirrors the reference end-to-end tests (construct -> solve -> sync ->
fidelity on N=11-50 problems; SURVEY.md section 4) and its golden quality
bars (fidelity >= 0.999; independent-rollout agreement).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import piccolax as px
from piccolax.quantum import dynamics as dyn


def qubit_system():
    return px.QuantumSystem(np.zeros((2, 2)),
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)


def sx_problem(N=25, T=6.0, **kw):
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(0).standard_normal((N, 2))
    qtraj = px.UnitaryTrajectory(qubit_system(), px.ZeroOrderPulse(us, times),
                                 px.GATES["SX"])
    return px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2, **kw)


def test_sx_gate_solve():
    prob = sx_problem()
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    F = float(prob.fidelity())
    assert F > 0.999, F
    # independent validation: exact ZOH re-integration of the solved pulse
    Froll = float(dyn.unitary_rollout_fidelity(
        prob.qtraj.system, prob.traj["u"], prob.traj.get_times(),
        jnp.asarray(px.GATES["SX"]), interpolation="constant"))
    assert abs(F - Froll) < 1e-6


def test_ket_transfer_solve():
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(1).standard_normal((N, 2))
    psi0 = jnp.array([1.0 + 0j, 0.0])
    psig = jnp.array([0.0, 1.0 + 0j])
    qtraj = px.KetTrajectory(qubit_system(), px.ZeroOrderPulse(us, times),
                             psi0, psig)
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(prob.fidelity()) > 0.999


def test_multiket_coherent_solve():
    # X gate as a coherent 2-state transfer problem
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(2).standard_normal((N, 2))
    initials = jnp.asarray(np.eye(2, dtype=complex))
    goals = jnp.asarray(px.GATES["X"] @ np.eye(2))
    qtraj = px.MultiKetTrajectory(qubit_system(),
                                  px.ZeroOrderPulse(us, times),
                                  initials, goals)
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(prob.fidelity()) > 0.999


def test_solved_pulse_extraction_roundtrip():
    prob = sx_problem()
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    pulse = prob.pulse
    assert isinstance(pulse, px.ZeroOrderPulse)
    np.testing.assert_allclose(np.asarray(pulse.values),
                               np.asarray(prob.traj["u"]), atol=1e-12)
    # re-rollout through the public physics API agrees with the NLP state
    qt2 = prob.qtraj
    U_iso_final = np.asarray(qt2.state_iso(prob.traj.get_times()))[-1]
    np.testing.assert_allclose(U_iso_final, np.asarray(prob.traj["U"][-1]),
                               atol=1e-6)


def test_free_time_problem():
    # free dt with TimeStepsEqual: solves and keeps dt within bounds
    prob = sx_problem(dt_bounds=(0.1, 0.5))
    prob.solve(max_iter=150, tol=1e-6, verbose=False)
    dts = np.asarray(prob.traj.get_timesteps())
    assert (dts >= 0.1 - 1e-6).all() and (dts <= 0.5 + 1e-6).all()
    np.testing.assert_allclose(dts[:-1], dts[0], atol=1e-5)
    assert float(prob.fidelity()) > 0.999


def test_minimum_time_transform():
    base = sx_problem(N=21, T=6.0, dt_bounds=(0.05, 0.6))
    base.solve(max_iter=150, tol=1e-6, verbose=False)
    T_base = float(np.asarray(base.traj.get_times())[-1])
    mt = px.MinimumTimeProblem(base, final_fidelity=0.995, D=10.0)
    mt.solve(max_iter=200, tol=1e-6, verbose=False)
    T_min = float(np.asarray(mt.traj.get_times())[-1])
    assert T_min < T_base
    assert float(mt.fidelity()) > 0.99


def test_integrator_residual_zero_on_rollout():
    # the collocation dynamics residual vanishes on an exact ZOH rollout
    # (geodesic init deliberately off: this test checks the rollout init)
    prob = sx_problem(N=15, T=4.0, geodesic=False)
    nlp, params, Z0, g0, layout = prob.build()
    from piccolax.solver.nlp import nlp_constraint_residuals
    # Z0 state columns come from the rollout of the initial pulse
    c = nlp_constraint_residuals(nlp, Z0, g0, params)
    md = nlp.md
    dyn_rows = np.asarray(c[:, nlp.me:])
    assert np.abs(dyn_rows[:-1]).max() < 1e-9, np.abs(dyn_rows).max()
