"""Independent-integrator cross-checks (BASELINE quality bar 2).

Mirrors the reference's QuantumToolbox validation discipline
(|F_piccolo - F_qutip| <= 1e-4, two_qubit_gate_validation.jl:348):
piccolax's production rollout engines (expm-scan ZOH, Magnus4) are
checked against `rollout_with_scipy` — scipy DOP853 sharing no code with
the production path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import piccolax as px
from piccolax.quantum import dynamics as dyn


def test_zoh_engine_matches_scipy():
    sys2 = px.QuantumSystem(0.3 * px.PAULIS["Z"],
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    N, T = 21, 6.0
    times = np.linspace(0, T, N)
    us = 0.3 * np.random.default_rng(0).standard_normal((N, 2))
    pulse = px.ZeroOrderPulse(us, times)
    Us = np.asarray(dyn.unitary_rollout(sys2, pulse, times))
    Us_sp = dyn.rollout_with_scipy(sys2, pulse, times)
    assert np.max(np.abs(Us - Us_sp)) < 1e-8


def test_magnus_engine_matches_scipy_modulated():
    sys_td = px.QuantumSystem(
        np.zeros((2, 2)),
        [(px.PAULIS["X"] / 2, lambda t: jnp.cos(1.3 * t)),
         px.PAULIS["Y"] / 2], 1.0)
    N, T = 21, 6.0
    times = np.linspace(0, T, N)
    us = 0.4 * np.random.default_rng(1).standard_normal((N, 2))
    pulse = px.ZeroOrderPulse(us, times)
    Us = np.asarray(dyn.unitary_rollout(sys_td, pulse, times,
                                        n_substeps=10))
    Us_sp = dyn.rollout_with_scipy(sys_td, pulse, times)
    assert np.max(np.abs(Us - Us_sp)) < 1e-6


def test_solved_fidelity_agrees_with_scipy():
    """Solve SX, then check the reported fidelity against the fully
    independent integrator to 1e-4 (the reference's hard assert)."""
    sys2 = px.QuantumSystem(np.zeros((2, 2)),
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(2).standard_normal((N, 2))
    qtraj = px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us, times),
                                 px.GATES["SX"])
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    F = float(prob.fidelity())
    assert F > 0.999

    Us_sp = dyn.rollout_with_scipy(sys2, prob.pulse,
                                   np.asarray(prob.traj.get_times()))
    F_sp = float(dyn.unitary_fidelity(jnp.asarray(Us_sp[-1]),
                                      jnp.asarray(px.GATES["SX"])))
    assert abs(F - F_sp) < 1e-4, (F, F_sp)


def test_ket_rollout_matches_scipy():
    sys2 = px.QuantumSystem(0.2 * px.PAULIS["Z"],
                            [px.PAULIS["X"] / 2], 1.0)
    N, T = 15, 4.0
    times = np.linspace(0, T, N)
    us = 0.5 * np.random.default_rng(3).standard_normal((N, 1))
    pulse = px.ZeroOrderPulse(us, times)
    psi0 = jnp.array([1.0 + 0j, 0.0])
    psis = np.asarray(dyn.ket_rollout(sys2, pulse, times, psi0))
    psis_sp = dyn.rollout_with_scipy(sys2, pulse, times, np.asarray(psi0))
    assert np.max(np.abs(psis - psis_sp)) < 1e-8


def test_scipy_lindblad_cross_check():
    """rollout_with_scipy integrates the density-matrix Lindblad RHS
    when handed an OpenQuantumSystem + rho0 — fully independent of the
    compact-iso production engine."""
    import piccolax as px
    from piccolax.quantum.systems import LinearDissipator

    a = px.quantum.annihilate(2)
    sys_o = px.OpenQuantumSystem(
        0.3 * px.PAULIS["Z"], [px.PAULIS["X"]], 1.0,
        dissipators=[LinearDissipator(a, 0.05)])
    times = np.linspace(0, 4.0, 20)
    pulse = px.ZeroOrderPulse(
        0.2 * np.random.default_rng(0).standard_normal((20, 1)), times)
    rho0 = np.array([[1.0, 0], [0, 0]], complex)
    rhos_engine = np.asarray(px.density_rollout(sys_o, pulse, times, rho0))
    rhos_scipy = dyn.rollout_with_scipy(sys_o, pulse, times, rho0)
    np.testing.assert_allclose(rhos_engine, rhos_scipy, atol=1e-6)
    # trace preserved by both
    np.testing.assert_allclose(
        np.real(np.trace(rhos_scipy, axis1=1, axis2=2)), 1.0, atol=1e-9)
