"""Solve tests for Spline / BangBang / Sampling problem templates.

Mirrors the reference's densest template testitems (spline 21, smooth 20;
SURVEY.md section 4): real end-to-end solves, pulse-type round trips,
transform chains. All tiny problem sizes (N=21-25, 2-level).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import piccolax as px
from piccolax.quantum import dynamics as dyn


def _system(scale=1.0):
    return px.QuantumSystem(np.zeros((2, 2)),
                            [scale * px.PAULIS["X"] / 2,
                             scale * px.PAULIS["Y"] / 2], 1.0)


def _rollout_F(prob, n_substeps=8):
    """Independent validation: re-integrate the extracted pulse with
    substeps (catches ZOH-collocation-vs-spline discretization error)."""
    qt = prob.qtraj.rollout(prob.pulse, n_substeps=n_substeps)
    return float(qt.fidelity())


def test_spline_linear_solve():
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(0).standard_normal((N, 2))
    pulse = px.LinearSplinePulse(us, times)
    qtraj = px.UnitaryTrajectory(_system(), pulse, px.GATES["SX"])
    prob = px.SplinePulseProblem(qtraj, N, Q=100.0, R=1e-2)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert isinstance(prob.pulse, px.LinearSplinePulse)
    assert float(prob.fidelity()) > 0.999
    # du is slope-constrained: finite differences of u match du
    u = np.asarray(prob.traj["u"])
    du = np.asarray(prob.traj["du"])
    dts = np.asarray(prob.traj.get_timesteps())
    fd = (u[1:] - u[:-1]) / dts[:-1, None]
    np.testing.assert_allclose(fd, du[:-1], atol=1e-5)


def test_spline_cubic_solve():
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(1)
    us = 0.01 * rng.standard_normal((N, 2))
    dus = np.zeros((N, 2))
    pulse = px.CubicSplinePulse(us, dus, times)
    qtraj = px.UnitaryTrajectory(_system(), pulse, px.GATES["SX"])
    prob = px.SplinePulseProblem(qtraj, N, Q=100.0, R=1e-2)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert isinstance(prob.pulse, px.CubicSplinePulse)
    assert float(prob.fidelity()) > 0.999
    # Hermite tangents are free DOFs preserved through extraction
    np.testing.assert_allclose(np.asarray(prob.pulse.tangents),
                               np.asarray(prob.traj["du"]), atol=1e-12)
    # cubic du is NOT slope-constrained: no DerivativeIntegrator on it
    from piccolax.control import integrators as intg
    assert not any(isinstance(i, intg.DerivativeIntegrator)
                   for i in prob.integrators)


def test_spline_native_knot_warmstart():
    """N=None uses the pulse's own knots (reference: N_or_times=nothing,
    spline_pulse_problem.jl native-knot warm start)."""
    K, T = 21, 6.0
    ktimes = np.linspace(0, T, K)
    us = 0.01 * np.random.default_rng(2).standard_normal((K, 2))
    pulse = px.LinearSplinePulse(us, ktimes)
    qtraj = px.UnitaryTrajectory(_system(), pulse, px.GATES["SX"])
    prob = px.SplinePulseProblem(qtraj, None, Q=100.0, R=1e-2)
    assert prob.traj.N == K
    np.testing.assert_allclose(np.asarray(prob.traj.get_times()), ktimes,
                               atol=1e-12)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(prob.fidelity()) > 0.999


def test_bangbang_solve_few_switches():
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(3).standard_normal((N, 2))
    pulse = px.ZeroOrderPulse(us, times)
    qtraj = px.UnitaryTrajectory(_system(), pulse, px.GATES["SX"])
    prob = px.BangBangPulseProblem(qtraj, N, Q=100.0, R_bang=0.5,
                                   du_bound=2.0)
    prob.solve(max_iter=200, tol=1e-7, verbose=False)
    assert float(prob.fidelity()) > 0.99
    # L1 slack reformulation drives du to sparsity: most knots are
    # (near-)constant -> few switches
    du = np.asarray(prob.traj["du"])
    active = np.abs(du) > 1e-2 * np.abs(du).max()
    frac_active = active.mean()
    assert frac_active < 0.5, frac_active
    # slacks reproduce |du| (exact L1 split)
    sp = np.asarray(prob.traj["_s_pos_du"])
    sn = np.asarray(prob.traj["_s_neg_du"])
    np.testing.assert_allclose(sp - sn, du, atol=1e-4)


def test_sampling_transform_chain():
    """solve -> SamplingProblem transform -> re-solve: the robust pulse
    narrows the fidelity spread over the system ensemble
    (reference: sampling_problem.jl transform chain)."""
    N, T = 25, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(4).standard_normal((N, 2))
    qtraj = px.UnitaryTrajectory(_system(), px.ZeroOrderPulse(us, times),
                                 px.GATES["SX"])
    base = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
    base.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(base.fidelity()) > 0.999

    # asymmetric ensemble: the base pulse is exact on scale 1.0 but ~6e-3
    # infidelity at 1.1; the robust re-solve splits the difference
    systems = [_system(1.0), _system(1.1)]

    def ensemble_fids(pulse):
        out = []
        for s in systems:
            Us = dyn.unitary_rollout(s, pulse, times)
            out.append(float(dyn.unitary_fidelity(
                Us[-1], jnp.asarray(px.GATES["SX"]))))
        return np.asarray(out)

    F_base = ensemble_fids(base.pulse)

    rob = px.SamplingProblem(base, systems)
    rob.solve(max_iter=200, tol=1e-7, verbose=False)
    F_rob = ensemble_fids(rob.pulse)

    # worst-case fidelity over the ensemble improves
    assert F_rob.min() > F_base.min(), (F_rob, F_base)
    assert F_rob.min() > 0.99, F_rob
