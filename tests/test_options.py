"""PiccoloOptions wiring into the problem templates.

Mirrors the reference three-tier config (PiccoloOptions -> template
kwargs -> IPMOptions; reference: options.jl:88-121,
apply_piccolo_options! _problem_templates.jl:135-234).
"""

import numpy as np
import pytest

import piccolax as px
from piccolax.control import constraints as cons


def _sx_qtraj(n_drives=2, seed=0, N=21, T=6.0):
    drives = [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2][:n_drives]
    sys2 = px.QuantumSystem(np.zeros((2, 2)), drives, 1.0)
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(seed).standard_normal((N, n_drives))
    return px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us, times),
                                px.GATES["SX"])


def test_options_flags_flow_into_problem():
    opts = px.PiccoloOptions(display="silent", timesteps_all_equal=False,
                             bound_state=0.9)
    prob = px.SmoothPulseProblem(_sx_qtraj(), 21, dt_bounds=(0.1, 0.5),
                                 options=opts)
    from piccolax.control import integrators as intg
    # timesteps_all_equal=False: no TimeStepsEqualIntegrator
    assert not any(isinstance(i, intg.TimeStepsEqualIntegrator)
                   for i in prob.integrators)
    # bound_state flows into the state box
    b = np.asarray(prob.traj.bounds["U"])
    assert np.allclose(np.abs(b), 0.9)
    # explicit kwarg wins over the options record
    prob2 = px.SmoothPulseProblem(_sx_qtraj(), 21, dt_bounds=(0.1, 0.5),
                                  timesteps_all_equal=True, options=opts)
    assert any(isinstance(i, intg.TimeStepsEqualIntegrator)
               for i in prob2.integrators)


def test_options_leakage_autoderive():
    """Leakage options + an embedded goal auto-derive the leakage iso
    indices (reference: apply_piccolo_options! leakage path)."""
    drift = np.diag([0.0, 0.0, -2.0])
    a = np.zeros((3, 3), complex)
    a[0, 1] = a[1, 2] = 1.0
    sys3 = px.QuantumSystem(drift, [(a + a.T.conj()) / 2,
                                    (1j * (a - a.T.conj())) / 2], 1.0)
    N, T = 21, 6.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(1).standard_normal((N, 2))
    goal = px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=3)
    qtraj = px.UnitaryTrajectory(sys3, px.ZeroOrderPulse(us, times), goal)
    opts = px.PiccoloOptions(display="silent", leakage_cost=1.0)
    prob = px.SmoothPulseProblem(qtraj, N, options=opts)
    from piccolax.control import objectives as obj
    leak_objs = [o for o in prob.objectives
                 if isinstance(o, obj.LeakageObjective)]
    assert len(leak_objs) == 1
    assert leak_objs[0].indices.size > 0


def test_options_state_l2_ball_solves():
    opts = px.PiccoloOptions(display="silent", bound_state_l2=True)
    prob = px.SmoothPulseProblem(_sx_qtraj(), 21, options=opts)
    # the L2 ball replaces the box
    assert "U" not in prob.traj.bounds
    assert any(isinstance(c, cons.BoundStateL2Constraint)
               for c in prob.constraints)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(prob.fidelity()) > 0.999
    # every complex entry of the solved state is inside the unit ball
    U = np.asarray(prob.traj["U"])
    pairs = cons.iso_entry_pairs(8, 2)
    mod2 = U[:, pairs[:, 0]] ** 2 + U[:, pairs[:, 1]] ** 2
    assert mod2.max() <= 1.0 + 1e-6


def test_options_complex_control_norm():
    """I/Q drive pairs bounded in modulus: |u_I + i u_Q| <= r."""
    r = 0.6
    opts = px.PiccoloOptions(display="silent",
                             complex_control_norm_constraint=r)
    prob = px.SmoothPulseProblem(_sx_qtraj(), 21, options=opts)
    assert any(isinstance(c, cons.ComplexModulusConstraint)
               for c in prob.constraints)
    prob.solve(max_iter=150, tol=1e-7, verbose=False)
    assert float(prob.fidelity()) > 0.999
    u = np.asarray(prob.traj["u"])
    mod = np.sqrt(u[:, 0] ** 2 + u[:, 1] ** 2)
    assert mod.max() <= r + 1e-4, mod.max()


def test_options_display_compact(capsys):
    opts = px.PiccoloOptions(display="compact")
    px.SmoothPulseProblem(_sx_qtraj(), 21, options=opts)
    out = capsys.readouterr().out
    assert "UnitaryTrajectory" in out and "N=21" in out
