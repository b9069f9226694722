# # Two-Qubit Gate Validation
#
# Synthesize a CNOT on two coupled transmons with three pulse
# parameterizations of increasing smoothness, then validate every
# reported fidelity against an independent scipy DOP853 integration
# (the reference validates against QuantumToolbox.jl the same way;
# reference: docs/literate/two_qubit_gate_validation.jl).
#
# | Pulse type          | Template             | Continuity |
# |---------------------|----------------------|------------|
# | `ZeroOrderPulse`    | `SmoothPulseProblem` | C^-1       |
# | `LinearSplinePulse` | `SplinePulseProblem` | C^0        |
# | `CubicSplinePulse`  | `SplinePulseProblem` | C^1        |
#
# Quality bars (reference two_qubit_gate_validation.jl:347):
#   * F >= 0.999 for all three parameterizations
#   * |F_piccolax - F_scipy| <= 1e-4 for all three
#
# Run it:  python docs/two_qubit_gate_validation.py   (CPU, ~10 min)

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax.quantum import dynamics as dyn   # noqa: E402

# ## Step 1: the two-qubit system
#
# Two transmons, each in its own rotating frame, with exchange coupling
# g (a1 a2^dag + a1^dag a2). At 2 levels per transmon the anharmonicity
# drops out and the drift is just the coupling. g = 0.1 GHz is
# artificially large (real devices: 1-10 MHz) to keep the gate — and
# this tutorial — short; real systems should also model >= 3 levels to
# track leakage (see docs/multilevel_transmon.py).

omegas = [4.0, 4.1]              # GHz
deltas = [0.2, 0.2]              # GHz (unused at 2 levels)
g = 0.1                          # GHz
gs = np.array([[0.0, g], [g, 0.0]])

sys = px.quantum.MultiTransmonSystem(omegas, deltas, gs,
                                     levels_per_transmon=2,
                                     drive_bounds=0.1)
print(f"system: {sys.levels} levels, {sys.n_drives} drives")

# ## Step 2: the gate
#
# CNOT = GATES["CX"]. With 2 levels per transmon the computational
# subspace is the whole space, but we embed anyway so the tutorial
# carries over unchanged to levels_per_transmon >= 3:

U_goal = px.EmbeddedOperator(px.GATES["CX"], subsystem_levels=[2, 2])
goal_mat = jnp.asarray(px.GATES["CX"])

T = 10.0          # gate duration (ns)
N = 200           # number of knots -> dt = 0.05 ns

# With non-constant pulses the collocation dynamics are only
# second-order accurate per interval, so N controls the *physical*
# accuracy of the optimum, not just the resolution of the pulse.

# ## Step 3a: piecewise-constant (ZOH) pulse
#
# ZOH dynamics are EXACT across each constant interval, so this is the
# cheapest and most reliable stage — we use it to find the pulse shape,
# then refine smoother parameterizations from it.

rng = np.random.default_rng(1234)
times = np.linspace(0.0, T, N)
pulse_zoh = px.ZeroOrderPulse(0.02 * rng.standard_normal((N, 4)), times)
qtraj_zoh = px.UnitaryTrajectory(sys, pulse_zoh, U_goal)

t0 = time.time()
qcp_zoh = px.SmoothPulseProblem(qtraj_zoh, N, Q=100.0, R=1e-2,
                                ddu_bound=1.0)
qcp_zoh.solve(max_iter=250, tol=1e-7, verbose=False)
F_zoh = float(qcp_zoh.fidelity())
print(f"[zoh]    F = {F_zoh:.6f}  ({time.time() - t0:.0f}s)")

# ## Step 3b: linear spline, warm-started from the ZOH solution
#
# `LinearSplinePulse` interpolates knot values linearly; its slope
# variables du are tied to finite differences of u by a
# DerivativeIntegrator constraint.

pulse_lin = px.LinearSplinePulse(np.asarray(qcp_zoh.traj["u"]),
                                 np.asarray(qcp_zoh.traj.get_times()))
qtraj_lin = px.UnitaryTrajectory(sys, pulse_lin, U_goal)

t0 = time.time()
qcp_lin = px.SplinePulseProblem(qtraj_lin, N, Q=100.0, R_du=0.1,
                                du_bound=10.0)
qcp_lin.solve(max_iter=150, tol=1e-8, verbose=False)
F_lin = float(qcp_lin.fidelity())
print(f"[linear] F = {F_lin:.6f}  ({time.time() - t0:.0f}s)")

# ## Step 3c: cubic spline, warm-started from the linear solution
#
# `CubicSplinePulse` has free Hermite tangents (the du variables are
# genuine degrees of freedom, not slope-constrained).

pulse_cub = px.CubicSplinePulse(np.asarray(qcp_lin.traj["u"]),
                                np.zeros_like(np.asarray(qcp_lin.traj["u"])),
                                np.asarray(qcp_lin.traj.get_times()))
qtraj_cub = px.UnitaryTrajectory(sys, pulse_cub, U_goal)

t0 = time.time()
qcp_cub = px.SplinePulseProblem(qtraj_cub, N, Q=100.0, R_du=0.1,
                                du_bound=10.0)
qcp_cub.solve(max_iter=150, tol=1e-8, verbose=False)
F_cub = float(qcp_cub.fidelity())
print(f"[cubic]  F = {F_cub:.6f}  ({time.time() - t0:.0f}s)")

# ## Step 4: independent validation
#
# `rollout_with_scipy` re-integrates the *continuous-time* Schrodinger
# equation with scipy's DOP853 (rtol/atol 1e-10), sharing no code with
# the collocation engine — the analogue of the reference's
# QuantumToolbox rollout:


def scipy_fidelity(qcp):
    Us = dyn.rollout_with_scipy(qcp.qtraj.system, qcp.pulse,
                                np.asarray(qcp.traj.get_times()))
    return float(dyn.unitary_fidelity(jnp.asarray(Us[-1]), goal_mat))


results = [
    ("ZeroOrderPulse", F_zoh, scipy_fidelity(qcp_zoh)),
    ("LinearSplinePulse", F_lin, scipy_fidelity(qcp_lin)),
    ("CubicSplinePulse", F_cub, scipy_fidelity(qcp_cub)),
]

print(f"{'Pulse type':<18} {'F piccolax':>11} {'F scipy':>11} {'diff':>10}")
for name, fp, fs in results:
    print(f"{name:<18} {fp:>11.7f} {fs:>11.7f} {fp - fs:>10.2e}")

for name, fp, fs in results:
    assert fp >= 0.999, f"{name}: F = {fp} below the 0.999 bar"
    assert abs(fp - fs) <= 1e-4, f"{name}: |dF| = {abs(fp - fs)}"

print("All parameterizations reach >= 0.999 and agree with scipy "
      "to <= 1e-4.")
