# # Constraints
#
# Hard requirements vs soft preferences (reference:
# docs/literate/concepts/constraints.jl).
#
# ## Overview
#
# * Objectives say "prefer lower" — the solver trades them off.
# * Constraints say "must hold" — the interior-point method keeps the
#   iterates strictly feasible w.r.t. inequalities and drives equality
#   residuals to tolerance.
#
# Bound constraints (controls, derivatives, timesteps) come from the
# trajectory metadata; functional constraints (fidelity floors,
# leakage caps, global pins) are constraint objects.
#
# Run it:  python docs/concepts/constraints.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

sys_q = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                         [px.PAULIS["X"], px.PAULIS["Y"]],
                         drive_bounds=0.5)
N, T = 40, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)

# ## Bound constraints
#
# drive_bounds on the system become box bounds on u; du_bound/ddu_bound
# bound the derivative variables; dt_bounds the timestep:

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"]), N,
    Q=100.0, R=1e-2, du_bound=0.2, dt_bounds=(0.1, 0.5))
qcp.solve(max_iter=150, tol=1e-7, verbose=False)
u = np.asarray(qcp.traj["u"])
du = np.asarray(qcp.traj["du"])
dt = np.asarray(qcp.traj.get_timesteps())[:-1]
assert np.abs(u).max() <= 0.5 + 1e-7     # system drive bound
assert np.abs(du).max() <= 0.2 + 1e-7    # slew bound
assert dt.min() >= 0.1 - 1e-9 and dt.max() <= 0.5 + 1e-9
assert float(qcp.fidelity()) > 0.999
print(f"bounds hold: max|u|={np.abs(u).max():.3f}, "
      f"max|du|={np.abs(du).max():.3f}, dt in "
      f"[{dt.min():.3f}, {dt.max():.3f}]")

# ## Fidelity constraints
#
# `MinimumTimeProblem` installs a terminal fidelity INEQUALITY — the
# fidelity stops being an objective and becomes a floor:

qcp_mt = px.MinimumTimeProblem(qcp, final_fidelity=0.995, D=10.0)
qcp_mt.solve(max_iter=200, tol=1e-6, verbose=False)
F = float(qcp_mt.fidelity())
print(f"min-time with F >= 0.995 floor: F = {F:.6f}")
assert F > 0.99, F

# ## Leakage constraints
#
# On multilevel systems, `leakage_value` hard-caps leakage population
# per knot while `leakage_cost` merely penalizes it (see
# docs/guides/leakage_suppression.py):

sys3 = px.quantum.TransmonSystem(levels=3, drive_bounds=0.2)
goal3 = px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=3)
pulse3 = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_leak = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys3, pulse3, goal3), N, Q=100.0, R=1e-2,
    leakage_value=0.2)
from piccolax.control import constraints as cons   # noqa: E402
assert any(isinstance(c, cons.LeakageConstraint)
           for c in qcp_leak.constraints)

# ## Global pins (calibration targets)
#
# `calibration_targets` pins a trajectory global to a measured value
# via an equality constraint — e.g. lock a free phase to a calibrated
# offset:

qcp_cal = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, goal=px.GATES["X"]), N,
    Q=100.0, R=1e-2, free_phase=1, calibration_targets={"theta": 0.0})
assert any(isinstance(c, cons.GlobalPinConstraint)
           for c in qcp_cal.constraints)

# ## Constraints vs objectives: when to use which
#
# * Use an OBJECTIVE when "as good as possible" is acceptable
#   (fidelity in a standard solve, smoothness).
# * Use a CONSTRAINT when a requirement is non-negotiable (hardware
#   amplitude limits, a fidelity floor while minimizing time, leakage
#   caps for a fixed error budget).
# * Infeasible constraint sets make the solve stall — start
#   unconstrained, add constraints gradually, and leave margin.
print("constraints complete.")
