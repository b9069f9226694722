# # Global Variables
#
# Time-INVARIANT decision variables alongside the knot-point ones
# (reference: docs/literate/guides/global_variables.jl).
#
# ## When to use
#
# * Free phases on the goal (virtual-Z compilation) — the flagship use.
# * Calibration offsets pinned to measured values.
# * Any scalar the physics shares across all knots.
#
# Run it:  python docs/guides/global_variables.py   (CPU, ~1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Free phases as globals
#
# With `free_phase=True`, the template attaches per-qubit phase
# globals theta and evaluates the goal as Z(theta) * U_goal — the
# optimizer may implement the gate up to Z rotations that hardware
# applies virtually:

sys_q = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                         [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
N, T = 40, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"]), N,
    Q=100.0, R=1e-2, free_phase=True)
qcp.solve(max_iter=120, tol=1e-7, verbose=False)

theta = np.asarray(qcp.traj.global_data["theta"])
print(f"optimized phase global theta = {theta}")
assert float(qcp.fidelity()) > 0.999       # phase-aware fidelity

# ## Accessing globals
#
# Globals live in `traj.global_data` (name -> vector), are part of the
# NLP variable vector, and participate in derivatives exactly like
# knot variables.

assert "theta" in qcp.traj.global_names

# ## Global bounds
#
# Box-bound a global with `global_bounds` (scalar = symmetric, tuple =
# (lo, hi)):

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_b = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"]), N,
    Q=100.0, R=1e-2, free_phase=True,
    global_bounds={"theta": (-0.05, 0.05)})
qcp_b.solve(max_iter=120, tol=1e-7, verbose=False)
th = float(np.asarray(qcp_b.traj.global_data["theta"])[0])
assert -0.05 - 1e-7 <= th <= 0.05 + 1e-7
print(f"bounded phase: theta = {th:+.4f} in [-0.05, 0.05]")

# ## Calibration targets
#
# Pin a global to a measured value with an equality constraint —
# "the hardware applies exactly this virtual Z, optimize around it":

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_cal = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"]), N,
    Q=100.0, R=1e-2, free_phase=True,
    calibration_targets={"theta": 0.1})
qcp_cal.solve(max_iter=120, tol=1e-7, verbose=False)
th_cal = float(np.asarray(qcp_cal.traj.global_data["theta"])[0])
assert abs(th_cal - 0.1) < 1e-5, th_cal
print(f"pinned phase: theta = {th_cal:.6f} (target 0.1)")

# ## System global parameters
#
# A system can carry named global parameters; `discretize` copies them
# into the trajectory globals and `solve()` syncs them back into the
# system afterwards (the `update_global_params!` analogue):

sys_gp = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                          [px.PAULIS["X"], px.PAULIS["Y"]], 1.0,
                          global_params={"detuning": np.array([0.5])})
traj = px.discretize(px.UnitaryTrajectory(sys_gp, pulse, px.GATES["X"]),
                     N)
assert "detuning" in traj.global_names
np.testing.assert_allclose(np.asarray(traj.global_data["detuning"]),
                           [0.5])

# ## Best practices
#
# * Start globals at good initial values — they warm-start like
#   everything else.
# * Bound phases to (-pi, pi] unless you want winding.
# * For Hamiltonian-parameter UNCERTAINTY (not calibration), use
#   SamplingProblem or VariationalQuantumSystem instead — globals are
#   shared decision variables, not distributions.
print("global_variables complete.")
