# # MinimumTimeProblem
#
# Time-optimal control by transforming an already-solved problem
# (reference: docs/literate/problem-templates/minimum_time.jl).
#
# ## Key design: composition
#
# `MinimumTimeProblem` does not build a problem from scratch — it
# wraps a SOLVED `QuantumControlProblem`, reusing its trajectory as a
# warm start:
#
#     qcp = SmoothPulseProblem(qtraj, N, dt_bounds=(lo, hi))  # free dt!
#     qcp.solve(...)
#     qcp_mt = MinimumTimeProblem(qcp, final_fidelity=0.99, D=10.0)
#     qcp_mt.solve(...)
#
# It adds D * sum(dt) to the objective and converts the fidelity
# OBJECTIVE into an inequality CONSTRAINT F >= final_fidelity.
#
# Run it:  python docs/problem_templates/minimum_time.py   (CPU, ~1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402


def total_time(qcp):
    return float(np.sum(np.asarray(qcp.traj.get_timesteps())[:-1]))


sys_q = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                         [px.PAULIS["X"], px.PAULIS["Y"]],
                         drive_bounds=1.0)
T, N = 10.0, 50
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj = px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"])

# ## Step 1: base problem with free time enabled
#
# Without `dt_bounds` the timestep is pinned and there is nothing for
# MinimumTimeProblem to shrink.

qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2,
                            dt_bounds=(0.02, 0.3))
qcp.solve(max_iter=150, tol=1e-7, verbose=False)
T0 = total_time(qcp)
assert float(qcp.fidelity()) > 0.999
print(f"base solve: F = {float(qcp.fidelity()):.6f}, T = {T0:.2f}")

# ## Step 2: minimize time
#
# `D` trades time against staying comfortably inside the fidelity
# constraint; `final_fidelity` is the floor the solution must keep.

qcp_mt = px.MinimumTimeProblem(qcp, final_fidelity=0.99, D=10.0)
qcp_mt.solve(max_iter=200, tol=1e-6, verbose=False)
T1 = total_time(qcp_mt)
F1 = float(qcp_mt.fidelity())
print(f"min-time:   F = {F1:.6f}, T = {T1:.2f}")
assert F1 >= 0.985, F1          # constraint held (small solver slack)
assert T1 < T0, (T1, T0)        # time actually decreased

# ## Fidelity-time trade-off
#
# Lowering `final_fidelity` buys shorter gates. Each point reuses the
# previous solution as its warm start:

for f_min in (0.95,):
    qcp_tr = px.MinimumTimeProblem(qcp_mt, final_fidelity=f_min, D=10.0)
    qcp_tr.solve(max_iter=200, tol=1e-6, verbose=False)
    T2 = total_time(qcp_tr)
    print(f"F >= {f_min}: T = {T2:.2f}, F = {float(qcp_tr.fidelity()):.4f}")
    assert T2 <= T1 + 1e-6

# ## Changing the goal on the way (goal swap)
#
# `goal=` re-targets the fidelity constraint without rebuilding
# (reference: minimum_time_problem.jl:150-160 `_update_goal`) — useful
# when a solved problem should be tightened toward a nearby gate:

qcp_swap = px.MinimumTimeProblem(qcp, goal=px.GATES["SX"],
                                 final_fidelity=0.90, D=1.0)
assert qcp_swap is not None
print("minimum_time complete.")
