# # Composing Templates
#
# Problem transforms wrap SOLVED problems, so they chain (reference:
# docs/literate/problem-templates/composition.jl). The full pipeline:
#
#     base (free time)  ->  + robustness  ->  minimum time
#
# Common patterns:
#   * Robust gate:        SmoothPulse -> Sampling
#   * Fast gate:          SmoothPulse -> MinimumTime
#   * Fast + robust gate: SmoothPulse -> Sampling -> MinimumTime
#   * Smooth hardware pulse: SmoothPulse -> Spline (warm start)
#
# Run it:  python docs/problem_templates/composition.py   (CPU, ~3 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402


def make_system(detuning):
    return px.QuantumSystem(0.5 * detuning * px.PAULIS["Z"],
                            [px.PAULIS["X"], px.PAULIS["Y"]],
                            drive_bounds=1.0)


def total_time(qcp):
    return float(np.sum(np.asarray(qcp.traj.get_timesteps())[:-1]))


# ## Step 1: base problem, free time enabled

T, N = 10.0, 40
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj = px.UnitaryTrajectory(make_system(0.0), pulse, px.GATES["X"])
qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2,
                            dt_bounds=(0.05, 0.5))
qcp.solve(max_iter=150, tol=1e-7, verbose=False)
print(f"base:          F = {float(qcp.fidelity()):.6f}, "
      f"T = {total_time(qcp):.2f}")
assert float(qcp.fidelity()) > 0.999

# ## Step 2: add robustness

samples = [make_system(d) for d in (-0.03, 0.0, 0.03)]
qcp_rob = px.SamplingProblem(qcp, samples)
qcp_rob.solve(max_iter=250, tol=1e-8, verbose=False)
F_rob = float(qcp_rob.fidelity())
print(f"robust:        F = {F_rob:.6f} (mean over samples)")
assert F_rob > 0.98, F_rob

# ## Step 3: minimize time (keeping the robustness structure)
#
# MinimumTimeProblem on a SamplingProblem keeps ALL per-sample
# dynamics and constrains the mean fidelity:

qcp_fast = px.MinimumTimeProblem(qcp_rob, final_fidelity=0.97, D=10.0)
qcp_fast.solve(max_iter=250, tol=1e-6, verbose=False)
T_fast = total_time(qcp_fast)
F_fast = float(qcp_fast.fidelity())
print(f"fast + robust: F = {F_fast:.6f}, T = {T_fast:.2f}")
assert T_fast < total_time(qcp), (T_fast, total_time(qcp))
assert F_fast > 0.95, F_fast

# ## Step 4: smooth hardware refinement (spline warm start)
#
# Convert the final ZOH solution into a C^0 linear spline and polish:

pulse_lin = px.LinearSplinePulse(np.asarray(qcp_fast.traj["u"]),
                                 np.asarray(qcp_fast.traj.get_times()))
qtraj_lin = px.UnitaryTrajectory(make_system(0.0), pulse_lin,
                                 px.GATES["X"])
qcp_lin = px.SplinePulseProblem(qtraj_lin, None, Q=100.0, R_du=0.1,
                                du_bound=10.0)
qcp_lin.solve(max_iter=100, tol=1e-7, verbose=False)
F_lin = float(qcp_lin.fidelity())
print(f"spline polish: F = {F_lin:.6f}")
assert F_lin > 0.99, F_lin
print("composition complete.")
