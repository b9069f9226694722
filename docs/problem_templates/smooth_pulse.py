# # SmoothPulseProblem
#
# The canonical collocation template for piecewise-constant (ZOH)
# pulses with smoothness enforced through chained derivative variables
# (reference: docs/literate/problem-templates/smooth_pulse.jl).
#
# ## When to use
#
# * You want the cheapest, most reliable template — ZOH collocation
#   dynamics are EXACT per interval.
# * Your hardware accepts piecewise-constant waveforms (AWGs), or you
#   will refine with `SplinePulseProblem` afterwards.
#
# ## What it builds
#
#   minimize   Q * infidelity(goal) + R_u ||u||^2 + R_du ||du||^2
#              + R_ddu ||ddu||^2
#   subject to U_{k+1} = expm(dt_k G(u_k)) U_k        (exact ZOH step)
#              u_{k+1} = u_k + dt_k du_k              (chained derivs)
#              du_{k+1} = du_k + dt_k ddu_k
#              |u| <= drive_bounds, |du| <= du_bound, |ddu| <= ddu_bound
#
# Run it:  python docs/problem_templates/smooth_pulse.py   (CPU, ~1 min)

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
                         drive_bounds=1.0)
T, N = 10.0, 50
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)

# ## Basic gate synthesis

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj = px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"])
qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)
assert float(qcp.fidelity()) > 0.999
print(f"basic:            F = {float(qcp.fidelity()):.6f}")

# ## With derivative bounds
#
# `du_bound` / `ddu_bound` cap slew rate and curvature — useful when
# hardware filters distort fast transitions:

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_slew = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N,
    Q=100.0, R=1e-2, du_bound=0.3, ddu_bound=0.3)
qcp_slew.solve(max_iter=150, tol=1e-7, verbose=False)
du = np.asarray(qcp_slew.traj["du"])
assert np.abs(du).max() <= 0.3 + 1e-6
assert float(qcp_slew.fidelity()) > 0.999
print(f"slew-limited:     F = {float(qcp_slew.fidelity()):.6f}, "
      f"max|du| = {np.abs(du).max():.3f}")

# ## Enabling free time (prerequisite for MinimumTimeProblem)
#
# `dt_bounds=(lo, hi)` makes the timestep a decision variable;
# `timesteps_all_equal=True` (the default) keeps all dt equal.

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_ft = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N,
    Q=100.0, R=1e-2, dt_bounds=(0.1, 0.4))
qcp_ft.solve(max_iter=150, tol=1e-7, verbose=False)
dts = np.asarray(qcp_ft.traj.get_timesteps())[:-1]
assert np.all(dts >= 0.1 - 1e-8) and np.all(dts <= 0.4 + 1e-8)
assert np.ptp(dts) < 1e-4          # all equal (to solver tolerance)
assert float(qcp_ft.fidelity()) > 0.999
print(f"free-time:        F = {float(qcp_ft.fidelity()):.6f}, "
      f"dt = {dts[0]:.4f}")

# ## Per-derivative regularization
#
# `R` is the uniform default; `R_u`, `R_du`, `R_ddu` override per
# order. Heavier R_ddu favors gently-curving pulses:

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_reg = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N,
    Q=100.0, R_u=1e-3, R_du=1e-2, R_ddu=1.0)
qcp_reg.solve(max_iter=150, tol=1e-7, verbose=False)
assert float(qcp_reg.fidelity()) > 0.999
ddu_heavy = float(np.square(np.asarray(qcp_reg.traj["ddu"])).sum())
ddu_light = float(np.square(np.asarray(qcp.traj["ddu"])).sum())
assert ddu_heavy < ddu_light
print(f"heavy R_ddu:      F = {float(qcp_reg.fidelity()):.6f}, "
      f"||ddu||^2 {ddu_light:.3f} -> {ddu_heavy:.3f}")

# ## Options record
#
# Tier-2 defaults come from `PiccoloOptions` (explicit kwargs win):

opts = px.PiccoloOptions(timesteps_all_equal=True,
                         zero_initial_and_final_derivative=True)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_opt = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N,
    Q=100.0, R=1e-2, options=opts)
qcp_opt.solve(max_iter=150, tol=1e-7, verbose=False)
du = np.asarray(qcp_opt.traj["du"])
assert np.abs(du[0]).max() < 1e-8 and np.abs(du[-1]).max() < 1e-8
assert float(qcp_opt.fidelity()) > 0.999
print(f"zero-boundary du: F = {float(qcp_opt.fidelity()):.6f}")
print("smooth_pulse complete.")
