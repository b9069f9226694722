# # BangBangPulseProblem
#
# Switching-limited pulses via an L1 slack penalty on the drive
# derivative (reference: docs/literate/problem-templates/
# bang_bang_pulse.jl).
#
# ## When to use
#
# * Hardware with discrete amplitude levels (on/off switching).
# * You want pulses that sit at a few constant plateaus with few
#   transitions, instead of continuously-varying waveforms.
#
# ## How the L1 penalty works
#
# SmoothPulseProblem penalizes ||du||^2 (L2), which spreads change
# smoothly over time. BangBangPulseProblem penalizes ||du||_1 via
# non-negative slack splitting du = s+ - s-, which drives MOST du
# entries to exactly zero — the pulse becomes piecewise-flat with a
# few switches.
#
# Run it:  python docs/problem_templates/bang_bang_pulse.py (CPU, <1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

sys_q = px.QuantumSystem(np.zeros((2, 2)),
                         [0.5 * px.PAULIS["X"], 0.5 * px.PAULIS["Y"]],
                         drive_bounds=1.0)
T, N = 6.0, 25
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj = px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"])

# `R_bang` weighs the L1 switching penalty; larger values mean fewer,
# sharper switches (at some fidelity/regularity cost).

qcp = px.BangBangPulseProblem(qtraj, N, Q=100.0, R=1e-3, R_bang=1.0)
qcp.solve(max_iter=200, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
assert F > 0.995, F

# Count "active" derivative entries — with the L1 penalty most steps
# should be flat:

du = np.diff(np.asarray(qcp.traj["u"]), axis=0)
frac_flat = float(np.mean(np.abs(du) < 1e-3))
print(f"bang-bang: F = {F:.6f}, flat fraction = {frac_flat:.2f}")
assert frac_flat > 0.5, frac_flat

# Compare against the L2-smooth solution, which changes at almost
# every knot:

pulse2 = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_l2 = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse2, px.GATES["X"]), N,
    Q=100.0, R=1e-3)
qcp_l2.solve(max_iter=150, tol=1e-7, verbose=False)
du_l2 = np.diff(np.asarray(qcp_l2.traj["u"]), axis=0)
frac_flat_l2 = float(np.mean(np.abs(du_l2) < 1e-3))
print(f"smooth L2: F = {float(qcp_l2.fidelity()):.6f}, "
      f"flat fraction = {frac_flat_l2:.2f}")
assert frac_flat > frac_flat_l2
print("bang_bang_pulse complete.")
