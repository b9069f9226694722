# # Quickstart: quantum optimal control with piccolax
#
# This executable tutorial mirrors the reference quickstart
# (reference: docs/literate/quickstart.jl): define a quantum system,
# pick a pulse parameterization, set a gate goal, solve the collocation
# problem, tighten it into a minimum-time problem, and validate the
# result with an independent rollout.
#
# Run it:  python docs/quickstart.py          (CPU, ~1 min)
# It doubles as an integration test — every quality bar is asserted.

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# piccolax's solver runs in float64 on CPU (and float32 on TPU).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Step 1: define the quantum system
#
# Drift Hamiltonian (always on), drive Hamiltonians (controllable),
# and drive amplitude bounds:

H_drift = 0.5 * px.PAULIS["Z"]
H_drives = [px.PAULIS["X"], px.PAULIS["Y"]]
sys = px.QuantumSystem(H_drift, H_drives, 1.0)

# ## Step 2: create an initial pulse
#
# `ZeroOrderPulse` is piecewise-constant (ZOH). Any small random guess
# works — the state initial guess comes from rolling it out.

T, N = 10.0, 100
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.1 * rng.standard_normal((N, 2)), times)

# ## Step 3: define the goal via a trajectory
#
# A `UnitaryTrajectory` bundles system + pulse + target gate and solves
# the rollout ODE at construction; `fidelity()` is then O(1).

qtraj = px.UnitaryTrajectory(sys, pulse, px.GATES["X"])
print(f"initial fidelity: {float(qtraj.fidelity()):.6f}")

# ## Step 4: set up and solve the optimization problem
#
# `SmoothPulseProblem` builds the collocation NLP: fidelity objective
# (weight Q), quadratic regularizers (R), chained derivative variables
# du/ddu for smoothness. `solve()` runs the batched interior-point
# method and re-syncs the trajectory (globals -> pulse -> rollout).

qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2, ddu_bound=1.0,
                            dt_bounds=(0.05, 0.2))
qcp.solve(max_iter=150, tol=1e-7, verbose=True)
F = float(qcp.fidelity())
print(f"optimized fidelity: {F:.6f}")
assert F > 0.999, F

# ## Step 5: validate with an independent rollout
#
# The optimizer maximizes the fidelity of the *discrete* collocation
# dynamics; re-integrating the extracted pulse through the rollout
# engine (with substeps) guards against discretization error.

from piccolax.quantum import dynamics as dyn   # noqa: E402
import jax.numpy as jnp                        # noqa: E402

tt = np.asarray(qcp.traj.get_times())
Froll = float(dyn.unitary_rollout_fidelity(
    sys, qcp.traj["u"], tt, jnp.asarray(px.GATES["X"]),
    interpolation="constant"))
assert abs(F - Froll) < 1e-5, (F, Froll)
print(f"independent rollout agrees: |dF| = {abs(F - Froll):.2e}")

# ## Step 6: transform into a minimum-time problem
#
# Problem transforms compose: `MinimumTimeProblem` reuses the solved
# trajectory as a warm start, adds D*sum(dt) to the objective, and a
# terminal fidelity inequality constraint.

qcp_mt = px.MinimumTimeProblem(qcp, final_fidelity=0.99, D=10.0)
qcp_mt.solve(max_iter=150, tol=1e-6, verbose=True)
T_opt = float(np.sum(np.asarray(qcp_mt.traj.get_timesteps())[:-1]))
F_mt = float(qcp_mt.fidelity())
print(f"minimum-time: T {T:.2f} -> {T_opt:.2f} at fidelity {F_mt:.4f}")
assert F_mt > 0.985, F_mt
assert T_opt < T, (T_opt, T)

# ## Step 7: save / reload the pulse
#
# Pulses serialize to .npz for calibration workflows and warm starts.

import tempfile, os                            # noqa: E402

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "x_gate_pulse.npz")
    px.save_pulse(path, qcp_mt.pulse)
    reloaded = px.load_pulse(path)
    np.testing.assert_allclose(np.asarray(reloaded.values),
                               np.asarray(qcp_mt.pulse.values))
print("quickstart complete.")
