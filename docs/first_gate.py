# # Your First Gate
#
# Synthesize an X gate (NOT gate) on a single qubit — the "hello world"
# of quantum optimal control (reference: docs/literate/first_gate.jl).
#
# We want control pulses u_x(t), u_y(t) implementing
#
#     X = [[0, 1], [1, 0]]
#
# for a qubit with Hamiltonian
#
#     H(t) = (omega/2) sigma_z + u_x(t) sigma_x + u_y(t) sigma_y .
#
# Run it:  python docs/first_gate.py        (CPU, < 1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Step 1: the system
#
# The drift is always on; the drives are what the optimizer shapes.
# `drive_bounds=1.0` bounds |u_i(t)| <= 1 (a hardware amplitude limit).

omega = 1.0
sys = px.QuantumSystem(
    0.5 * omega * px.PAULIS["Z"],
    [px.PAULIS["X"], px.PAULIS["Y"]],
    drive_bounds=1.0,
)
print(f"system: {sys.levels} levels, {sys.n_drives} drives")

# Before optimizing, check the gate is even reachable with these
# controls — `is_reachable` computes the dynamical Lie algebra:

assert px.quantum.is_reachable(px.GATES["X"], sys)

# ## Step 2: an initial pulse
#
# Any small random guess works; `ZeroOrderPulse` holds each value
# constant over its knot interval (piecewise-constant / ZOH).

T, N = 10.0, 50
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

# ## Step 3: goal + problem + solve
#
# `UnitaryTrajectory` bundles system, pulse, and target gate.
# `SmoothPulseProblem` is the canonical template: terminal infidelity
# objective (weight Q), quadratic regularizers on u/du/ddu (R), and
# bounds on the derivative variables for smoothness.

qtraj = px.UnitaryTrajectory(sys, pulse, px.GATES["X"])
print(f"fidelity before: {float(qtraj.fidelity()):.6f}")

qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2, ddu_bound=1.0)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)

F = float(qcp.fidelity())
print(f"fidelity after:  {F:.6f}")
assert F > 0.999, F

# ## Step 4: sanity-check the result
#
# The collocation fidelity should agree with an independent rollout of
# the extracted pulse (exact for ZOH dynamics):

from piccolax.quantum import dynamics as dyn   # noqa: E402
import jax.numpy as jnp                        # noqa: E402

Froll = float(dyn.unitary_rollout_fidelity(
    sys, qcp.traj["u"], np.asarray(qcp.traj.get_times()),
    jnp.asarray(px.GATES["X"]), interpolation="constant"))
assert abs(F - Froll) < 1e-6, (F, Froll)

# The optimized controls respect the bounds:

u = np.asarray(qcp.traj["u"])
assert np.all(np.abs(u) <= 1.0 + 1e-8)
print(f"max |u| = {np.abs(u).max():.3f} (bound 1.0)")
print("first_gate complete.")
