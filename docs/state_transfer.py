# # State Transfer
#
# State-to-state transfer with `KetTrajectory` (reference:
# docs/literate/state_transfer.jl). Where `UnitaryTrajectory` optimizes
# a full gate, `KetTrajectory` optimizes one state mapping — useful for
# state preparation, and cheaper (state dim d instead of d^2).
#
# Run it:  python docs/state_transfer.py     (CPU, < 1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Single state transfer: |0> -> |1>

sys = px.QuantumSystem(
    0.5 * px.PAULIS["Z"],
    [px.PAULIS["X"], px.PAULIS["Y"]],
    drive_bounds=1.0,
)

T, N = 10.0, 50
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

# `ket_from_string` builds basis kets; "g"/"e" map to 0/1.

psi0 = px.quantum.ket_from_string("g", [2])
psi_goal = px.quantum.ket_from_string("e", [2])

qtraj = px.KetTrajectory(sys, pulse, psi0, psi_goal)
qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
print(f"|0> -> |1| transfer fidelity: {F:.6f}")
assert F > 0.999, F

# ## Multiple simultaneous transfers: a gate via state mappings
#
# `MultiKetTrajectory` tracks several initial/goal pairs under ONE
# shared pulse, with a *coherent* fidelity (phase-consistent across the
# pairs) — this is how you implement a gate when you only care about
# its action on a few states. Here: Hadamard-like mapping on the basis.

H = px.GATES["H"]
initials = [px.quantum.ket_from_string(s, [2]) for s in ("g", "e")]
goals = [H @ k for k in initials]

pulse2 = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj_multi = px.MultiKetTrajectory(sys, pulse2, initials, goals)
qcp_multi = px.SmoothPulseProblem(qtraj_multi, N, Q=100.0, R=1e-2)
qcp_multi.solve(max_iter=150, tol=1e-7, verbose=False)
F_multi = float(qcp_multi.fidelity())
print(f"coherent 2-state mapping fidelity: {F_multi:.6f}")
assert F_multi > 0.999, F_multi

# ## Validate with an independent rollout
#
# Re-integrate the extracted pulse through the rollout engine:

qt_check = qcp_multi.qtraj.rollout(qcp_multi.pulse, n_substeps=4)
F_roll = float(qt_check.fidelity())
assert abs(F_multi - F_roll) < 1e-5, (F_multi, F_roll)
print(f"independent rollout agrees: |dF| = {abs(F_multi - F_roll):.2e}")
print("state_transfer complete.")
