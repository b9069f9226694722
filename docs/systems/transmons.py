# # Transmon Systems
#
# Working with superconducting transmon qubits (reference:
# docs/literate/systems/transmons.jl).
#
# Run it:  python docs/systems/transmons.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## The model
#
# Rotating frame Duffing oscillator:
#
#     H = (omega - omega_frame) n - (delta/2) n(n-1)
#         + u1 (a + a') + u2 i(a - a')
#
# Best practices (reference transmon guide):
#   1. model >= 3 levels so leakage is visible to the optimizer;
#   2. work in the rotating frame (omega_frame = omega) — timesteps
#      can then resolve the MHz-scale anharmonicity instead of the
#      GHz-scale qubit frequency.

sys3 = px.quantum.TransmonSystem(omega=4.0, delta=0.2, levels=3,
                                 drive_bounds=0.2)
drift = np.asarray(sys3.get_drift())
# rotating frame: no omega * n term left, only the anharmonicity
np.testing.assert_allclose(drift[1, 1], 0.0, atol=1e-12)
assert abs(drift[2, 2]) > 0       # -delta * 2pi on |2>

# Lab-frame variants exist for pulse-level realism studies:

sys_lab = px.quantum.TransmonSystem(omega=4.0, delta=0.2, levels=3,
                                    lab_frame=True)
assert abs(np.asarray(sys_lab.get_drift())[1, 1]) > 1.0

# ## Single-qubit gate with leakage handling

N, T = 50, 10.0
goal = px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=3)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)),
                          np.linspace(0, T, N))
qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys3, pulse, goal), N, Q=100.0, R=1e-2,
    options=px.PiccoloOptions(leakage_cost=1.0))
qcp.solve(max_iter=120, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
print(f"3-level X gate: F = {F:.6f}")
assert F > 0.995, F

# ## Two coupled transmons
#
# `MultiTransmonSystem` builds the pairwise-dipole-coupled chain; see
# docs/two_qubit_gate_validation.py for the full CNOT synthesis +
# independent validation.

gs = np.array([[0.0, 0.1], [0.1, 0.0]])
sys2q = px.quantum.MultiTransmonSystem([4.0, 4.1], [0.2, 0.2], gs,
                                       levels_per_transmon=2,
                                       drive_bounds=0.1)
assert px.quantum.is_reachable(px.GATES["CX"], sys2q)

# ## Transmon + cavity
#
# Dispersive cavity QED with cross-Kerr — the workhorse for bosonic
# encodings:

tc = px.quantum.TransmonCavitySystem(qubit_levels=3, cavity_levels=6)
assert tc.levels == 18 and tc.n_drives == 4
print("transmons complete.")
