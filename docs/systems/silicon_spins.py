# # Silicon Spins: Exchange-Only Qubits
#
# Exchange-only (EO) logical qubits in silicon quantum dots
# (reference: docs/literate/systems/silicon_spins.jl — the reference
# sketches the physics and a planned API; here we build the projected
# model directly with `QuantumSystem`, which needs no dedicated
# template).
#
# ## The model
#
# Three electron spins encode a logical qubit in the S = 1/2,
# S_z = +1/2 subspace. Nearest-neighbor exchange couplings J12, J23
# are the ONLY controls; projected into the logical subspace:
#
#     H_eff = (J12 + J23)/4 I + (J12 - J23)/4 sigma_z
#             + (sqrt(3)/4) J23 sigma_x
#
# Exchange is always >= 0 — one-sided control bounds, which the
# interior-point solver handles natively.
#
# Run it:  python docs/systems/silicon_spins.py   (CPU, ~1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Building the projected EO qubit
#
# Controls u = (J12, J23) in GHz, each in [0, 2]. The identity part
# only contributes a global phase; the physical drives are:
#
#     H(u) = u1 * (Z/4) + u2 * (-Z/4 + sqrt(3) X / 4)

Hz = np.asarray(px.PAULIS["Z"]) / 4
Hx = np.asarray(px.PAULIS["X"]) * np.sqrt(3) / 4

sys_eo = px.QuantumSystem(
    np.zeros((2, 2)),
    [Hz, Hx - Hz],                       # J12-drive, J23-drive
    drive_bounds=[(0.0, 2.0), (0.0, 2.0)],
)

# Despite only-positive couplings, the two drive axes span su(2):

assert px.quantum.is_reachable(px.GATES["H"], sys_eo)

# ## Synthesize a Hadamard from exchange pulses

N, T = 50, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
u0 = 0.3 + 0.05 * rng.random((N, 2))     # start strictly inside [0, 2]
pulse = px.ZeroOrderPulse(u0, times)

qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_eo, pulse, px.GATES["H"]), N,
    Q=100.0, R=1e-2, free_phase=True)    # global phase is unphysical
qcp.solve(max_iter=150, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
print(f"EO Hadamard from exchange-only control: F = {F:.6f}")
assert F > 0.999, F

# exchange stayed physical (non-negative):

u = np.asarray(qcp.traj["u"])
assert u.min() >= -1e-6, u.min()   # >= 0 to solver tolerance
print(f"J range: [{u.min():.3f}, {u.max():.3f}] GHz (bounds [0, 2])")

# ## Typical parameters (reference table)
#
# | Parameter        | Typical value | Unit |
# |------------------|---------------|------|
# | Exchange J       | 0.1 - 10      | GHz  |
# | Gate time        | 1 - 100       | ns   |
# | T2* (dephasing)  | 1 - 10        | us   |
# | T1 (relaxation)  | 0.1 - 10      | ms   |
#
# Dephasing-aware optimization: wrap the system in an
# `OpenQuantumSystem` with a sigma_z dissipator at rate 1/T2* and
# switch to `DensityTrajectory` (see docs/concepts/trajectories.py).
print("silicon_spins complete.")
