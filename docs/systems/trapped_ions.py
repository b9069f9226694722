# # Trapped Ions
#
# Ion-chain systems and Molmer-Sorensen entangling gates (reference:
# docs/literate/systems/trapped_ions.jl). This doc also exercises the
# NONLINEAR drive path end-to-end: amplitude/phase controls enter the
# Hamiltonian through a nonlinear coefficient whose derivatives flow
# through the collocation by autodiff.
#
# Run it:  python docs/systems/trapped_ions.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Ion chain: qubits + shared motional modes

ion = px.quantum.IonChainSystem(N_ions=2, ion_levels=2, N_modes=1,
                                mode_levels=4, eta=0.1)
assert ion.levels == 2 * 2 * 4
assert ion.n_drives == 4           # X/Y pair per ion

# ## Radial Molmer-Sorensen gate systems
#
# `RadialMSGateSystem`: per-ion AMPLITUDE controls with cos/sin
# sideband time modulation (a time-dependent system — note
# `time_dependent=True`):

ms = px.quantum.RadialMSGateSystem(N_ions=2, mode_levels=3, delta=0.2,
                                   eta=0.1)
assert ms.time_dependent
assert ms.n_drives == 2

# `RadialMSGateSystemWithPhase`: per-ion (amplitude, phase) pairs —
# the drive coefficient is Omega_j * cos(phi_j), a NONLINEAR function
# of the controls:

msp = px.quantum.RadialMSGateSystemWithPhase(N_ions=2, mode_levels=3)
assert msp.n_drives == 4
from piccolax.quantum.systems import NonlinearDrive   # noqa: E402
# sideband time-modulation wraps the nonlinear amp/phase coefficient:
assert any(isinstance(getattr(t, "drive", t), NonlinearDrive)
           for t in msp.get_drive_terms())

# ## A nonlinear-drive solve, end to end
#
# The full MS system is large; the nonlinear-coefficient machinery is
# identical on a single qubit with polar controls:
#
#     H(u) = amp * cos(phi) * X/2 + amp * sin(phi) * Y/2
#
# The optimizer works in (amp, phi) coordinates; Jacobians/Hessians of
# the coefficients come from JAX autodiff (no hand derivatives):

from piccolax.quantum.systems import PolarCoeff   # noqa: E402

drives = [
    NonlinearDrive(np.asarray(px.PAULIS["X"]) / 2,
                   f=PolarCoeff(0, 1, "cos"), active_controls=(0, 1)),
    NonlinearDrive(np.asarray(px.PAULIS["Y"]) / 2,
                   f=PolarCoeff(0, 1, "sin"), active_controls=(0, 1)),
]
sys_polar = px.QuantumSystem(np.zeros((2, 2)), drives, n_drives=2,
                             drive_bounds=[(0.0, 1.0), (-np.pi, np.pi)])

N, T = 40, 8.0
times = np.linspace(0, T, N)
rng = np.random.default_rng(0)
u0 = np.stack([0.3 + 0.05 * rng.random(N),
               0.1 * rng.standard_normal(N)], axis=1)
pulse = px.ZeroOrderPulse(u0, times)
qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_polar, pulse, px.GATES["H"]), N,
    Q=100.0, R=1e-2)
qcp.solve(max_iter=150, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
print(f"polar-control H gate (nonlinear drives): F = {F:.6f}")
assert F > 0.999, F

# amplitude bound respected (one-sided bound [0, 1]):

amp = np.asarray(qcp.traj["u"])[:, 0]
assert amp.min() >= -1e-8 and amp.max() <= 1.0 + 1e-8

# independent rollout cross-check through the same nonlinear system:

qt = qcp.qtraj.rollout(qcp.pulse, n_substeps=4)
assert abs(float(qt.fidelity()) - F) < 1e-6
print("trapped_ions complete.")
