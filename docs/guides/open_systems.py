# # Open Quantum Systems
#
# Optimal control under dissipation: Lindblad master-equation
# collocation (reference: open-system coverage across
# docs/literate/concepts + the OpenQuantumSystem layer).
#
# ## The model
#
#     d rho/dt = -i [H(u), rho]
#                + sum_k ( L_k rho L_k' - {L_k' L_k, rho}/2 )
#
# piccolax vectorizes rho in the COMPACT real isomorphism (d^2 real
# numbers — see docs/concepts/isomorphisms.py) and propagates with the
# same exponential-integrator collocation as the closed-system path.
#
# Run it:  python docs/guides/open_systems.py   (CPU, ~3 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax.quantum.systems import (LinearDissipator,   # noqa: E402
                                      NonlinearDissipator)

# ## Building open systems
#
# Jump operators enter via `dissipation_operators` (rate baked into
# the operator) or typed `dissipators` (explicit rates):

a = px.quantum.annihilate(3)
base = px.quantum.TransmonSystem(levels=3, drive_bounds=0.2)
sys_open = px.OpenQuantumSystem(
    drift_terms=base.drift_terms,
    H_drives=[d.H for d in base.get_drive_terms()],
    drive_bounds=0.2,
    dissipators=[LinearDissipator(a, 0.01)])    # T1 decay, gamma=0.01

# Control-DEPENDENT dissipation (e.g. drive-induced heating) uses
# `NonlinearDissipator` with a rate function of u:

sys_heat = px.OpenQuantumSystem(
    drift_terms=base.drift_terms,
    H_drives=[d.H for d in base.get_drive_terms()],
    drive_bounds=0.2,
    dissipators=[LinearDissipator(a, 0.01),
                 NonlinearDissipator(a.conj().T @ a,
                                     rate_fn=lambda u: 1e-3 * (u @ u))])
assert sys_heat.dissipators[1].control_dependent

# ## Lindblad state transfer: |0> -> |1> against decay
#
# This is BASELINE benchmark config 5 (bench.py); here at docs scale.

N, T = 40, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

rho0 = np.diag([1.0, 0.0, 0.0]).astype(complex)
rho_goal = np.diag([0.0, 1.0, 0.0]).astype(complex)

qtraj = px.DensityTrajectory(sys_open, pulse, rho0, rho_goal)
qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp.solve(max_iter=150, tol=1e-6, verbose=False)
F = float(qcp.fidelity())
print(f"lossy |0> -> |1> transfer: F = {F:.4f}")
assert F > 0.95, F

# Against decay the fidelity saturates below 1 — the optimizer fights
# gamma * T, it cannot cancel it. The trace stays exactly 1 (CPTP
# dynamics in the compact iso preserve it):

from piccolax.quantum import isomorphisms as iso   # noqa: E402

rho_T = np.asarray(iso.compact_iso_to_density(qcp.traj["rho"][-1]))
np.testing.assert_allclose(np.real(np.trace(rho_T)), 1.0, atol=1e-6)
print(f"final-state trace: {np.real(np.trace(rho_T)):.8f}")

# ## Validating against an independent integrator

from piccolax.quantum import dynamics as dyn   # noqa: E402

rhos_ref = dyn.rollout_with_scipy(sys_open, qcp.pulse,
                                  np.asarray(qcp.traj.get_times()),
                                  rho0)
F_ref = float(px.density_fidelity(jax.numpy.asarray(rhos_ref[-1]),
                                  jax.numpy.asarray(rho_goal)))
assert abs(F - F_ref) < 1e-3, (F, F_ref)
print(f"scipy Lindblad cross-check: |dF| = {abs(F - F_ref):.2e}")
print("open_systems complete.")
