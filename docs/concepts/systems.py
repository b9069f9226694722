# # Quantum Systems
#
# The `QuantumSystem` model and its variants (reference:
# docs/literate/concepts/systems.jl).
#
# ## The Hamiltonian model
#
#     H(t) = H_drift + sum_j c_j(u(t), t) H_j
#
# Linear drives have c_j = u_j(t); typed drives allow nonlinear and
# time-modulated coefficients.
#
# Run it:  python docs/concepts/systems.py   (CPU, < 1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Construction variants

# Full specification (linear drives):
sys_full = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                            [px.PAULIS["X"], px.PAULIS["Y"]],
                            drive_bounds=1.0)

# No drift (pure control):
sys_nodrift = px.QuantumSystem(None, [px.PAULIS["X"]], drive_bounds=1.0)

# No drives (free evolution):
sys_free = px.QuantumSystem(px.PAULIS["Z"], [])

assert sys_full.n_drives == 2
assert sys_nodrift.n_drives == 1
assert sys_free.n_drives == 0
print("levels:", sys_full.levels, "| n_drives:", sys_full.n_drives)

# ## Drive bounds
#
# A scalar bound is symmetric and uniform; per-drive and asymmetric
# forms are accepted too:

sys_b1 = px.QuantumSystem(None, [px.PAULIS["X"], px.PAULIS["Y"]],
                          drive_bounds=[0.5, 2.0])
lo, hi = np.asarray(sys_b1.drive_bounds).T
np.testing.assert_allclose(lo, [-0.5, -2.0])
np.testing.assert_allclose(hi, [0.5, 2.0])

# ## Typed drives (nonlinear coefficients)
#
# `LinearDrive`, `NonlinearDrive`, `ModulatedDrive`, and `DriftTerm`
# compose arbitrary control structure. A NonlinearDrive's coefficient
# is any jax-traceable function of the controls — its derivatives flow
# through the collocation automatically (no hand-written Jacobians):

from piccolax.quantum.systems import (LinearDrive,   # noqa: E402
                                      NonlinearDrive)

drives = [
    LinearDrive(px.PAULIS["X"], index=0),
    # coefficient u0*u1 (an intermodulation term):
    NonlinearDrive(px.PAULIS["Y"], lambda u: u[0] * u[1]),
]
sys_typed = px.QuantumSystem(0.1 * px.PAULIS["Z"], drives, n_drives=2,
                             drive_bounds=1.0)
assert sys_typed.n_drives == 2

# The Hamiltonian at a control point:

H = sys_typed.H(np.array([0.3, 0.5]))
expected = (0.1 * px.PAULIS["Z"] + 0.3 * px.PAULIS["X"]
            + 0.15 * px.PAULIS["Y"])
np.testing.assert_allclose(np.asarray(H), expected, atol=1e-12)
print("typed-drive H(u) matches analytic form")

# ## Open systems
#
# `OpenQuantumSystem` adds dissipators; the Lindbladian generator acts
# on density matrices in the compact isomorphism:

a = px.quantum.annihilate(2)
open_sys = px.OpenQuantumSystem(0.5 * px.PAULIS["Z"], [px.PAULIS["X"]],
                                drive_bounds=1.0,
                                dissipation_operators=[0.1 * a])
assert len(open_sys.dissipators) == 1

# ## Composite systems
#
# `CompositeQuantumSystem` lifts subsystems into the joint space and
# adds couplings (see docs/systems/transmons.py for a full example):

q1 = px.QuantumSystem(None, [px.PAULIS["X"]], drive_bounds=1.0)
q2 = px.QuantumSystem(None, [px.PAULIS["X"]], drive_bounds=1.0)
H_c = 0.1 * np.kron(px.PAULIS["Z"], px.PAULIS["Z"])
comp = px.CompositeQuantumSystem([q1, q2], H_drift=H_c)
assert comp.levels == 4 and comp.n_drives == 2
print("composite:", comp.levels, "levels,", comp.n_drives, "drives")

# ## Controllability
#
# `operator_algebra` computes the dynamical Lie algebra;
# `is_reachable` answers the synthesis question before you optimize:

assert px.quantum.is_reachable(px.GATES["X"], sys_full)
print("systems complete.")
