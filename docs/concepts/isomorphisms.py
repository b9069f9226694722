# # Isomorphisms
#
# How complex quantum objects become real vectors for the optimizer
# (reference: docs/literate/concepts/isomorphisms.jl).
#
# ## Why isomorphisms?
#
# NLP solvers work over real variables. piccolax therefore represents
# kets, unitaries, and density matrices as real "iso" vectors, and
# Hamiltonians as real generators G = iso(-iH), so the whole
# collocation problem — including all derivatives — is real arithmetic
# (which is also what the TPU's MXU natively prefers).
#
# Run it:  python docs/concepts/isomorphisms.py   (CPU, < 1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax.quantum import isomorphisms as iso   # noqa: E402

rng = np.random.default_rng(0)

# ## Ket states:  psi in C^d  <->  [Re(psi); Im(psi)] in R^{2d}

psi = rng.standard_normal(2) + 1j * rng.standard_normal(2)
psi /= np.linalg.norm(psi)
psi_iso = iso.ket_to_iso(psi)
assert psi_iso.shape == (4,)
np.testing.assert_allclose(np.asarray(iso.iso_to_ket(psi_iso)), psi,
                           atol=1e-14)

# ## Unitaries: column-stacked iso vectors in R^{2 d^2}

U = np.asarray(px.quantum.haar_random(2, rng=1))
u_iso = iso.operator_to_iso_vec(U)
assert u_iso.shape == (8,)
np.testing.assert_allclose(np.asarray(iso.iso_vec_to_operator(u_iso)), U,
                           atol=1e-14)

# ## Hamiltonians -> real generators
#
# Schrodinger's equation d/dt psi = -i H psi becomes the REAL linear
# system d/dt psi_iso = G psi_iso with G = iso(-iH):

H = 0.5 * px.PAULIS["Z"] + 0.3 * px.PAULIS["X"]
Gm = iso.G(H)
assert Gm.shape == (4, 4) and np.isrealobj(np.asarray(Gm))

# G respects the commutator structure and inverts back to H:

np.testing.assert_allclose(np.asarray(iso.H_from_G(Gm)), H, atol=1e-14)

dpsi = -1j * H @ psi
np.testing.assert_allclose(np.asarray(Gm @ psi_iso),
                           np.asarray(iso.ket_to_iso(dpsi)), atol=1e-13)

# ## Density matrices: the COMPACT isomorphism
#
# A Hermitian rho has only d^2 real degrees of freedom (not 2 d^2).
# `density_to_compact_iso` stores the diagonal + scaled off-diagonal
# real/imag parts — the minimal real embedding; `compact_iso_to_density`
# inverts it. Lindblad dynamics run in this compact space:

rho = np.outer(psi, psi.conj())
x = iso.density_to_compact_iso(rho)
assert x.shape == (4,)           # d^2 real numbers for d=2
np.testing.assert_allclose(np.asarray(iso.compact_iso_to_density(x)), rho,
                           atol=1e-14)

# The lift/projection matrices relate the compact space to the full
# 2d^2 iso-vec space:

L = iso.density_lift_matrix(2)
P = iso.density_projection_matrix(2)
np.testing.assert_allclose(np.asarray(P @ L), np.eye(4), atol=1e-14)

# ## Superoperators
#
# `ad_vec` vectorizes the Hamiltonian commutator; `iso_D` produces the
# real dissipator block for a Lindblad operator:

adH = iso.ad_vec(H)                  # complex [d^2, d^2] commutator
assert adH.shape == (4, 4)
rho_dot = -1j * (H @ rho - rho @ H)
np.testing.assert_allclose(
    np.asarray(-1j * adH @ rho.reshape(-1, order="F")),
    rho_dot.reshape(-1, order="F"), atol=1e-13)

# ## In practice
#
# Trajectory components store iso vectors — here is the manual
# round trip on an optimized problem's final state:

sys_q = px.QuantumSystem(None, [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
times = np.linspace(0, 5, 30)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((30, 2)), times)
qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"]), 30,
    Q=100.0, R=1e-2)
qcp.solve(max_iter=80, tol=1e-7, verbose=False)
U_final = iso.iso_vec_to_operator(qcp.traj["U"][-1])
F_manual = float(px.unitary_fidelity(U_final,
                                     jax.numpy.asarray(px.GATES["X"])))
# traj["U"] satisfies the collocation dynamics to solver tolerance,
# while fidelity() re-rolls out the extracted pulse exactly — they
# agree to the KKT residual level:
assert abs(F_manual - float(qcp.fidelity())) < 1e-5
print(f"manual fidelity from iso components: {F_manual:.6f}")
print("isomorphisms complete.")
