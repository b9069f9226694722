"""Isomorphism round-trips and convention checks against closed forms.

Mirrors the reference inline testitems for
src/quantum/primitives/isomorphisms.jl.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from piccolax.quantum import isomorphisms as iso
from piccolax.quantum.gates import GATES, PAULIS


def rand_complex(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_ket_iso_roundtrip():
    psi = rand_complex((5,))
    psi_iso = iso.ket_to_iso(psi)
    assert psi_iso.shape == (10,)
    np.testing.assert_allclose(iso.iso_to_ket(psi_iso), psi, atol=1e-14)


def test_operator_iso_vec_layout():
    # Column-major [Re(col); Im(col)] per column (reference isomorphisms.jl:110)
    U = rand_complex((3, 3))
    v = np.asarray(iso.operator_to_iso_vec(U))
    for col in range(3):
        np.testing.assert_allclose(v[col * 6:col * 6 + 3], U[:, col].real)
        np.testing.assert_allclose(v[col * 6 + 3:col * 6 + 6], U[:, col].imag)
    np.testing.assert_allclose(iso.iso_vec_to_operator(v), U, atol=1e-14)


def test_iso_operator_action_consistency():
    # iso(A) @ ket_to_iso(x) == ket_to_iso(A @ x)
    A = rand_complex((4, 4), 1)
    x = rand_complex((4,), 2)
    lhs = np.asarray(iso.iso(A)) @ np.asarray(iso.ket_to_iso(x))
    rhs = np.asarray(iso.ket_to_iso(A @ x))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_G_H_roundtrip():
    H = rand_complex((3, 3), 3)
    H = H + H.conj().T
    Gm = iso.G(H)
    np.testing.assert_allclose(np.asarray(iso.H_from_G(Gm)), H, atol=1e-12)
    # G action: G(H) @ iso(x) = iso(-i H x)
    x = rand_complex((3,), 4)
    lhs = np.asarray(Gm) @ np.asarray(iso.ket_to_iso(x))
    rhs = np.asarray(iso.ket_to_iso(-1j * H @ x))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_density_iso_vec_roundtrip():
    rho = rand_complex((3, 3), 5)
    rho = rho @ rho.conj().T
    rho /= np.trace(rho)
    v = iso.density_to_iso_vec(rho)
    np.testing.assert_allclose(np.asarray(iso.iso_vec_to_density(v)), rho,
                               atol=1e-14)


def test_compact_iso_roundtrip_and_lift():
    rho = rand_complex((4, 4), 6)
    rho = rho @ rho.conj().T
    rho /= np.trace(rho)
    x = iso.density_to_compact_iso(rho)
    assert x.shape == (16,)
    np.testing.assert_allclose(np.asarray(iso.compact_iso_to_density(x)), rho,
                               atol=1e-14)
    # Lift: L @ compact == full iso-vec; P @ L == I
    L = np.asarray(iso.density_lift_matrix(4))
    P = np.asarray(iso.density_projection_matrix(4))
    np.testing.assert_allclose(L @ np.asarray(x),
                               np.asarray(iso.density_to_iso_vec(rho)),
                               atol=1e-14)
    np.testing.assert_allclose(P @ L, np.eye(16), atol=1e-14)


def test_ad_vec_commutator():
    # ad_vec(H) @ vec(rho) == vec([H, rho]) with column-major vec
    H = rand_complex((3, 3), 7)
    rho = rand_complex((3, 3), 8)
    lhs = np.asarray(iso.ad_vec(H)) @ rho.T.reshape(-1)
    rhs = (H @ rho - rho @ H).T.reshape(-1)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_iso_D_trace_annihilation():
    # The dissipator preserves trace: tr(D[L] rho) = 0 for any rho
    L = rand_complex((3, 3), 9)
    D = np.asarray(iso.iso_D(L))
    rho = rand_complex((3, 3), 10)
    rho = rho + rho.conj().T
    v = np.asarray(iso.density_to_iso_vec(rho))
    dv = D @ v
    drho = np.asarray(iso.iso_vec_to_density(dv))
    assert abs(np.trace(drho)) < 1e-12


def test_var_G_block_structure():
    G0 = np.asarray(iso.G(PAULIS["Z"]))
    Ga = np.asarray(iso.G(PAULIS["X"]))
    V = np.asarray(iso.var_G(jnp.asarray(G0), [jnp.asarray(Ga)]))
    assert V.shape == (8, 8)
    np.testing.assert_allclose(V[:4, :4], G0)
    np.testing.assert_allclose(V[4:, 4:], G0)
    np.testing.assert_allclose(V[4:, :4], Ga)
    np.testing.assert_allclose(V[:4, 4:], 0.0)


def test_bloch_roundtrip():
    psi = rand_complex((2,), 11)
    psi /= np.linalg.norm(psi)
    b = iso.ket_to_bloch(psi)
    psi2 = iso.bloch_to_ket(b)
    # same state up to global phase
    assert abs(abs(np.vdot(np.asarray(psi2), psi)) - 1.0) < 1e-10


def test_gates_unitary():
    for name, U in GATES.items():
        np.testing.assert_allclose(U @ U.conj().T, np.eye(U.shape[0]),
                                   atol=1e-12, err_msg=name)
    np.testing.assert_allclose(GATES["SX"] @ GATES["SX"], GATES["X"], atol=1e-12)
