"""System templates, encodings, and controllability utilities.

Mirrors the reference template testitems (construction/dispatch checks +
physics sanity; SURVEY.md section 4).
"""

import numpy as np
import pytest

import piccolax as px
from piccolax.quantum import encodings as enc_mod
from piccolax.quantum.system_utils import is_reachable, operator_algebra


def _hermitian(M):
    return np.allclose(M, np.conj(M).T, atol=1e-10)


def test_transmon_system():
    sys = px.TransmonSystem(levels=3)
    assert sys.levels == 3
    assert sys.n_drives == 2
    H = np.asarray(sys.H(np.array([0.1, 0.2])))
    assert _hermitian(H)
    # rotating frame at omega: drift is pure anharmonicity
    H0 = np.asarray(sys.get_drift())
    np.testing.assert_allclose(H0[1, 1], 0.0, atol=1e-10)
    np.testing.assert_allclose(H0[2, 2], -2 * np.pi * 0.2, atol=1e-10)


def test_transmon_lab_frames():
    for t in ("duffing", "quartic", "cosine"):
        sys = px.TransmonSystem(levels=4, lab_frame=True, lab_frame_type=t)
        assert _hermitian(np.asarray(sys.get_drift())), t


def test_multi_transmon_system():
    gs = np.zeros((2, 2))
    gs[0, 1] = 0.1
    sys = px.MultiTransmonSystem([4.0, 4.2], [0.2, 0.21], gs,
                                 levels_per_transmon=2)
    assert sys.levels == 4
    assert sys.n_drives == 4
    assert _hermitian(np.asarray(sys.H(np.zeros(4))))


def test_transmon_cavity_system():
    sys = px.TransmonCavitySystem(qubit_levels=3, cavity_levels=5)
    assert sys.levels == 15
    assert sys.n_drives == 4
    assert _hermitian(np.asarray(sys.H(np.zeros(4))))


def test_ion_chain_system():
    sys = px.IonChainSystem(N_ions=2, N_modes=1, mode_levels=4)
    assert sys.levels == 2 * 2 * 4
    assert sys.n_drives == 4
    assert _hermitian(np.asarray(sys.H(np.array([0.1, 0.2, 0.3, 0.4]))))
    H_MS = px.MolmerSorensenCoupling(2, 1, 2, 4)
    assert _hermitian(H_MS)


def test_radial_ms_system():
    sys = px.RadialMSGateSystem(N_ions=2, mode_levels=2)
    assert sys.n_drives == 2
    assert sys.time_dependent
    H = np.asarray(sys.H(np.array([0.5, 0.5]), 0.3))
    assert _hermitian(H)
    sysp = px.RadialMSGateSystemWithPhase(N_ions=2, mode_levels=2)
    assert sysp.n_drives == 4
    assert _hermitian(np.asarray(sysp.H(np.array([0.5, 0.5, 0.1, -0.2]), 0.3)))


def test_rydberg_chain():
    sys = px.RydbergChainSystem(N=3, all2all=True)
    assert sys.levels == 8
    assert sys.n_drives == 3
    H0 = np.asarray(sys.get_drift())
    assert _hermitian(H0)
    # blockade: |rr...> states have large positive energy
    assert H0[-1, -1].real > 0


def test_cat_system():
    sys = px.CatSystem(cat_levels=6, buffer_levels=2)
    assert sys.levels == 12
    assert sys.n_drives == 2
    assert len(sys.dissipators) == 2
    alpha = 1.5
    psi = px.coherent_ket(alpha, 10)
    np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-12)
    # coherent state is an approximate eigenstate of a with eigenvalue alpha
    a = px.annihilate(10)
    ratio = (a @ psi)[:8] / psi[:8]
    np.testing.assert_allclose(ratio, alpha, rtol=1e-6)
    controls = px.get_cat_controls(sys, 2.0, 5)
    assert controls.shape == (5, 2)


def test_dual_rail_encoding():
    enc = px.DualRailEncoding(n_qubits=1)
    assert enc.n_rails == 2
    T, idxs = enc_mod.subspace_transform(enc)
    np.testing.assert_allclose(T.conj().T @ T, np.eye(len(idxs)), atol=1e-12)
    states = enc_mod.logical_basis_states(enc)
    # |0>_L = |10>, |1>_L = |01> in the (rail0, rail1) kron basis
    assert states[0][enc_mod._occ_to_index([1, 0], [2, 2])] == 1.0
    assert states[1][enc_mod._occ_to_index([0, 1], [2, 2])] == 1.0
    # target states of logical X swap them
    tx = px.target_states("X", enc)
    np.testing.assert_allclose(tx[0], states[1], atol=1e-12)
    np.testing.assert_allclose(tx[1], states[0], atol=1e-12)
    emb = enc_mod.embedded_gate("X", enc)
    assert emb.operator.shape == (4, 4)


def test_operator_algebra_su2():
    basis = operator_algebra([px.PAULIS["X"], px.PAULIS["Y"]])
    assert len(basis) == 3  # closes to su(2)


def test_is_reachable():
    # X,Y drives reach any SU(2) gate
    sys = px.QuantumSystem(np.zeros((2, 2)),
                           [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    assert is_reachable(px.GATES["H"], sys)
    # a single Z drive cannot reach X
    assert not is_reachable(px.GATES["X"], [px.PAULIS["Z"]])
