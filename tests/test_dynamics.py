"""Rollout engine vs analytic ground truths.

Mirrors the reference test discipline (SURVEY.md section 4): analytic X-gate
reproduction, unitarity preservation, cross-representation consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np

from piccolax.ops.expm import expm, expm_pade_fixed
from piccolax.quantum import dynamics as dyn
from piccolax.quantum.gates import GATES, PAULIS
from piccolax.quantum.pulses import GaussianPulse, ZeroOrderPulse
from piccolax.quantum.systems import LinearDissipator, OpenQuantumSystem, QuantumSystem


def make_qubit_system(drive_bound=1.0):
    return QuantumSystem(
        H_drift=np.zeros((2, 2)),
        H_drives=[PAULIS["X"], PAULIS["Y"]],
        drive_bounds=drive_bound,
    )


def test_expm_matches_scipy():
    import scipy.linalg as sla
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))
    np.testing.assert_allclose(np.asarray(expm(jnp.asarray(A))), sla.expm(A),
                               atol=1e-10)
    # fixed-order path on a scaled matrix
    B = 0.5 * A / np.linalg.norm(A)
    np.testing.assert_allclose(
        np.asarray(expm_pade_fixed(jnp.asarray(B), order=7, squarings=2)),
        sla.expm(B), atol=1e-12)


def test_analytic_x_gate():
    # Constant pi/2-area sigma_x pulse over T implements X up to phase:
    # exp(-i (pi/2) sigma_x) = -i X  ->  fidelity 1 with X
    sys = make_qubit_system()
    T, N = 2.0, 21
    times = np.linspace(0, T, N)
    amp = (np.pi / 2) / T
    us = np.stack([np.full(N, amp), np.zeros(N)], axis=1)
    pulse = ZeroOrderPulse(us, times)
    Us = dyn.unitary_rollout(sys, pulse, times)
    F = dyn.unitary_fidelity(Us[-1], jnp.asarray(GATES["X"]))
    assert float(F) > 1 - 1e-10


def test_unitarity_preservation():
    sys = make_qubit_system()
    T, N = 10.0, 51
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(1)
    us = 0.3 * rng.standard_normal((N, 2))
    pulse = ZeroOrderPulse(us, times)
    Us = np.asarray(dyn.unitary_rollout(sys, pulse, times))
    for U in Us:
        np.testing.assert_allclose(U @ U.conj().T, np.eye(2), atol=1e-8)


def test_zoh_vs_magnus_agreement():
    # For ZOH controls, exact piecewise-constant propagation should agree
    # with the substepped Magnus integrator.
    sys = make_qubit_system()
    T, N = 5.0, 26
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(2)
    us = 0.4 * rng.standard_normal((N, 2))
    pulse = ZeroOrderPulse(us, times)
    U_exact = dyn.unitary_rollout(sys, pulse, times, method="zoh")
    U_magnus = dyn.unitary_rollout(sys, pulse, times, method="magnus4",
                                   n_substeps=4)
    np.testing.assert_allclose(np.asarray(U_exact[-1]),
                               np.asarray(U_magnus[-1]), atol=1e-8)


def test_magnus_convergence_smooth_pulse():
    # Smooth (Gaussian) pulse: Magnus-4 should converge ~h^4.
    sys = make_qubit_system()
    T = 4.0
    pulse = GaussianPulse(jnp.array([0.8, 0.3]), 0.8, T)
    times = np.linspace(0, T, 2)
    U_ref = dyn.unitary_rollout(sys, pulse, times, method="magnus4",
                                n_substeps=512)[-1]
    errs = []
    for S in (8, 16):
        U = dyn.unitary_rollout(sys, pulse, times, method="magnus4",
                                n_substeps=S)[-1]
        errs.append(np.linalg.norm(np.asarray(U - U_ref)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.5, f"Magnus4 convergence rate {rate}"


def test_ket_unitary_density_consistency():
    # ket, unitary, and (dissipator-free) density rollouts must agree.
    sys = make_qubit_system()
    osys = OpenQuantumSystem(
        H_drift=np.zeros((2, 2)),
        H_drives=[PAULIS["X"], PAULIS["Y"]],
        drive_bounds=1.0,
    )
    T, N = 3.0, 16
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(3)
    us = 0.5 * rng.standard_normal((N, 2))
    pulse = ZeroOrderPulse(us, times)
    psi0 = jnp.array([1.0 + 0j, 0.0])

    Us = dyn.unitary_rollout(sys, pulse, times)
    psis = dyn.ket_rollout(sys, pulse, times, psi0)
    np.testing.assert_allclose(np.asarray(psis),
                               np.asarray(Us @ psi0), atol=1e-10)

    rho0 = jnp.outer(psi0, psi0.conj())
    rhos = dyn.density_rollout(osys, pulse, times, rho0, n_substeps=64)
    rho_T = np.outer(np.asarray(psis[-1]), np.asarray(psis[-1]).conj())
    np.testing.assert_allclose(np.asarray(rhos[-1]), rho_T, atol=1e-6)


def test_lindblad_decay():
    # Pure T1 decay with no Hamiltonian: rho_11(t) = exp(-gamma t)
    gamma = 0.3
    a = np.array([[0, 1], [0, 0]], dtype=np.complex128)
    osys = OpenQuantumSystem(
        H_drift=np.zeros((2, 2)),
        H_drives=[],
        n_drives=0,
        dissipators=[LinearDissipator(a, gamma)],
    )
    T, N = 5.0, 11
    times = np.linspace(0, T, N)
    pulse = lambda t: jnp.zeros(0)  # noqa: E731
    rho0 = jnp.array([[0, 0], [0, 1.0]], dtype=jnp.complex128)
    rhos = dyn.density_rollout(osys, pulse, times, rho0, n_substeps=8)
    pops = np.real(np.asarray(rhos)[:, 1, 1])
    np.testing.assert_allclose(pops, np.exp(-gamma * times), atol=1e-10)
    # trace preserved
    traces = np.real(np.trace(np.asarray(rhos), axis1=1, axis2=2))
    np.testing.assert_allclose(traces, 1.0, atol=1e-12)


def test_rollout_fidelity_validation():
    sys = make_qubit_system()
    T, N = 2.0, 41
    times = np.linspace(0, T, N)
    amp = (np.pi / 2) / T
    us = np.stack([np.full(N, amp), np.zeros(N)], axis=1)
    psi0 = jnp.array([1.0 + 0j, 0.0])
    goal = jnp.asarray(GATES["X"]) @ psi0
    for interp in ("constant", "linear", "cubic"):
        F = dyn.rollout_fidelity(sys, us, times, psi0, goal,
                                 interpolation=interp, n_substeps=8)
        assert float(F) > 1 - 1e-8, interp


def test_pedersen_fidelity_perfect():
    U = jnp.asarray(GATES["X"])
    F = dyn.pedersen_fidelity(U, U)
    assert abs(float(F) - 1.0) < 1e-12


def test_ensemble_rollout_vmap():
    # Batched initial states via vmapped rollout (replaces EnsembleProblem)
    sys = make_qubit_system()
    T, N = 2.0, 21
    times = np.linspace(0, T, N)
    us = 0.3 * np.random.default_rng(4).standard_normal((N, 2))
    pulse = ZeroOrderPulse(us, times)
    initials = jnp.asarray(np.eye(2, dtype=np.complex128))  # |0>, |1>
    psis = dyn.ket_rollout(sys, pulse, times, initials)
    assert psis.shape == (N, 2, 2)
    Us = dyn.unitary_rollout(sys, pulse, times)
    np.testing.assert_allclose(np.asarray(psis[-1].T), np.asarray(Us[-1]),
                               atol=1e-10)
