"""Tests for the truly-f64 independent verification module.

`piccolax/verification.py` is the bench's quality-gate integrator (pure
numpy+scipy batched DOP853) — it must agree with closed-form dynamics
and with the JAX iso conventions it decodes.
"""

import numpy as np
import pytest

from piccolax.verification import (
    batched_density_dop853,
    batched_unitary_dop853,
    compact_iso_to_density_np,
    iso_vec_to_operator_np,
    pedersen_fidelity_np,
    unitary_fidelity_np,
)

X = np.array([[0, 1], [1, 0]], complex)
Y = np.array([[0, -1j], [1j, 0]], complex)


def test_unitary_dop853_analytic_pi_pulse():
    """Constant pi-pulse on X/2 reaches the X gate (up to global phase)
    to integrator tolerance."""
    T, N, B = 2.0, 11, 3
    times = np.linspace(0, T, N)
    us = np.full((B, N, 1), np.pi / T)
    U = batched_unitary_dop853(np.zeros((2, 2)), [X / 2], us, times)
    assert U.dtype == np.complex128
    F = unitary_fidelity_np(U, X)
    np.testing.assert_allclose(F, 1.0, atol=1e-9)


def test_unitary_dop853_batched_drift():
    """Per-sample drift (robustness-ensemble shape): each member rotates
    by its own detuning."""
    Z = np.array([[1, 0], [0, -1]], complex)
    eps = np.array([0.0, 0.3])
    H0_b = eps[:, None, None] * Z / 2
    T, N = 1.0, 6
    times = np.linspace(0, T, N)
    us = np.zeros((2, N, 1))
    U = batched_unitary_dop853(H0_b, [X / 2], us, times)
    # drift-free member stays identity; detuned member = exp(-i eps Z T/2)
    np.testing.assert_allclose(U[0], np.eye(2), atol=1e-9)
    expect = np.diag(np.exp(-1j * eps[1] * np.array([1, -1]) * T / 2))
    np.testing.assert_allclose(U[1], expect, atol=1e-9)


def test_density_dop853_decay():
    """Pure amplitude damping: excited-state population decays as
    exp(-gamma t)."""
    gamma, T, N = 0.5, 2.0, 9
    a = np.array([[0, 1], [0, 0]], complex)
    rho0 = np.zeros((2, 2), complex)
    rho0[1, 1] = 1.0
    times = np.linspace(0, T, N)
    us = np.zeros((2, N, 1))
    rho = batched_density_dop853(np.zeros((2, 2)), [X],
                                 [np.sqrt(gamma) * a], us, times, rho0)
    np.testing.assert_allclose(rho[:, 1, 1].real, np.exp(-gamma * T),
                               atol=1e-8)
    # trace preserved
    np.testing.assert_allclose(np.trace(rho, axis1=-2, axis2=-1).real,
                               1.0, atol=1e-8)


def test_iso_decoders_match_jax_conventions():
    import jax.numpy as jnp

    from piccolax.quantum import isomorphisms as iso

    rng = np.random.default_rng(0)
    M = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
    v = np.asarray(iso.operator_to_iso_vec(jnp.asarray(M)))
    np.testing.assert_allclose(iso_vec_to_operator_np(v), M, atol=1e-12)

    H = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
    rho = H @ H.conj().T
    c = np.asarray(iso.density_to_compact_iso(jnp.asarray(rho)))
    np.testing.assert_allclose(compact_iso_to_density_np(c), rho,
                               atol=1e-12)


def test_pedersen_subspace_fidelity():
    """Exact subspace unitary -> F = 1 regardless of global phase; a
    leaky (non-unitary) block is penalized."""
    U = 1j * X
    np.testing.assert_allclose(pedersen_fidelity_np(U, X), 1.0, atol=1e-14)
    # 10% amplitude leak out of the subspace block
    F = pedersen_fidelity_np(0.9 * X, X)
    assert F < 1.0
    np.testing.assert_allclose(F, (2 * 0.81 + (1.8) ** 2) / 6, atol=1e-12)
