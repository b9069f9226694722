"""Native (C++) KKT backend vs the JAX matmul-only factorization.

The native library is the independent oracle for solver/kkt.py (exact
Cholesky solves, no explicit inverses) — both must agree with a dense
reference solve on random quasidefinite block-tridiagonal systems.
"""

import numpy as np
import pytest

import piccolax.native as native
from piccolax.solver.kkt import cr_factor, cr_solve, qd_factor, qd_solve

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def _random_qd(rng, N, dz, m):
    """Random quasidefinite block-tridiagonal KKT pieces."""
    A = rng.standard_normal((N, dz, dz))
    P = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(dz)
    C = rng.standard_normal((N, m, dz))
    Rdiag = 0.1 + rng.random((N, m))
    Cnext = rng.standard_normal((N - 1, m, dz))
    return P, C, Rdiag, Cnext


def _dense_kkt(P, C, Rdiag, Cnext):
    N, m, dz = C.shape
    mb = dz + m
    K = np.zeros((N * mb, N * mb))
    for k in range(N):
        s = k * mb
        K[s:s + dz, s:s + dz] = P[k]
        K[s + dz:s + mb, s:s + dz] = C[k]
        K[s:s + dz, s + dz:s + mb] = C[k].T
        K[s + dz:s + mb, s + dz:s + mb] = -np.diag(Rdiag[k])
        if k < N - 1:
            sn = (k + 1) * mb
            K[s + dz:s + mb, sn:sn + dz] = Cnext[k]
            K[sn:sn + dz, s + dz:s + mb] = Cnext[k].T
    return K


def test_native_qd_matches_dense():
    rng = np.random.default_rng(0)
    N, dz, m = 7, 5, 3
    P, C, Rdiag, Cnext = _random_qd(rng, N, dz, m)
    rhs = rng.standard_normal((N, dz + m))
    x, status = native.qd_solve(P, C, Rdiag, Cnext, rhs)
    assert status == 0
    K = _dense_kkt(P, C, Rdiag, Cnext)
    x_ref = np.linalg.solve(K, rhs.ravel()).reshape(N, dz + m)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-9)


def test_native_qd_matches_jax():
    rng = np.random.default_rng(1)
    N, dz, m = 9, 6, 4
    P, C, Rdiag, Cnext = _random_qd(rng, N, dz, m)
    rhs = rng.standard_normal((N, dz + m, 2))
    x_nat, status = native.qd_solve(P, C, Rdiag, Cnext, rhs)
    assert status == 0
    factors = qd_factor(*map(np.asarray, (P, C, Rdiag, Cnext)))
    x_jax = np.asarray(qd_solve(factors, C, Cnext, rhs, dz))
    np.testing.assert_allclose(x_nat, x_jax, rtol=1e-6, atol=1e-8)


def test_native_qd_batched():
    rng = np.random.default_rng(2)
    B, N, dz, m = 4, 5, 4, 2
    Ps, Cs, Rs, Cns, rhss, refs = [], [], [], [], [], []
    for _ in range(B):
        P, C, Rdiag, Cnext = _random_qd(rng, N, dz, m)
        rhs = rng.standard_normal((N, dz + m))
        K = _dense_kkt(P, C, Rdiag, Cnext)
        refs.append(np.linalg.solve(K, rhs.ravel()).reshape(N, dz + m))
        Ps.append(P), Cs.append(C), Rs.append(Rdiag)
        Cns.append(Cnext), rhss.append(rhs)
    x, status = native.qd_solve(np.stack(Ps), np.stack(Cs), np.stack(Rs),
                                np.stack(Cns), np.stack(rhss))
    assert np.all(status == 0)
    np.testing.assert_allclose(x, np.stack(refs), rtol=1e-9, atol=1e-9)


def test_native_qd_flags_indefinite():
    rng = np.random.default_rng(3)
    N, dz, m = 4, 3, 2
    P, C, Rdiag, Cnext = _random_qd(rng, N, dz, m)
    P[2] = -np.eye(dz)          # indefinite primal block
    rhs = rng.standard_normal((N, dz + m))
    x, status = native.qd_solve(P, C, Rdiag, Cnext, rhs)
    assert status == 1
    assert np.all(np.isnan(x))


def test_native_spd_tridiag_matches_jax():
    rng = np.random.default_rng(4)
    N, m = 8, 5
    A = rng.standard_normal((N, m, m))
    diag = A @ np.swapaxes(A, -1, -2) + 5.0 * np.eye(m)
    upper = 0.3 * rng.standard_normal((N - 1, m, m))
    rhs = rng.standard_normal((N, m))
    x_nat, status = native.spd_tridiag_solve(diag, upper, rhs)
    assert status == 0
    import jax.numpy as jnp
    x_jax = np.asarray(cr_solve(
        cr_factor(jnp.asarray(diag), jnp.asarray(upper)),
        jnp.asarray(rhs)))
    np.testing.assert_allclose(x_nat, x_jax, rtol=1e-7, atol=1e-9)


def test_native_backend_end_to_end_sx():
    """Full SX-gate solve with the C++ KKT backend matches the JAX one."""
    import piccolax as px
    from piccolax.solver.ipm import IPMOptions

    N, T = 15, 4.0
    times = np.linspace(0, T, N)
    us = 0.01 * np.random.default_rng(0).standard_normal((N, 2))
    sys2 = px.QuantumSystem(np.zeros((2, 2)),
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    qtraj = px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us, times),
                                 px.GATES["SX"])
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
    opts = IPMOptions(max_iter=150, tol=1e-7, constr_viol_tol=1e-7,
                      kkt_backend="native")
    prob.solve(options=opts, verbose=False)
    assert float(prob.fidelity()) > 0.999
