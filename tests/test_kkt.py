"""Unit tests for the PRODUCTION KKT layer (solver/kkt.py).

Factor-vs-dense and solve-vs-dense over {f32, f64} x N in {1, 2, 7, 50}
x well/ill-conditioned blocks — the `test_integrator` discipline of
SURVEY.md section 4 applied to the linear solver. These are the kernels
every IPM iteration runs (reference analogue: Ipopt's MUMPS/HSL sparse
LDL^T, SURVEY.md section 3.2).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from piccolax.solver.kkt import (
    chol_inv_factor,
    condensed_factor,
    condensed_solve,
    cr_factor,
    cr_solve,
    psd_clamp,
    qd_factor,
    qd_solve,
    tri_lower_inv,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _spd_tridiag(N, m, rng, cond_scale=1.0):
    """Random SPD block-tridiagonal (diag [N,m,m], upper [N-1,m,m])."""
    diag = np.zeros((N, m, m))
    for k in range(N):
        A = rng.standard_normal((m, m))
        diag[k] = A @ A.T + (m * 4) * np.eye(m)
        diag[k] *= cond_scale ** (k % 3)       # vary block scales
    upper = rng.standard_normal((N - 1, m, m)) if N > 1 \
        else np.zeros((0, m, m))
    return diag, upper


def _dense_tridiag(diag, upper):
    N, m, _ = diag.shape
    S = np.zeros((N * m, N * m))
    for k in range(N):
        S[k * m:(k + 1) * m, k * m:(k + 1) * m] = diag[k]
        if k < N - 1:
            S[k * m:(k + 1) * m, (k + 1) * m:(k + 2) * m] = upper[k]
            S[(k + 1) * m:(k + 2) * m, k * m:(k + 1) * m] = upper[k].T
    return S


def _kkt_problem(N, m, dz, rng, ill=False):
    """Random quasidefinite KKT blocks: P [N,dz,dz] PD, C [N,m,dz],
    Rdiag [N,m] > 0, Cnext [N-1,m,dz]."""
    P = np.zeros((N, dz, dz))
    for k in range(N):
        A = rng.standard_normal((dz, dz))
        P[k] = A @ A.T + (dz * 2) * np.eye(dz)
        if ill:
            # near-singular direction + large scale spread
            P[k][0, 0] *= 1e6
            P[k] += 1e-4 * np.eye(dz)
    C = rng.standard_normal((N, m, dz))
    Cnext = rng.standard_normal((N - 1, m, dz)) if N > 1 \
        else np.zeros((0, m, dz))
    Rdiag = np.full((N, m), 1e-6 if not ill else 1e-8)
    return P, C, Rdiag, Cnext


def _dense_kkt(P, C, Rdiag, Cnext):
    """Assemble the full symmetric KKT matrix, per-knot order (z, lam)."""
    N, m, dz = C.shape
    mb = dz + m
    K = np.zeros((N * mb, N * mb))
    for k in range(N):
        o = k * mb
        K[o:o + dz, o:o + dz] = P[k]
        K[o + dz:o + mb, o:o + dz] = C[k]
        K[o:o + dz, o + dz:o + mb] = C[k].T
        K[o + dz:o + mb, o + dz:o + mb] = -np.diag(Rdiag[k])
        if k < N - 1:
            on = (k + 1) * mb
            # constraint rows of knot k touch z_{k+1}
            K[o + dz:o + mb, on:on + dz] = Cnext[k]
            K[on:on + dz, o + dz:o + mb] = Cnext[k].T
    return K


# --------------------------------------------------------------------- #
# tri_lower_inv / chol_inv_factor
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("m", [1, 2, 5, 16])
def test_tri_lower_inv_matches_dense(m):
    rng = _rng(1)
    L = np.tril(rng.standard_normal((m, m)))
    L[np.arange(m), np.arange(m)] = 1.0 + np.abs(L[np.arange(m), np.arange(m)])
    Li = np.asarray(tri_lower_inv(jnp.asarray(L)))
    np.testing.assert_allclose(Li @ L, np.eye(m), atol=1e-10)


def test_chol_inv_factor_spd_and_nan_on_indefinite():
    rng = _rng(2)
    A = rng.standard_normal((6, 6))
    spd = A @ A.T + 6 * np.eye(6)
    Xi = np.asarray(chol_inv_factor(jnp.asarray(spd)))
    np.testing.assert_allclose(Xi.T @ Xi, np.linalg.inv(spd),
                               rtol=1e-8, atol=1e-10)
    # indefinite input must signal with NaNs (the IPM's PD test)
    indef = spd - 100 * np.eye(6)
    Xi_bad = np.asarray(chol_inv_factor(jnp.asarray(indef)))
    assert np.any(np.isnan(Xi_bad))


# --------------------------------------------------------------------- #
# psd_clamp vs the eigendecomposition clamp
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("scale", [1.0, 1e4])
def test_psd_clamp_matches_eigh_clamp(scale):
    rng = _rng(3)
    A = rng.standard_normal((7, 9, 9)) * scale
    W = 0.5 * (A + np.swapaxes(A, -1, -2))
    floor = 1e-6
    out = np.asarray(psd_clamp(jnp.asarray(W), floor))
    # reference: U max(lam, 0) U^T + floor * max(1, |lam|_max) I
    ew, EV = np.linalg.eigh(W)
    smax = np.max(np.sum(np.abs(W), axis=-1), axis=-1)
    ref = np.einsum("kij,kj,klj->kil", EV, np.maximum(ew, 0.0), EV)
    # effective floor from the docstring
    eff = np.maximum(floor, 0.5 * 1.5 ** (-32.0)) * np.maximum(1.0, smax)
    ref = ref + eff[:, None, None] * np.eye(9)
    np.testing.assert_allclose(out, ref, rtol=1e-5,
                               atol=1e-5 * max(scale, 1.0))
    # PD by construction
    assert np.linalg.eigvalsh(out).min() > 0


def test_psd_clamp_preserves_positive_definite_input():
    rng = _rng(4)
    A = rng.standard_normal((4, 6, 6))
    W = A @ np.swapaxes(A, -1, -2) + 6 * np.eye(6)
    out = np.asarray(psd_clamp(jnp.asarray(W), 1e-8))
    np.testing.assert_allclose(out, W + np.diag(np.full(6, 0.0)),
                               rtol=1e-4, atol=1e-3)


# --------------------------------------------------------------------- #
# cyclic reduction (production: cr_factor / cr_solve)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("N", [1, 2, 3, 7, 8, 50])
def test_cr_solve_matches_dense(N):
    m = 4
    rng = _rng(10 + N)
    diag, upper = _spd_tridiag(N, m, rng)
    rhs = rng.standard_normal((N, m))
    f = cr_factor(jnp.asarray(diag), jnp.asarray(upper))
    x = np.asarray(cr_solve(f, jnp.asarray(rhs)))
    S = _dense_tridiag(diag, upper)
    x_ref = np.linalg.solve(S, rhs.ravel()).reshape(N, m)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-9)


def test_cr_solve_multi_rhs_and_reuse():
    N, m, r = 13, 3, 5
    rng = _rng(20)
    diag, upper = _spd_tridiag(N, m, rng)
    f = cr_factor(jnp.asarray(diag), jnp.asarray(upper))
    S = _dense_tridiag(diag, upper)
    for seed in (0, 1):
        rhs = _rng(30 + seed).standard_normal((N, m, r))
        x = np.asarray(cr_solve(f, jnp.asarray(rhs)))
        x_ref = np.linalg.solve(S, rhs.reshape(N * m, r)).reshape(N, m, r)
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-9)


def test_cr_solve_ill_conditioned_blocks():
    N, m = 16, 4
    rng = _rng(21)
    diag, upper = _spd_tridiag(N, m, rng, cond_scale=1e3)
    rhs = rng.standard_normal((N, m))
    f = cr_factor(jnp.asarray(diag), jnp.asarray(upper))
    x = np.asarray(cr_solve(f, jnp.asarray(rhs)))
    S = _dense_tridiag(diag, upper)
    resid = np.abs(S @ x.ravel() - rhs.ravel()).max()
    assert resid < 1e-6 * max(1.0, np.abs(rhs).max())


# --------------------------------------------------------------------- #
# quasidefinite backend (qd) and condensed-CR backend vs dense KKT
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("N", [1, 2, 7, 50])
@pytest.mark.parametrize("backend", ["qd", "cr"])
def test_kkt_backends_match_dense(N, backend):
    m, dz = 3, 5
    rng = _rng(40 + N)
    P, C, Rdiag, Cnext = _kkt_problem(N, m, dz, rng)
    rhs = rng.standard_normal((N, dz + m))
    if backend == "qd":
        f = qd_factor(jnp.asarray(P), jnp.asarray(C), jnp.asarray(Rdiag),
                      jnp.asarray(Cnext))
        w = np.asarray(qd_solve(f, jnp.asarray(C), jnp.asarray(Cnext),
                                jnp.asarray(rhs), dz))
    else:
        f = condensed_factor(jnp.asarray(P), jnp.asarray(C),
                             jnp.asarray(Rdiag), jnp.asarray(Cnext))
        w = np.asarray(condensed_solve(f, jnp.asarray(C), jnp.asarray(Cnext),
                                       jnp.asarray(rhs), dz))
    K = _dense_kkt(P, C, Rdiag, Cnext)
    w_ref = np.linalg.solve(K, rhs.ravel()).reshape(N, dz + m)
    np.testing.assert_allclose(w, w_ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("backend", ["qd", "cr"])
def test_kkt_backends_ill_conditioned(backend):
    N, m, dz = 12, 3, 5
    rng = _rng(60)
    P, C, Rdiag, Cnext = _kkt_problem(N, m, dz, rng, ill=True)
    rhs = rng.standard_normal((N, dz + m))
    if backend == "qd":
        f = qd_factor(jnp.asarray(P), jnp.asarray(C), jnp.asarray(Rdiag),
                      jnp.asarray(Cnext))
        w = np.asarray(qd_solve(f, jnp.asarray(C), jnp.asarray(Cnext),
                                jnp.asarray(rhs), dz))
    else:
        f = condensed_factor(jnp.asarray(P), jnp.asarray(C),
                             jnp.asarray(Rdiag), jnp.asarray(Cnext))
        w = np.asarray(condensed_solve(f, jnp.asarray(C), jnp.asarray(Cnext),
                                       jnp.asarray(rhs), dz))
    K = _dense_kkt(P, C, Rdiag, Cnext)
    # relative residual (one step of iterative refinement happens in the
    # IPM, not here — the raw factorization must still be sane)
    resid = np.abs(K @ w.ravel() - rhs.ravel()).max()
    assert resid < 1e-5 * np.abs(rhs).max() * np.abs(K).max() ** 0.5


def test_kkt_backends_nan_on_indefinite_primal():
    """A non-PD primal block must signal via NaNs (direction-validity
    contract used by the IPM's Newton/fallback selection)."""
    N, m, dz = 5, 3, 4
    rng = _rng(70)
    P, C, Rdiag, Cnext = _kkt_problem(N, m, dz, rng)
    P[2] = P[2] - 100.0 * np.eye(dz)        # make one block indefinite
    rhs = rng.standard_normal((N, dz + m))
    f = condensed_factor(jnp.asarray(P), jnp.asarray(C), jnp.asarray(Rdiag),
                         jnp.asarray(Cnext))
    w = np.asarray(condensed_solve(f, jnp.asarray(C), jnp.asarray(Cnext),
                                   jnp.asarray(rhs), dz))
    assert np.any(np.isnan(w))


@pytest.mark.parametrize("backend", ["qd", "cr"])
def test_kkt_backends_float32(backend):
    """f32 path (TPU production dtype): residual within ~sqrt(eps32)."""
    N, m, dz = 20, 3, 5
    rng = _rng(80)
    P, C, Rdiag, Cnext = _kkt_problem(N, m, dz, rng)
    Rdiag = np.full((N, m), 1e-3)           # f32-scale regularization
    rhs = rng.standard_normal((N, dz + m))
    f32 = jnp.float32
    args = [jnp.asarray(x, f32) for x in (P, C, Rdiag, Cnext)]
    if backend == "qd":
        f = qd_factor(*args)
        w = np.asarray(qd_solve(f, args[1], args[3],
                                jnp.asarray(rhs, f32), dz))
    else:
        f = condensed_factor(*args)
        w = np.asarray(condensed_solve(f, args[1], args[3],
                                       jnp.asarray(rhs, f32), dz))
    K = _dense_kkt(P, C, Rdiag, Cnext)
    resid = np.abs(K @ w.astype(np.float64).ravel() - rhs.ravel()).max()
    assert np.all(np.isfinite(w))
    assert resid < 5e-3 * np.abs(rhs).max() * np.abs(K).max()
