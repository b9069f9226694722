"""IPM solver unit tests: structured QPs with known solutions.

Mirrors the reference discipline of testing the NLP machinery on tiny
problems with closed forms (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from piccolax.solver.ipm import IPMOptions, solve_nlp
from piccolax.solver.kkt import (
    block_ldl_factor,
    block_ldl_solve,
    block_tridiag_matvec,
    block_tridiag_solve,
    cyclic_reduction_solve,
)
from piccolax.solver.nlp import CollocationNLP


def _dense_from_blocks(diag, upper):
    N, m, _ = diag.shape
    S = np.zeros((N * m, N * m))
    for k in range(N):
        S[k * m:(k + 1) * m, k * m:(k + 1) * m] = diag[k]
    for k in range(N - 1):
        S[k * m:(k + 1) * m, (k + 1) * m:(k + 2) * m] = upper[k]
        S[(k + 1) * m:(k + 2) * m, k * m:(k + 1) * m] = upper[k].T
    return S


def _random_spd_tridiag(N, m, seed=0):
    rng = np.random.default_rng(seed)
    upper = rng.standard_normal((N - 1, m, m)) * 0.3
    diag = np.stack([
        (lambda A: A @ A.T + 3 * np.eye(m))(rng.standard_normal((m, m)))
        for _ in range(N)
    ])
    return diag, upper


def test_block_thomas_matches_dense():
    N, m = 11, 5
    diag, upper = _random_spd_tridiag(N, m)
    S = _dense_from_blocks(diag, upper)
    rhs = np.random.default_rng(1).standard_normal((N, m))
    x = block_tridiag_solve(jnp.asarray(diag), jnp.asarray(upper),
                            jnp.asarray(rhs))
    x_dense = np.linalg.solve(S, rhs.reshape(-1)).reshape(N, m)
    np.testing.assert_allclose(np.asarray(x), x_dense, atol=1e-10)
    r = block_tridiag_matvec(jnp.asarray(diag), jnp.asarray(upper), x)
    np.testing.assert_allclose(np.asarray(r), rhs, atol=1e-10)


def test_cyclic_reduction_matches_thomas():
    for N in (4, 7, 16):
        diag, upper = _random_spd_tridiag(N, 3, seed=N)
        rhs = np.random.default_rng(N).standard_normal((N, 3))
        x1 = block_tridiag_solve(jnp.asarray(diag), jnp.asarray(upper),
                                 jnp.asarray(rhs))
        x2 = cyclic_reduction_solve(jnp.asarray(diag), jnp.asarray(upper),
                                    jnp.asarray(rhs))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-9)


def test_block_ldl_indefinite():
    # saddle system [[W, J^T], [J, -delta]]: correct solve + inertia
    rng = np.random.default_rng(3)
    N, nz, mlam = 6, 4, 2
    mb = nz + mlam
    diag = np.zeros((N, mb, mb))
    upper = np.zeros((N - 1, mb, mb))
    for k in range(N):
        A = rng.standard_normal((nz, nz))
        W = A @ A.T + np.eye(nz)
        J = rng.standard_normal((mlam, nz))
        diag[k, :nz, :nz] = W
        diag[k, :nz, nz:] = J.T
        diag[k, nz:, :nz] = J
        diag[k, nz:, nz:] = -1e-8 * np.eye(mlam)
    for k in range(N - 1):
        upper[k, nz:, :nz] = rng.standard_normal((mlam, nz)) * 0.2
    S = _dense_from_blocks(diag, upper)
    rhs = rng.standard_normal((N, mb))
    Dts, n_neg, min_abs = block_ldl_factor(jnp.asarray(diag),
                                           jnp.asarray(upper))
    x = block_ldl_solve(Dts, jnp.asarray(upper), jnp.asarray(rhs))
    x_dense = np.linalg.solve(S, rhs.reshape(-1)).reshape(N, mb)
    np.testing.assert_allclose(np.asarray(x), x_dense, atol=1e-8)
    ev = np.linalg.eigvalsh(S)
    assert int(n_neg) == int((ev < 0).sum())


def test_ipm_box_qp():
    # min sum ||z - target||^2 with box [-1, 1]: solution is the clip
    N, dz = 5, 3
    rng = np.random.default_rng(0)
    target = rng.standard_normal((N, dz)) * 1.5
    nlp = CollocationNLP(
        N=N, dz=dz, dg=0, md=0, me=0,
        stage_cost=lambda k, z, g, p: jnp.sum((z - p["target"][k]) ** 2),
        lo=np.full((N, dz), -1.0), hi=np.full((N, dz), 1.0))
    st = solve_nlp(nlp, {"target": jnp.asarray(target)}, jnp.zeros((N, dz)),
                   options=IPMOptions(tol=1e-9))
    assert bool(st.converged)
    np.testing.assert_allclose(np.asarray(st.Z), np.clip(target, -1, 1),
                               atol=1e-6)


def test_ipm_chain_dynamics():
    # min sum ||z||^2 s.t. z_{k+1} = z_k + c_k, z_0 pinned: fully determined
    N, dz = 6, 3
    rng = np.random.default_rng(1)
    ck = rng.standard_normal((N - 1, dz)) * 0.3
    z0 = rng.standard_normal(dz)
    eq_mask = np.zeros((N, dz))
    eq_mask[0] = 1.0
    nlp = CollocationNLP(
        N=N, dz=dz, dg=0, md=dz, me=dz,
        stage_cost=lambda k, z, g, p: 0.5 * jnp.sum(z ** 2),
        dynamics=lambda k, z, zp, g, p: zp - z - p["ck"][k],
        stage_eq=lambda k, z, g, p: z - p["z0"],
        eq_mask=eq_mask)
    st = solve_nlp(nlp, {"ck": jnp.asarray(ck), "z0": jnp.asarray(z0)},
                   jnp.zeros((N, dz)), options=IPMOptions(tol=1e-9))
    zexp = np.zeros((N, dz))
    zexp[0] = z0
    for k in range(N - 1):
        zexp[k + 1] = zexp[k] + ck[k]
    assert bool(st.converged)
    np.testing.assert_allclose(np.asarray(st.Z), zexp, atol=1e-8)


def test_ipm_globals():
    # min sum ||z_k - g||^2 + ||g - 3||^2 -> z = g = 3
    N = 5
    nlp = CollocationNLP(
        N=N, dz=1, dg=1, md=0, me=0,
        stage_cost=lambda k, z, g, p: jnp.sum((z - g) ** 2)
        + jnp.where(k == 0, jnp.sum((g - 3.0) ** 2), 0.0))
    st = solve_nlp(nlp, {}, jnp.zeros((N, 1)), jnp.zeros(1),
                   options=IPMOptions(tol=1e-9))
    assert bool(st.converged)
    np.testing.assert_allclose(np.asarray(st.Z), 3.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.g), 3.0, atol=1e-6)


def test_ipm_global_slack_inequality():
    # min (z - 2)^2 s.t. z <= 1 encoded via slack global: z - 1 + s = 0,
    # s in [0, inf) -> z* = 1
    N = 1
    eq_mask = np.ones((1, 1))
    nlp = CollocationNLP(
        N=N, dz=1, dg=1, md=0, me=1,
        stage_cost=lambda k, z, g, p: jnp.sum((z - 2.0) ** 2),
        stage_eq=lambda k, z, g, p: z - 1.0 + g,
        eq_mask=eq_mask,
        g_lo=np.zeros(1), g_hi=np.full(1, np.inf))
    st = solve_nlp(nlp, {}, jnp.zeros((1, 1)), jnp.asarray([0.5]),
                   options=IPMOptions(tol=1e-9))
    assert bool(st.converged)
    np.testing.assert_allclose(np.asarray(st.Z), 1.0, atol=1e-6)


def test_ipm_vmap_batch():
    # Batch of box-QPs with different targets solved in one vmap
    N, dz, B = 4, 2, 8
    rng = np.random.default_rng(2)
    targets = rng.standard_normal((B, N, dz)) * 1.5
    nlp = CollocationNLP(
        N=N, dz=dz, dg=0, md=0, me=0,
        stage_cost=lambda k, z, g, p: jnp.sum((z - p["target"][k]) ** 2),
        lo=np.full((N, dz), -1.0), hi=np.full((N, dz), 1.0))

    def solve_one(t):
        return solve_nlp(nlp, {"target": t}, jnp.zeros((N, dz)),
                         options=IPMOptions(tol=1e-9, max_iter=60))

    sts = jax.vmap(solve_one)(jnp.asarray(targets))
    assert bool(jnp.all(sts.converged))
    np.testing.assert_allclose(np.asarray(sts.Z),
                               np.clip(targets, -1, 1), atol=1e-6)
