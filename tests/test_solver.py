"""IPM solver unit tests: structured QPs with known solutions.

Mirrors the reference discipline of testing the NLP machinery on tiny
problems with closed forms (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from piccolax.solver.ipm import IPMOptions, solve_nlp
from piccolax.solver.nlp import CollocationNLP


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
