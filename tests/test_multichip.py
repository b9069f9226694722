"""Multi-chip correctness tests on the 8-device virtual CPU mesh.

SURVEY.md section 4 ("multi-chip tests need what Piccolo never did"):
run the same computation on 1 device vs sharded and assert tolerance
equality. Covers (a) data-parallel batched solves (`parallel/mesh.py`)
on a real >= 30-iteration solve, and (b) the knot-sharded block-
tridiagonal KKT solve (`parallel/sharded_kkt.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import piccolax as px
from piccolax.parallel.mesh import batch_solve, get_mesh
from piccolax.parallel.sharded_kkt import (sharded_spd_tridiag_solve,
                                           spd_tridiag_solve_ref)
from piccolax.solver.ipm import IPMOptions


def _spd_tridiag(N, m, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((N, m, m))
    diag = A @ np.swapaxes(A, -1, -2) + (4 * m) * np.eye(m)
    upper = rng.standard_normal((N - 1, m, m))
    return jnp.asarray(diag), jnp.asarray(upper)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_knot_sharded_kkt_matches_local(n_dev):
    """Knot-sharded solve == in-device cyclic reduction, several widths."""
    N, m = 48, 5
    diag, upper = _spd_tridiag(N, m, seed=n_dev)
    rhs = jnp.asarray(np.random.default_rng(1).standard_normal((N, m)))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("knot",))
    x_sh = sharded_spd_tridiag_solve(diag, upper, rhs, mesh)
    x_ref = spd_tridiag_solve_ref(diag, upper, rhs)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-10)


def test_knot_sharded_kkt_multi_rhs():
    N, m, r = 24, 4, 3
    diag, upper = _spd_tridiag(N, m, seed=9)
    rhs = jnp.asarray(np.random.default_rng(2).standard_normal((N, m, r)))
    mesh = Mesh(np.array(jax.devices()[:4]), ("knot",))
    x_sh = sharded_spd_tridiag_solve(diag, upper, rhs, mesh)
    x_ref = spd_tridiag_solve_ref(diag, upper, rhs)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-10)


def test_knot_sharded_kkt_rejects_bad_partition():
    N, m = 10, 3
    diag, upper = _spd_tridiag(N, m)
    rhs = jnp.zeros((N, m))
    mesh = Mesh(np.array(jax.devices()[:4]), ("knot",))
    with pytest.raises(ValueError):
        sharded_spd_tridiag_solve(diag, upper, rhs, mesh)


def test_knot_backend_ipm_matches_local():
    """END-TO-END knot-sharded solve: the full IPM with
    kkt_backend="knot" on a CNOT-class N=64 problem over an 8-device
    mesh must track the local-backend iterate to float64 tolerance
    through 40 real iterations (sequence parallelism; the role of
    Ipopt's sparse factorization, reference src/control/CONTEXT.md:7-14)."""
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import solve_nlp

    prob = bm.cnot_problem(N=64, T=12.0)
    nlp, params, Z0, g0, _ = prob.build()
    opts_local = IPMOptions(max_iter=40, tol=1e-6, constr_viol_tol=1e-6)
    st_local = jax.jit(
        lambda Z, g: solve_nlp(nlp, params, Z, g, opts_local))(Z0, g0)

    mesh = Mesh(np.array(jax.devices()[:8]), ("knot",))
    opts_knot = IPMOptions(max_iter=40, tol=1e-6, constr_viol_tol=1e-6,
                           kkt_backend="knot")
    st_knot = jax.jit(
        lambda Z, g: solve_nlp(nlp, params, Z, g, opts_knot, mesh=mesh))(
        Z0, g0)
    assert int(st_knot.it) == int(st_local.it)
    np.testing.assert_allclose(np.asarray(st_knot.Z),
                               np.asarray(st_local.Z),
                               rtol=1e-7, atol=1e-9)
    # both made real progress on the same trajectory
    assert float(st_knot.kkt_err) < 1e2
    np.testing.assert_allclose(float(st_knot.kkt_err),
                               float(st_local.kkt_err), rtol=1e-4)


def test_sharded_batch_solve_matches_single_device():
    """Full SX-gate solves (>= 30 IPM iterations): an 8-way sharded batch
    must match the single-device vmapped batch to float64 tolerance."""
    N, T, B = 11, 4.0, 8
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(0)
    us0 = 0.01 * rng.standard_normal((N, 2))
    sys2 = px.QuantumSystem(np.zeros((2, 2)),
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    qtraj = px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us0, times),
                                 px.GATES["SX"])
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2,
                                 du_bound=0.5, ddu_bound=1.0)
    nlp, params, Z0, g0, layout = prob.build()

    u_sl = layout.slices["u"]
    Z0_b = np.broadcast_to(np.asarray(Z0)[None], (B, *Z0.shape)).copy()
    Z0_b[:, :, u_sl] += 0.02 * rng.standard_normal((B, N, 2))
    Z0_b = jnp.asarray(Z0_b)
    params_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (B, *jnp.shape(x))), params)
    opts = IPMOptions(max_iter=60, tol=1e-8, constr_viol_tol=1e-8)

    st_1dev = batch_solve(nlp, params_b, Z0_b, options=opts)
    mesh = get_mesh("batch", jax.devices()[:8])
    st_mesh = batch_solve(nlp, params_b, Z0_b, options=opts, mesh=mesh)

    assert int(jnp.min(st_1dev.it)) >= 30 or bool(jnp.all(st_1dev.converged))
    np.testing.assert_allclose(np.asarray(st_mesh.Z), np.asarray(st_1dev.Z),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(st_mesh.converged),
                                  np.asarray(st_1dev.converged))
    np.testing.assert_array_equal(np.asarray(st_mesh.it),
                                  np.asarray(st_1dev.it))


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_batch_knot_2d_mesh_matches_local(shape):
    """2D (batch x knot) composition: many long-horizon KKT systems on a
    2D mesh == per-system local cyclic reduction (SURVEY 5.7 batch x
    sequence parallelism at the KKT layer)."""
    from piccolax.parallel.sharded_kkt import (
        batched_sharded_spd_tridiag_solve)
    nb, nk = shape
    B, N, m = 2 * nb, 12 * nk, 5
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, N, m, m))
    diag = jnp.asarray(A @ np.swapaxes(A, -1, -2) + (4 * m) * np.eye(m))
    upper = jnp.asarray(rng.standard_normal((B, N - 1, m, m)))
    rhs = jnp.asarray(rng.standard_normal((B, N, m, 3)))
    mesh = Mesh(np.array(jax.devices()[:nb * nk]).reshape(nb, nk),
                ("batch", "knot"))
    x2d = batched_sharded_spd_tridiag_solve(diag, upper, rhs, mesh)
    x_ref = jnp.stack([spd_tridiag_solve_ref(diag[b], upper[b], rhs[b])
                       for b in range(B)])
    np.testing.assert_allclose(np.asarray(x2d), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)
