"""float32 solver path — the TPU production configuration.

The conftest runs tests in f64 on CPU; these tests cast the NLP to
float32 before solving, exercising the dtype-aware IPM numerics
(delta_c_f32 / hess_floor_f32 / bound_relax, AL merit noise floor) that
the real-TPU bench relies on. Quality gate: independent f64 ZOH
re-integration of the solved pulse (the reference's rollout-validation
discipline, SURVEY.md section 3.4).
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

import piccolax as px
from piccolax.quantum.dynamics import unitary_fidelity, unitary_rollout
from piccolax.solver.ipm import IPMOptions, solve_nlp


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_cache():
    # The f32 solver compile aborts (SIGABRT inside XLA:CPU
    # backend_compile_and_load) when it lands on a compile cache holding
    # ~100 prior test computations; with a fresh cache it always
    # compiles fine. Clear before and after so neither this module nor
    # later ones inherit the pressure.
    jax.clear_caches()
    yield
    jax.clear_caches()


def _cast32(t):
    return jtu.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)


def _sx_problem(N, T):
    sys2 = px.QuantumSystem(np.zeros((2, 2)),
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    times = np.linspace(0, T, N)
    us0 = 0.01 * np.random.default_rng(0).standard_normal((N, 2))
    qtraj = px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us0, times),
                                 px.GATES["SX"])
    prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2,
                                 du_bound=0.5, ddu_bound=1.0)
    return sys2, times, prob


def test_f32_sx_solve_rollout_quality():
    sys2, times, prob = _sx_problem(15, 10.0)
    nlp, params, Z0, g0, layout = prob.build()
    opts = IPMOptions(max_iter=150, tol=1e-5, constr_viol_tol=1e-5)
    st = jax.jit(lambda Z, g: solve_nlp(
        _cast32(nlp), _cast32(params), Z, g, opts))(
            Z0.astype(jnp.float32), g0.astype(jnp.float32))
    assert st.Z.dtype == jnp.float32
    assert float(st.kkt_err) < 1e-3
    us = np.asarray(st.Z[:, layout.slices["u"]], np.float64)
    Us = unitary_rollout(sys2, px.ZeroOrderPulse(us, times), times)
    F = float(unitary_fidelity(Us[-1], jnp.asarray(px.GATES["SX"])))
    assert F > 0.999, F


def test_f32_batched_vmap_solves():
    sys2, times, prob = _sx_problem(15, 10.0)
    nlp, params, Z0, g0, layout = prob.build()
    nlp32, params32 = _cast32(nlp), _cast32(params)
    B = 4
    rng = np.random.default_rng(1)
    Z0b = np.broadcast_to(np.asarray(Z0, np.float32)[None],
                          (B, *Z0.shape)).copy()
    Z0b[:, :, layout.slices["u"]] += \
        0.02 * rng.standard_normal((B, 15, 2)).astype(np.float32)
    g0b = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=120, tol=1e-5, constr_viol_tol=1e-5)
    st = jax.jit(jax.vmap(
        lambda Z, g: solve_nlp(nlp32, params32, Z, g, opts)))(Z0b, g0b)
    goal = jnp.asarray(px.GATES["SX"])
    for b in range(B):
        us = np.asarray(st.Z[b, :, layout.slices["u"]], np.float64)
        Us = unitary_rollout(sys2, px.ZeroOrderPulse(us, times), times)
        F = float(unitary_fidelity(Us[-1], goal))
        assert F > 0.999, (b, F)


@pytest.mark.parametrize("mode", ["abs", "shift"])
def test_f32_hess_modes_solve_quality(mode):
    """The round-5 convexification modes (saddle-free |H| and adaptive
    inertia shift) solve the f32 SX problem to the same rollout-quality
    bar as the default clamp path."""
    sys2, times, prob = _sx_problem(15, 10.0)
    nlp, params, Z0, g0, layout = prob.build()
    nlp32, params32 = _cast32(nlp), _cast32(params)
    opts = IPMOptions(max_iter=120, tol=1e-5, constr_viol_tol=1e-5,
                      hess_mode=mode)
    st = jax.jit(lambda Z, g: solve_nlp(nlp32, params32, Z, g, opts))(
        jnp.asarray(Z0, jnp.float32), jnp.zeros(0, jnp.float32))
    us = np.asarray(st.Z[:, layout.slices["u"]], np.float64)
    Us = unitary_rollout(sys2, px.ZeroOrderPulse(us, times), times)
    F = float(unitary_fidelity(Us[-1], jnp.asarray(px.GATES["SX"])))
    assert F > 0.999, (mode, F)
    assert np.all(np.isfinite(np.asarray(st.Z)))
