"""Visualization layer: Weyl chamber math + plot/animation smoke tests.

Mirrors the reference viz surface (weyl_trajectory.jl, pulse_plots.jl,
animations.jl, live_callbacks.jl). The c1c2c3 values are exact physics
checks; the plot calls are smoke tests returning matplotlib figures.
"""

import numpy as np
import pytest

import piccolax as px
from piccolax import viz


CANONICAL = [
    ("I", np.eye(4, dtype=complex), (0.0, 0.0, 0.0)),
    ("CX", None, (0.5, 0.0, 0.0)),          # filled in below
    ("CZ", np.diag([1, 1, 1, -1]).astype(complex), (0.5, 0.0, 0.0)),
    ("SWAP", np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0],
                       [0, 0, 0, 1]], dtype=complex), (0.5, 0.5, 0.5)),
    ("iSWAP", np.array([[1, 0, 0, 0], [0, 0, 1j, 0], [0, 1j, 0, 0],
                        [0, 0, 0, 1]], dtype=complex), (0.5, 0.5, 0.0)),
]


def test_weyl_coordinates_canonical_gates():
    for name, U, want in CANONICAL:
        if U is None:
            U = np.asarray(px.GATES["CX"])
        got = viz.weyl_coordinates(U)
        np.testing.assert_allclose(got, want, atol=1e-9, err_msg=name)


def test_weyl_local_invariance():
    """c1c2c3 is invariant under single-qubit rotations."""
    rng = np.random.default_rng(0)

    def haar2():
        z = (rng.standard_normal((2, 2))
             + 1j * rng.standard_normal((2, 2))) / np.sqrt(2)
        q, r = np.linalg.qr(z)
        return q * (np.diag(r) / np.abs(np.diag(r)))

    U = np.asarray(px.GATES["CX"])
    K = np.kron(haar2(), haar2())
    L = np.kron(haar2(), haar2())
    np.testing.assert_allclose(viz.weyl_coordinates(K @ U @ L),
                               viz.weyl_coordinates(U), atol=1e-9)


def _sx_qtraj(N=15, T=6.0):
    sys2 = px.QuantumSystem(np.zeros((2, 2)),
                            [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
    times = np.linspace(0, T, N)
    us = 0.1 * np.random.default_rng(0).standard_normal((N, 2))
    return px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us, times),
                                px.GATES["SX"])


def test_plot_smoke():
    pytest.importorskip("matplotlib")
    qt = _sx_qtraj()
    assert viz.plot_pulse(qt.pulse) is not None
    assert viz.plot_unitary_populations(qt) is not None

    # 2-qubit trajectory for the Weyl path
    Z, X, I2 = px.PAULIS["Z"], px.PAULIS["X"], np.eye(2)
    sys4 = px.QuantumSystem(0.5 * np.kron(Z, Z) / 2,
                            [np.kron(X, I2) / 2, np.kron(I2, X) / 2], 1.0)
    times = np.linspace(0, 6.0, 15)
    us = 0.1 * np.random.default_rng(1).standard_normal((15, 2))
    qt4 = px.UnitaryTrajectory(sys4, px.ZeroOrderPulse(us, times),
                               np.diag([1, 1, 1, -1]).astype(complex))
    assert viz.plot_weyl_trajectory(qt4) is not None


def test_live_pulse_plot_callback():
    pytest.importorskip("matplotlib")
    qt = _sx_qtraj()
    prob = px.SmoothPulseProblem(qt, 15, Q=100.0, R=1e-2)
    times = np.asarray(prob.traj.get_times())
    live = viz.LivePulsePlot(times)                  # no snapshots to disk
    prob.solve(max_iter=30, tol=1e-7, verbose=False,
               callback=live, callback_every=5)
    assert len(live.history) >= 3
    its = [h[0] for h in live.history]
    assert its == sorted(its)
    anim = live.animate()                            # in-memory animation
    assert anim is not None


def test_bloch_wigner_animations():
    """Round-4 viz completeness: Bloch/Wigner animations
    (reference: PiccoloQuantumToolboxExt.jl:145-349)."""
    pytest.importorskip("matplotlib")
    sysq = px.QuantumSystem(0.5 * px.PAULIS["Z"], [px.PAULIS["X"]], 1.0)
    times = np.linspace(0, 3.0, 12)
    pulse = px.ZeroOrderPulse(
        0.3 * np.ones((12, 1)), times)
    kt = px.KetTrajectory(sysq, pulse,
                          np.array([1.0, 0.0], complex),
                          np.array([0.0, 1.0], complex))
    anim = viz.animate_bloch(kt, stride=3)
    assert anim is not None

    k0 = px.quantum.coherent_ket(1.0, 6)
    k1 = px.quantum.coherent_ket(-1.0, 6)
    rhos = [np.outer(k, k.conj()) for k in (k0, k1)]
    anim = viz.animate_wigner(rhos, n_grid=21)
    assert anim is not None


def test_rydberg_chain_plots():
    """Rydberg chain plot family (reference:
    visualizations/systems/rydberg_chain.jl)."""
    pytest.importorskip("matplotlib")
    # populations: |10> on 2 atoms -> atom 1 excited, atom 2 ground
    psi = np.zeros(4, complex)
    psi[2] = 1.0
    pops = viz.rydberg_populations(psi, 2)
    np.testing.assert_allclose(pops, [1.0, 0.0], atol=1e-12)

    fig = viz.plot_rydberg_chain(3, 8.7, populations=[0.1, 0.9, 0.5])
    assert fig is not None

    sysr = px.quantum.RydbergChainSystem(N=2)
    times = np.linspace(0, 0.1, 8)
    pulse = px.ZeroOrderPulse(0.1 * np.ones((8, sysr.n_drives)), times)
    psi0 = np.zeros(4, complex)
    psi0[0] = 1.0
    ktr = px.KetTrajectory(sysr, pulse, psi0, psi)
    anim = viz.animate_rydberg_chain(ktr, 2, 8.7, stride=2)
    assert anim is not None
