# # Visualization
#
# The plotting toolbox (reference: docs/literate/guides/
# visualization.jl + reference/visualizations.jl). All functions
# return matplotlib figures (Agg backend — safe headless).
#
# Run it:  python docs/guides/visualization.py   (CPU, ~2 min)

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax import viz         # noqa: E402

outdir = tempfile.mkdtemp()


def save(fig, name):
    path = os.path.join(outdir, name)
    fig.savefig(path, dpi=80)
    assert os.path.getsize(path) > 1000
    print(f"wrote {name}")


# ## Pulse plots
#
# Type-aware: step rendering for ZOH, dense curves + knot markers for
# splines:

N, T = 30, 8.0
times = np.linspace(0, T, N)
rng = np.random.default_rng(0)
zoh = px.ZeroOrderPulse(0.1 * rng.standard_normal((N, 2)), times)
cub = px.CubicSplinePulse(0.1 * rng.standard_normal((N, 2)),
                          np.zeros((N, 2)), times)
save(viz.plot_pulse(zoh), "pulse_zoh.png")
save(viz.plot_pulse(cub), "pulse_cubic.png")

# IQ plane and instantaneous phase for 2-drive (I/Q) pulses:

save(viz.plot_pulse_IQ(cub), "pulse_iq.png")
save(viz.plot_pulse_phases(cub), "pulse_phases.png")

# ## Population dynamics
#
# Solve a quick gate and look at where the population goes:

sys_q = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                         [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, zoh, px.GATES["X"]), N, Q=100.0, R=1e-2)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)

save(viz.plot_unitary_populations(qcp.qtraj), "populations.png")

# ## Bloch sphere path (2-level ket trajectories)

ket0 = px.quantum.ket_from_string("g", [2])
ket1 = px.quantum.ket_from_string("e", [2])
ktraj = px.KetTrajectory(sys_q, qcp.pulse, ket0, ket1)
save(viz.plot_bloch_trajectory(ktraj), "bloch.png")

# ## Wigner functions (bosonic states)

psi_cat = px.quantum.coherent_ket(1.5, 10) \
    + px.quantum.coherent_ket(-1.5, 10)
psi_cat = psi_cat / np.linalg.norm(psi_cat)
rho_cat = np.outer(psi_cat, psi_cat.conj())
save(viz.plot_wigner(rho_cat, n_grid=41), "wigner_cat.png")

# ## Weyl chamber (two-qubit gates)
#
# Track a two-qubit trajectory through the Weyl chamber of local
# equivalence classes — CNOT sits at (1/2, 0, 0):

c = viz.weyl_coordinates(px.GATES["CX"])
np.testing.assert_allclose(c, [0.5, 0.0, 0.0], atol=1e-9)

gs = np.array([[0.0, 0.1], [0.1, 0.0]])
sys2q = px.quantum.MultiTransmonSystem([4.0, 4.1], [0.2, 0.2], gs,
                                       levels_per_transmon=2,
                                       drive_bounds=0.1)
pulse2q = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 4)), times)
qtraj2q = px.UnitaryTrajectory(sys2q, pulse2q, px.GATES["CX"])
save(viz.plot_weyl_trajectory(qtraj2q), "weyl.png")

# ## Animations
#
# `animate_pulse` renders an optimization-history flipbook;
# `animate_populations` sweeps a time cursor over the populations;
# `animate_bloch` / `animate_wigner` animate state evolution:

hist = [px.ZeroOrderPulse((i / 3.0) * np.asarray(zoh.values), times)
        for i in range(1, 4)]
p = os.path.join(outdir, "pulse_anim.gif")
viz.animate_pulse(hist, p, fps=2)
assert os.path.getsize(p) > 1000
print("wrote pulse_anim.gif")

p = os.path.join(outdir, "bloch_anim.gif")
viz.animate_bloch(ktraj, p, fps=4, stride=4)
assert os.path.getsize(p) > 1000
print("wrote bloch_anim.gif")

rhos = [np.outer(k, k.conj()) for k in
        (px.quantum.coherent_ket(1.0, 8), psi_cat[:8] / np.linalg.norm(psi_cat[:8]))]
p = os.path.join(outdir, "wigner_anim.gif")
viz.animate_wigner(rhos, p, fps=2, n_grid=31)
assert os.path.getsize(p) > 1000
print("wrote wigner_anim.gif")

# ## Live solve monitoring
#
# `LivePulsePlot` is a solve callback that re-renders the current
# pulse every few iterations (headless-safe):

lp = viz.LivePulsePlot(times)
qcp.solve(max_iter=20, tol=1e-7, verbose=False, callback=lp,
          callback_every=5)
assert len(lp.history) >= 2
print(f"live plot captured {len(lp.history)} snapshots")
print("visualization complete.")
