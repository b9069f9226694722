# # Multilevel Transmon
#
# An X gate on the qubit subspace of a 3-level transmon, with leakage
# suppression (reference: docs/literate/multilevel_transmon.jl).
#
#     H(t) = -(delta/2) n(n-1) + u1(t)(a + a^dag) + u2(t) i(a - a^dag)
#
# with anharmonicity delta = 0.2 GHz, |u_i| <= 0.2 GHz, T = 10 ns.
#
# Run it:  python docs/multilevel_transmon.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## The system
#
# `TransmonSystem` builds the Duffing-oscillator model in the rotating
# frame (reference: src/quantum/templates — transmons):

levels = 3
sys = px.quantum.TransmonSystem(omega=4.0, delta=0.2, levels=levels,
                                drive_bounds=0.2)

# ## The goal: an embedded gate
#
# The X gate lives on the 2-dimensional qubit subspace of the 3-level
# transmon. `EmbeddedOperator` records both the full-space operator and
# the subspace indices, so fidelity is measured on the subspace only
# (Pedersen subspace fidelity) while the dynamics run in full space.

U_goal = px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=levels)
print("subspace indices:", U_goal.subspace)
print("leakage indices: ", U_goal.leakage_indices())

# ## Baseline solve (no leakage handling)

T, N = 10.0, 50
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

qtraj = px.UnitaryTrajectory(sys, pulse, U_goal)
qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
print(f"baseline subspace fidelity: {F:.6f}")
assert F > 0.999, F

# ## Leakage-suppressed solve
#
# `PiccoloOptions(leakage_cost=...)` adds an L1-style penalty on the
# population of the leakage levels at every knot
# (reference: options.jl leakage_suppression path). You can also hard-
# constrain it with `leakage_constraint_value`.

opts = px.PiccoloOptions(leakage_cost=1.0)
pulse2 = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj2 = px.UnitaryTrajectory(sys, pulse2, U_goal)
qcp_leak = px.SmoothPulseProblem(qtraj2, N, Q=100.0, R=1e-2, options=opts)
qcp_leak.solve(max_iter=100, tol=1e-7, verbose=False)
F_leak = float(qcp_leak.fidelity())
print(f"leakage-suppressed fidelity: {F_leak:.6f}")
assert F_leak > 0.995, F_leak


# ## Compare integrated leakage population
#
# Roll out both pulses and integrate the |2>-level population of the
# implemented unitary's action on the qubit subspace:

def integrated_leakage(qcp):
    qt = qcp.qtraj.rollout(qcp.pulse, n_substeps=4)
    Us = np.asarray(qt.Us)                         # [N, d, d] complex
    leak = np.abs(Us[:, 2, :2]) ** 2               # pop of |2> from |0>,|1>
    return float(leak.sum(axis=(1,)).mean())


L0, L1 = integrated_leakage(qcp), integrated_leakage(qcp_leak)
print(f"mean leakage population: baseline {L0:.2e} vs suppressed {L1:.2e}")
assert L1 < L0, (L1, L0)
print("multilevel_transmon complete.")
