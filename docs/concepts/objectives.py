# # Objectives
#
# The objective vocabulary and how templates assemble it (reference:
# docs/literate/concepts/objectives.jl).
#
# Every objective implements `stage_cost(k, get, g, params, N)` — a
# per-knot cost (terminal objectives gate on k == N-1); the NLP sums
# them over knots. `get(name)` reads a knot component; `g` holds the
# trajectory globals.
#
# Run it:  python docs/concepts/objectives.py   (CPU, ~1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax.control import objectives as obj   # noqa: E402

# ## The catalogue
#
# Fidelity (terminal):
#   * UnitaryInfidelityObjective      — Q (1 - F(U_T, goal)), Pedersen
#                                       subspace fidelity when embedded
#   * KetInfidelityObjective          — state-transfer overlap
#   * CoherentKetInfidelityObjective  — phase-consistent multi-ket
#   * DensityInfidelityObjective      — open-system target
#   * *FreePhase* variants            — goal evaluated at optimizable
#                                       phase globals
#   * UnitarySensitivityObjective     — variational-system sensitivity
#
# Regularization (per knot):
#   * QuadraticRegularizer(name, R)   — R/2 ||x_k||^2 on any component
#   * GlobalRegularizer               — on trajectory globals
#
# Structure:
#   * MinimumTimeObjective(D)         — D * sum(dt)
#   * LeakageObjective                — L1 leakage population penalty

# ## Q and R: the weights that matter
#
# Q multiplies the terminal infidelity; R multiplies smoothness
# regularizers. Their RATIO sets the trade-off — higher Q/R chases
# fidelity harder at the cost of rougher pulses:

sys_q = px.QuantumSystem(None, [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
N, T = 40, 8.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)


def solve_with(Q, R):
    pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
    qcp = px.SmoothPulseProblem(
        px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N, Q=Q, R=R)
    qcp.solve(max_iter=100, tol=1e-7, verbose=False)
    u = np.asarray(qcp.traj["u"])
    return float(qcp.fidelity()), float(np.square(np.diff(u, axis=0)).sum())


F_hi, rough_hi = solve_with(Q=1000.0, R=1e-3)
F_lo, rough_lo = solve_with(Q=10.0, R=1.0)
print(f"Q/R = 1e6: F = {F_hi:.6f}, roughness = {rough_hi:.4f}")
print(f"Q/R = 10:  F = {F_lo:.6f}, roughness = {rough_lo:.4f}")
assert F_hi > F_lo
assert rough_lo < rough_hi

# ## Custom objectives
#
# Subclass the base and pass through `extra_objectives`. Example: pull
# the controls toward a reference waveform (a calibration prior):


class StayNearObjective(obj._ObjectiveBase):
    """W/2 * ||u_k - u_ref_k||^2 — a tracking regularizer."""

    def __init__(self, name, u_ref, W=1.0):
        self.state_name = name
        self.u_ref = np.asarray(u_ref)
        self.W = W

    def stage_cost(self, k, get, g, params, N):
        import jax.numpy as jnp
        du = get(self.state_name) - jnp.asarray(self.u_ref)[k]
        return 0.5 * self.W * jnp.sum(du * du)


u_ref = 0.3 * np.sin(np.linspace(0, np.pi, N))[:, None] * np.ones((1, 2))
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N,
    Q=100.0, R=1e-2,
    extra_objectives=[StayNearObjective("u", u_ref, W=0.5)])
qcp.solve(max_iter=150, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
dist = float(np.abs(np.asarray(qcp.traj["u"]) - u_ref).mean())
print(f"custom tracking objective: F = {F:.6f}, mean |u - u_ref| = "
      f"{dist:.3f}")
assert F > 0.99

# Compare: without the tracking term the solution wanders further from
# the prior:

pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp0 = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N, Q=100.0, R=1e-2)
qcp0.solve(max_iter=150, tol=1e-7, verbose=False)
dist0 = float(np.abs(np.asarray(qcp0.traj["u"]) - u_ref).mean())
print(f"without tracking: mean |u - u_ref| = {dist0:.3f}")
assert dist < dist0
print("objectives complete.")
