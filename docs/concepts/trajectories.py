# # Trajectories
#
# The quantum trajectory types: what to optimize over (reference:
# docs/literate/concepts/trajectories.jl).
#
# | Type                   | Optimizes          | State dim (iso) |
# |------------------------|--------------------|-----------------|
# | `UnitaryTrajectory`    | full gate          | 2 d^2           |
# | `KetTrajectory`        | one state mapping  | 2 d             |
# | `MultiKetTrajectory`   | several mappings   | 2 d per ket     |
# | `DensityTrajectory`    | open-system state  | d^2 (compact)   |
# | `MultiDensityTrajectory` | several mixed states | d^2 each    |
# | `SamplingTrajectory`   | robustness ensemble | replicated     |
#
# Each bundles system + pulse + goal, rolls out at construction, and
# exposes `fidelity()`, `rollout()`, and `knot_times`.
#
# Run it:  python docs/concepts/trajectories.py   (CPU, ~1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

sys_q = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                         [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
N, T = 40, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

# ## UnitaryTrajectory

qtraj_U = px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"])
print(f"unitary  F0 = {float(qtraj_U.fidelity()):.4f}")
assert np.asarray(qtraj_U.Us).shape == (N, 2, 2)

# ## KetTrajectory

ket0 = px.quantum.ket_from_string("g", [2])
ket1 = px.quantum.ket_from_string("e", [2])
qtraj_k = px.KetTrajectory(sys_q, pulse, ket0, ket1)
print(f"ket      F0 = {float(qtraj_k.fidelity()):.4f}")

# ## MultiKetTrajectory (coherent fidelity across mappings)

qtraj_mk = px.MultiKetTrajectory(sys_q, pulse, [ket0, ket1],
                                 [ket1, ket0])
print(f"multiket F0 = {float(qtraj_mk.fidelity()):.4f}")

# ## DensityTrajectory (open system)

a = px.quantum.annihilate(2)
open_sys = px.OpenQuantumSystem(0.5 * px.PAULIS["Z"], [px.PAULIS["X"]],
                                drive_bounds=1.0,
                                dissipation_operators=[0.05 * a])
rho0 = np.outer(ket0, ket0.conj())
rho1 = np.outer(ket1, ket1.conj())
pulse1 = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 1)), times)
qtraj_rho = px.DensityTrajectory(open_sys, pulse1, rho0, rho1)
print(f"density  F0 = {float(qtraj_rho.fidelity()):.4f}")

# ## Solving: any trajectory type drops into the same template

qcp = px.SmoothPulseProblem(qtraj_U, N, Q=100.0, R=1e-2)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)
assert float(qcp.fidelity()) > 0.999

# ## Extracting the optimized pulse
#
# `qcp.pulse` rebuilds a pulse of the ORIGINAL parameterization from
# the optimized knots (`extract_pulse` under the hood); re-rolling out
# reproduces the collocation fidelity because ZOH steps are exact:

new_pulse = qcp.pulse
assert isinstance(new_pulse, px.ZeroOrderPulse)
qtraj_check = qtraj_U.rollout(new_pulse)
assert abs(float(qtraj_check.fidelity()) - float(qcp.fidelity())) < 1e-9

# ## Discretization: trajectory -> knot Trajectory
#
# `discretize` converts a quantum trajectory into the flat knot-point
# `Trajectory` container the solver operates on (states, controls,
# bounds, pins, goals):

traj = px.discretize(qtraj_U, N)
assert traj.N == N
assert "U" in traj.data and "u" in traj.data
print("discretized components:", list(traj.data))
print("trajectories complete.")
