# # SplinePulseProblem
#
# Collocation with continuous pulse parameterizations (reference:
# docs/literate/problem-templates/spline_pulse.jl).
#
# ## When to use
#
# * Hardware requires continuous (C^0) or continuously-differentiable
#   (C^1) waveforms.
# * You already have a ZOH solution and want a smooth refinement
#   (the recommended warm-start pipeline — see
#   docs/two_qubit_gate_validation.py).
#
# ## Pulse requirements
#
# * `LinearSplinePulse(values, times)` — C^0; the slope variables du
#   are CONSTRAINED to the finite differences of u.
# * `CubicSplinePulse(values, tangents, times)` — C^1 Hermite; the
#   tangents du are FREE decision variables.
#
# Run it:  python docs/problem_templates/spline_pulse.py  (CPU, ~1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

sys_q = px.QuantumSystem(np.zeros((2, 2)),
                         [0.5 * px.PAULIS["X"], 0.5 * px.PAULIS["Y"]],
                         drive_bounds=1.0)
T, N = 6.0, 25
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)

# ## Linear spline

pulse_lin = px.LinearSplinePulse(0.01 * rng.standard_normal((N, 2)), times)
qtraj = px.UnitaryTrajectory(sys_q, pulse_lin, px.GATES["SX"])
qcp_lin = px.SplinePulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp_lin.solve(max_iter=150, tol=1e-7, verbose=False)
F = float(qcp_lin.fidelity())
assert F > 0.999, F
print(f"linear spline: F = {F:.6f}")

# The slope constraint holds at the optimum:

u = np.asarray(qcp_lin.traj["u"])
du = np.asarray(qcp_lin.traj["du"])
dts = np.asarray(qcp_lin.traj.get_timesteps())
np.testing.assert_allclose((u[1:] - u[:-1]) / dts[:-1, None], du[:-1],
                           atol=1e-5)

# And the extracted pulse is genuinely continuous:

assert isinstance(qcp_lin.pulse, px.LinearSplinePulse)

# ## Cubic spline
#
# Tangents start at zero; the optimizer shapes them freely.

pulse_cub = px.CubicSplinePulse(0.01 * rng.standard_normal((N, 2)),
                                np.zeros((N, 2)), times)
qtraj = px.UnitaryTrajectory(sys_q, pulse_cub, px.GATES["SX"])
qcp_cub = px.SplinePulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp_cub.solve(max_iter=150, tol=1e-7, verbose=False)
F = float(qcp_cub.fidelity())
assert F > 0.999, F
print(f"cubic spline:  F = {F:.6f}")

# The Hermite tangents survive extraction (they are the pulse's C^1
# degrees of freedom, not finite differences):

np.testing.assert_allclose(np.asarray(qcp_cub.pulse.tangents),
                           np.asarray(qcp_cub.traj["du"]), atol=1e-12)

# ## Native knot times (recommended for warm starts)
#
# `N=None` reuses the pulse's own knots — no resampling, so a
# previously-optimized pulse round-trips exactly:

qtraj = px.UnitaryTrajectory(sys_q, qcp_lin.pulse, px.GATES["SX"])
qcp_native = px.SplinePulseProblem(qtraj, None, Q=100.0, R=1e-2)
assert qcp_native.traj.N == N
np.testing.assert_allclose(np.asarray(qcp_native.traj.get_times()),
                           np.asarray(qcp_lin.pulse.times), atol=1e-12)
qcp_native.solve(max_iter=50, tol=1e-7, verbose=False)
assert float(qcp_native.fidelity()) > 0.999
print(f"native-knot:   F = {float(qcp_native.fidelity()):.6f} "
      f"(warm start, 50 iters)")

# ## Discretization accuracy
#
# Spline collocation steps are NOT exact (unlike ZOH) — always
# validate with an independent re-integration:

from piccolax.quantum import dynamics as dyn   # noqa: E402
import jax.numpy as jnp                        # noqa: E402

Us = dyn.rollout_with_scipy(sys_q, qcp_cub.pulse,
                            np.asarray(qcp_cub.traj.get_times()))
F_scipy = float(dyn.unitary_fidelity(jnp.asarray(Us[-1]),
                                     jnp.asarray(px.GATES["SX"])))
assert abs(F_scipy - float(qcp_cub.fidelity())) < 1e-4
print(f"scipy check:   |dF| = "
      f"{abs(F_scipy - float(qcp_cub.fidelity())):.2e}")
print("spline_pulse complete.")
