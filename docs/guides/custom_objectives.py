# # Custom Objectives
#
# Extending the objective vocabulary (reference:
# docs/literate/guides/custom_objectives.jl).
#
# An objective is any object with
#
#     stage_cost(k, get, g, params, N) -> scalar
#
# summed over knots k. `get(name)` reads knot component `name` at k;
# `g` is the flat globals vector; `params` carries the system/goal
# tables. Derivatives come from JAX autodiff — no hand gradients.
#
# Run it:  python docs/guides/custom_objectives.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax.control import objectives as obj   # noqa: E402

sys_q = px.QuantumSystem(None, [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
N, T = 40, 8.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)


# ## A custom TERMINAL objective
#
# Gate on k == N-1 (the `_terminal` helper does this branch-free).
# Example: penalize ending with non-zero drive amplitude — a soft
# version of the final=0 pin:


class SoftLandingObjective(obj._ObjectiveBase):
    def __init__(self, name="u", W=10.0):
        self.name, self.W = name, W

    def stage_cost(self, k, get, g, params, N):
        u = get(self.name)
        return obj._terminal(k, N, 0.5 * self.W * jnp.sum(u * u))


# ## A custom KNOTPOINT objective
#
# Runs at every knot. Example: L1-ish amplitude sparsity (smooth
# approximation so the Hessian exists):


class SparseAmplitudeObjective(obj._ObjectiveBase):
    def __init__(self, name="u", W=0.1, eps=1e-4):
        self.name, self.W, self.eps = name, W, eps

    def stage_cost(self, k, get, g, params, N):
        u = get(self.name)
        return self.W * jnp.sum(jnp.sqrt(u * u + self.eps ** 2))


# ## Adding to a problem


def solve(extra=()):
    pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
    qcp = px.SmoothPulseProblem(
        px.UnitaryTrajectory(sys_q, pulse, px.GATES["H"]), N,
        Q=100.0, R=1e-2, extra_objectives=list(extra))
    qcp.solve(max_iter=150, tol=1e-7, verbose=False)
    return qcp


qcp0 = solve()
qcp_sparse = solve([SparseAmplitudeObjective(W=0.05)])

amp0 = float(np.abs(np.asarray(qcp0.traj["u"])).mean())
amp1 = float(np.abs(np.asarray(qcp_sparse.traj["u"])).mean())
print(f"mean |u|: plain {amp0:.4f} vs sparse {amp1:.4f}")
assert amp1 < amp0
assert float(qcp_sparse.fidelity()) > 0.995

qcp_land = solve([SoftLandingObjective(W=100.0)])
u_end = float(np.abs(np.asarray(qcp_land.traj["u"])[-1]).max())
print(f"soft landing: |u_final| = {u_end:.4f}")
assert float(qcp_land.fidelity()) > 0.995

# ## Tips
#
# 1. SCALE matters: objectives compete — compare magnitudes against
#    Q * infidelity (~Q * 1e-3 near convergence) before despairing.
# 2. Keep stage_cost jax-traceable: no data-dependent Python branching
#    (use jnp.where), no in-place mutation.
# 3. Keep it SMOOTH: the IPM consumes exact Hessians via autodiff;
#    kinks (abs, max) should be smoothed or reformulated with slacks
#    (see BangBangPulseProblem's L1 slack splitting).
# 4. Terminal quantities gate on k == N-1 with `_terminal` so the
#    objective stays a per-knot sum the structured KKT understands.
print("custom_objectives complete.")
