# # Leakage Suppression
#
# Keeping population inside the computational subspace (reference:
# docs/literate/guides/leakage_suppression.jl).
#
# ## The problem
#
# Real qubits are multilevel systems. A drive that implements a perfect
# 2-level gate can still push population into |2> and beyond —
# "leakage" — which decoheres fast and breaks the gate on hardware.
#
# Run it:  python docs/guides/leakage_suppression.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## EmbeddedOperator: say where the gate lives

levels = 3
op = px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=levels)
assert list(op.leakage_indices()) == [2]

# Iso-vec index helpers used by the leakage objective/constraint:

assert len(op.iso_vec_subspace_indices()) == 2 * 2 * 2   # 2d^2 for d=2
assert len(op.iso_vec_leakage_indices()) == 4

# ## Three ways to suppress leakage
#
# 1. `leakage_cost` — L1-style penalty on leakage population (soft)
# 2. `leakage_value` — hard per-knot cap (constraint)
# 3. both — penalty steers, constraint guarantees
#
# All three are reachable through PiccoloOptions or template kwargs.

sys3 = px.quantum.TransmonSystem(levels=levels, drive_bounds=0.2)
N, T = 50, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)


def solve(**kw):
    pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
    qcp = px.SmoothPulseProblem(
        px.UnitaryTrajectory(sys3, pulse, op), N, Q=100.0, R=1e-2, **kw)
    qcp.solve(max_iter=120, tol=1e-7, verbose=False)
    return qcp


def peak_leakage(qcp):
    """Max instantaneous |2>-population over the gate, starting from
    the computational subspace."""
    qt = qcp.qtraj.rollout(qcp.pulse, n_substeps=4)
    Us = np.asarray(qt.Us)
    return float((np.abs(Us[:, 2, :2]) ** 2).sum(axis=1).max())


qcp_plain = solve()
qcp_cost = solve(leakage_cost=1.0)

L_plain, L_cost = peak_leakage(qcp_plain), peak_leakage(qcp_cost)
print(f"peak leakage: plain {L_plain:.3e} | cost {L_cost:.3e}")
assert L_cost < L_plain
assert float(qcp_cost.fidelity()) > 0.99

# Via the options record (tier-2 defaults; same effect):

opts = px.PiccoloOptions(leakage_cost=1.0)
qcp_opts = solve(options=opts)
assert peak_leakage(qcp_opts) < L_plain

# ## Manual leakage objectives
#
# The template sugar expands to LeakageObjective / LeakageConstraint —
# you can place them yourself for non-standard setups:

from piccolax.control import constraints as cons   # noqa: E402
from piccolax.control import objectives as obj     # noqa: E402

leak_idx = op.iso_vec_leakage_indices()
qcp_manual = solve(extra_objectives=[
    obj.LeakageObjective("U", leak_idx, Q=1.0)])
assert peak_leakage(qcp_manual) < L_plain
print(f"manual objective peak leakage: {peak_leakage(qcp_manual):.3e}")

# `LeakageConstraint` hard-caps the same quantity per knot:

qcp_hard = solve(leakage_value=0.05)
assert any(isinstance(c, cons.LeakageConstraint)
           for c in qcp_hard.constraints)
print(f"hard-capped peak leakage: {peak_leakage(qcp_hard):.3e}")
print("leakage_suppression complete.")
