# # Guide: the interior-point solver — diagnostics, convexification modes,
# # and exact checkpoint/resume
#
# piccolax replaces the reference's Ipopt stack (reference:
# src/control/problems.jl solve! -> DirectTrajOpt -> Ipopt) with a
# batched, jittable interior-point method (`piccolax/solver/ipm.py`).
# This guide shows the user-facing controls that matter in practice:
# per-solve diagnostics, the Hessian convexification modes, and exact
# preemption recovery.
#
# Run it:  python docs/guides/solver_and_checkpointing.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np                      # noqa: E402
import piccolax as px                   # noqa: E402

# ## A small problem
#
# The quickstart SX gate at a reduced knot count (fast on CPU).

sys2 = px.QuantumSystem(np.zeros((2, 2)),
                        [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
N, T = 20, 10.0
times = np.linspace(0, T, N)
us = 0.01 * np.random.default_rng(0).standard_normal((N, 2))
qtraj = px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us, times),
                             px.GATES["SX"])
prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
prob.solve(max_iter=80, tol=1e-7, verbose=False)

# ## Solve diagnostics
#
# `prob.result` is the full IPMState. Termination is honest: `converged`
# means the RELATIVE KKT test passed (Knitro-style: dual and
# complementarity errors scaled by max(1, ||grad f||) and the Ipopt
# multiplier scale s_d); `stalled` means the numerical-floor detector
# stopped a solve that had ceased making progress (never reported as
# convergence).

r = prob.result
print(f"converged={bool(r.converged)} stalled={bool(r.stalled)} "
      f"it={int(r.it)}")
print(f"primal feasibility max|c| = {float(r.err_prim):.2e}")
print(f"scaled dual residual      = {float(r.err_dual):.2e}")
F = float(prob.fidelity())
print(f"fidelity = {F:.6f}")
assert F > 0.999

# ## Hessian convexification modes
#
# The collocation Lagrangian Hessian is indefinite (state rows carry no
# objective curvature; fidelity terms have negative eigenvalues ~ Q/n).
# Three eigendecomposition-free treatments are available via
# `IPMOptions.hess_mode` — all matmul-only (MXU-friendly):
#
# - `"clamp"` (default): Newton-Schulz PSD clamp U max(lam, 0) U^T.
#   Best for mildly nonconvex problems (the SX benchmark).
# - `"abs"`: saddle-free |H| = U |lam| U^T — negative curvature becomes
#   positive stiffness of the same magnitude. Required for strongly
#   nonconvex landscapes (leakage-suppressed qutrit gates, CNOT at
#   N=200): the clamp's flat treatment of negative directions makes the
#   dual residual creep for hundreds of iterations.
# - `"shift"`: Ipopt-style adaptive inertia shift W + delta_w I with
#   delta_w adapted across iterations (one factorization per iteration).

from piccolax.solver.ipm import IPMOptions  # noqa: E402

opts_abs = IPMOptions(max_iter=80, tol=1e-7, constr_viol_tol=1e-7,
                      hess_mode="abs")
prob_abs = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
prob_abs.solve(options=opts_abs, verbose=False)
F_abs = float(prob_abs.fidelity())
print(f"hess_mode='abs': fidelity = {F_abs:.6f}")
assert F_abs > 0.999

# ## Exact checkpoint / resume
#
# `solve_nlp(resume_from=state)` restores the COMPLETE iterate — primal,
# duals, barrier parameter, and every adaptation counter — so a
# preempted batch solve continues exactly where it stopped: k + (n-k)
# iterations reproduces n uninterrupted iterations bit-for-bit. This is
# the production preemption-recovery path (the reference's warm-start
# workflow, src/control/CONTEXT.md:105-132, but exact).

from piccolax.solver.ipm import solve_nlp  # noqa: E402
from piccolax.utils.checkpoint import (    # noqa: E402
    load_solver_state, save_solver_state)

nlp, params, Z0, g0, layout = prob.build()


def run(iters, resume=None):
    o = IPMOptions(max_iter=iters, tol=1e-10, constr_viol_tol=1e-10)
    return jax.jit(lambda Z, g, rs: solve_nlp(nlp, params, Z, g, o,
                                              resume_from=rs))(Z0, g0, resume)


full = run(40)
part = run(15)                                   # "preempted" at 15 its
ckpt = "/tmp/piccolax_guide_ckpt.npz"
save_solver_state(ckpt, part)                    # persist across processes
restored = load_solver_state(ckpt, like=part)
resumed = run(25, resume=restored)               # 15 + 25 == 40
assert np.array_equal(np.asarray(resumed.Z), np.asarray(full.Z))
print("15 + 25 iterations == 40 uninterrupted: bit-exact")

# ## In-terminal inspection
#
# The detailed display tier renders a live tree plus a unicode pulse
# sparkline (the reference's UnicodePlots tier, display/plot.jl:2-12).

from piccolax.control.display import pulse_sparkline  # noqa: E402

print(pulse_sparkline(np.asarray(prob.traj["u"]), labels=["ux", "uy"]))
print("guide OK")
