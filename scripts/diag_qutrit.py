"""Round-5 diagnostic: why does BASELINE config 2 (qutrit X, N=100)
fail its tolerance test (judge: 0/64 converged, frac_F>0.99 = 0.70)?

Runs a small batch with solve_nlp_traced to record per-iteration
kkt/mu/alpha/delta, then prints the history plus final rollout
fidelities. Usage: python scripts/diag_qutrit.py [--iters I] [--batch B]
"""
from __future__ import annotations

import argparse

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=60)
ap.add_argument("--batch", type=int, default=8)
ap.add_argument("--tol", type=float, default=5e-3)
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--f64", action="store_true")
ap.add_argument("--mode", default="clamp", choices=["clamp", "shift", "abs"])
ap.add_argument("--kappa_eps", type=float, default=10.0)
ap.add_argument("--delta_c_f32", type=float, default=1e-3)
ap.add_argument("--prox_iter", type=int, default=6)
ap.add_argument("--unbound", action="store_true",
                help="drop the +-1 state box (reference bound_state=false)")
ap.add_argument("--Q", type=float, default=None)
ap.add_argument("--mu_init", type=float, default=1e-1)
ap.add_argument("--hist_every", type=int, default=1)
ap.add_argument("--N", type=int, default=100)
ap.add_argument("--T", type=float, default=20.0)
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if args.f64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import piccolax as px
from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions, solve_nlp_traced

cpu = jax.devices("cpu")[0]
N, T, B = args.N, args.T, args.batch

with jax.default_device(cpu):
    kwq = {} if args.Q is None else {"Q": args.Q}
    if args.unbound:
        kwq["state_bound"] = None
    prob = bm.qutrit_x_problem(N=N, T=T, **kwq)
    nlp, params, Z0, g0, layout = prob.build()
    import jax.tree_util as jtu
    fdt = np.float64 if args.f64 else np.float32
    if not args.f64:
        cast = lambda t: jtu.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
        nlp, params = cast(nlp), cast(params)
    u_sl = layout.slices["u"]
    rng = np.random.default_rng(0)
    Zb = np.broadcast_to(np.asarray(Z0, fdt)[None],
                         (B, *Z0.shape)).copy()
    Zb[:, :, u_sl] += 0.005 * rng.standard_normal(
        (B, Z0.shape[0], u_sl.stop - u_sl.start)).astype(fdt)
    gb = np.zeros((B, 0), fdt)

print(f"dz={nlp.dz} me={nlp.me} md={nlp.md} N={nlp.N} slices={layout.slices}")

opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                  constr_viol_tol=args.tol, hess_mode=args.mode,
                  kappa_eps=args.kappa_eps, mu_init=args.mu_init,
                  delta_c_f32=args.delta_c_f32, prox_iter=args.prox_iter)
fn = jax.jit(jax.vmap(lambda Z, g: solve_nlp_traced(nlp, params, Z, g, opts)))
st, hist = fn(jnp.asarray(Zb), jnp.asarray(gb))
kkt = np.asarray(hist["kkt"])  # [B, iters]
mu = np.asarray(hist["mu"])
al = np.asarray(hist["alpha"])
de = np.asarray(hist["delta"])
f = np.asarray(hist["f"])
ep = np.asarray(hist["err_prim"])
ed = np.asarray(hist["err_dual"])
dw = np.asarray(hist["dw"])

conv = np.asarray(st.converged)
stalled = np.asarray(st.stalled)
print(f"converged {conv.sum()}/{B}  stalled {stalled.sum()}/{B}  "
      f"it={np.asarray(st.it)}")
print(f"final kkt_err: {np.asarray(st.kkt_err)}")

# history for first 3 problems
for b in range(min(3, B)):
    print(f"\n--- problem {b} (conv={conv[b]}, stalled={stalled[b]}) ---")
    for i in range(0, args.iters, args.hist_every):
        print(f"  it{i:3d} kkt={kkt[b, i]:10.3e} prim={ep[b, i]:9.2e} "
              f"dual={ed[b, i]:9.2e} mu={mu[b, i]:8.2e} "
              f"alpha={al[b, i]:8.2e} delta={de[b, i]:5.0f} "
              f"dw={dw[b, i]:8.1e} f={f[b, i]:12.5e}")

# rollout quality
us = np.asarray(st.Z[:, :, u_sl], np.float64)
times = np.linspace(0, T, N)
from piccolax.quantum.dynamics import unitary_rollout

with jax.default_device(cpu):
    sys3 = px.TransmonSystem(levels=3, omega=4.0, delta=0.2, drive_bounds=0.2)
    goal = jnp.asarray(px.GATES["X"])

    def fid_leak(u):
        Us = unitary_rollout(sys3, px.ZeroOrderPulse(u, times), times)
        Usub = Us[-1][:2, :2]
        d = 2
        tr_gu = jnp.trace(goal.conj().T @ Usub)
        tr_uu = jnp.trace(Usub.conj().T @ Usub)
        F = (jnp.abs(tr_gu) ** 2 + tr_uu.real) / (d * (d + 1))
        leak = 1.0 - tr_uu.real / d
        return F, leak

    Fs, leaks = jax.jit(jax.vmap(fid_leak))(jnp.asarray(us))
    Fs, leaks = np.asarray(Fs), np.asarray(leaks)
print(f"\nrollout F: {Fs}")
print(f"leakage:   {leaks}")
print(f"mean_F={Fs.mean():.5f} frac>0.99={np.mean(Fs > 0.99):.2f} "
      f"mean_leak={leaks.mean():.2e}")
