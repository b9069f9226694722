"""A/B of IPM recipes on the SX headline benchmark config (TPU)."""
from __future__ import annotations

import argparse
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--iters", type=int, default=60)
ap.add_argument("--runs", type=int, default=2)
args = ap.parse_args()

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions, solve_nlp

cpu = jax.devices("cpu")[0]
N, T, B = 50, 10.0, args.batch
with jax.default_device(cpu):
    prob = bm.sx_gate_problem(N=N, T=T)
    nlp, params, Z0, g0, layout = prob.build()
    cast = lambda t: jtu.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    nlp, params = cast(nlp), cast(params)
    u_sl = layout.slices["u"]
    rng = np.random.default_rng(0)
    Zb = np.broadcast_to(np.asarray(Z0, np.float32)[None],
                         (B, *Z0.shape)).copy()
    Zb[:, :, u_sl] += 0.02 * rng.standard_normal(
        (B, Z0.shape[0], 2)).astype(np.float32)
    gb = np.zeros((B, 0), np.float32)
Zb, gb = jnp.asarray(Zb), jnp.asarray(gb)

RECIPES = {
    "baseline": dict(),
    "ls6": dict(ls_iters=6),
    "clamp15": dict(clamp_iters=15),
    "ls6+clamp15": dict(ls_iters=6, clamp_iters=15),
}

for name, kw in RECIPES.items():
    opts = IPMOptions(max_iter=args.iters, tol=5e-3, constr_viol_tol=5e-3,
                      **kw)
    fn = jax.jit(jax.vmap(lambda Z, g: solve_nlp(nlp, params, Z, g, opts)))
    st = fn(Zb, gb)
    np.asarray(st.Z)                      # materialize (compile+run)
    t0 = time.time()
    for _ in range(args.runs):
        st = fn(Zb, gb)
        np.asarray(st.Z)
    dt = (time.time() - t0) / args.runs
    its = np.asarray(st.it)
    conv = int(np.asarray(st.converged).sum())
    print(f"{name:15s} conv={conv}/{B} it_mean={its.mean():6.1f} "
          f"it_max={its.max():3d} wall={dt:6.2f}s "
          f"solves/s={B / dt:7.1f}", flush=True)
