"""Convergence-count check for the config-2 recipe (solve_nlp, early exit)."""
from __future__ import annotations

import argparse
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=400)
ap.add_argument("--batch", type=int, default=16)
ap.add_argument("--tol", type=float, default=5e-3)
args = ap.parse_args()

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions, solve_nlp

cpu = jax.devices("cpu")[0]
N, T, B = 100, 20.0, args.batch
with jax.default_device(cpu):
    prob = bm.qutrit_x_problem(N=N, T=T)
    nlp, params, Z0, g0, layout = prob.build()
    cast = lambda t: jtu.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    nlp, params = cast(nlp), cast(params)
    u_sl = layout.slices["u"]
    rng = np.random.default_rng(0)
    Zb = np.broadcast_to(np.asarray(Z0, np.float32)[None],
                         (B, *Z0.shape)).copy()
    Zb[:, :, u_sl] += 0.005 * rng.standard_normal(
        (B, Z0.shape[0], 2)).astype(np.float32)
    gb = np.zeros((B, 0), np.float32)

opts = IPMOptions(max_iter=args.iters, tol=args.tol, constr_viol_tol=args.tol,
                  hess_mode="abs", delta_c_f32=1e-4, prox_iter=3)
fn = jax.jit(jax.vmap(lambda Z, g: solve_nlp(nlp, params, Z, g, opts)))
t0 = time.time()
st = fn(jnp.asarray(Zb), jnp.asarray(gb))
Z = np.asarray(st.Z)
print(f"wall {time.time() - t0:.0f}s  converged "
      f"{int(np.asarray(st.converged).sum())}/{B}  stalled "
      f"{int(np.asarray(st.stalled).sum())}/{B}")
print("it:", np.asarray(st.it))
print("kkt:", np.asarray(st.kkt_err))
print("prim:", np.asarray(st.err_prim))
print("dual:", np.asarray(st.err_dual))

from piccolax.verification import batched_unitary_dop853, pedersen_fidelity_np
from piccolax.quantum.operators import annihilate
from piccolax.quantum.gates import GATES

us = np.asarray(Z[:, :, u_sl], np.float64)
times = np.linspace(0, T, N)
a = annihilate(3)
ad = a.conj().T
H0 = 2 * np.pi * (-0.2 / 2) * (ad @ ad @ a @ a)
Hds = [2 * np.pi * (a + ad), 2 * np.pi * 1j * (a - ad)]
U64 = batched_unitary_dop853(H0, Hds, us, times)
Fs = pedersen_fidelity_np(U64[:, :2, :2], GATES["X"])
print(f"f64 frac>0.99={np.mean(Fs > 0.99):.2f} mean_F={Fs.mean():.5f}")
