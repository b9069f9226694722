"""Per-iteration component profile of the IPM body on the TPU.

Times each major component of the f32 iteration (batch 256, SX config)
inside a jitted scan (amortizes the tunnel dispatch), mirroring the
round-4 PROFILE.md methodology. Usage:
    PYTHONPATH=.:/root/.axon_site python scripts/profile_iter.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from piccolax import benchmarks as bm
from piccolax.solver import ipm as I
from piccolax.solver.kkt import condensed_factor, condensed_solve, psd_clamp

B, N = 256, 50
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    prob = bm.sx_gate_problem(N=N, T=10.0)
    nlp, params, Z0, g0, layout = prob.build()
    cast = lambda t: jtu.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, t)
    nlp, params = cast(nlp), cast(params)
    Zb = jnp.asarray(np.broadcast_to(np.asarray(Z0, np.float32)[None],
                                     (B, *Z0.shape)).copy())

dz, me, md = nlp.dz, nlp.me, nlp.md
m = me + md
print(f"B={B} N={N} dz={dz} m={m} (me={me}, md={md})")
lam_b = jnp.zeros((B, N, m), jnp.float32)
g_b = jnp.zeros((B, 0), jnp.float32)
REPS = 20


def timed(name, fn, *args):
    def scan_fn(c, _):
        out = fn(*args)
        # fold output into the carry so XLA cannot hoist the loop body
        s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating))
        return c + s, None

    f = jax.jit(lambda: jax.lax.scan(scan_fn, jnp.float32(0), None,
                                     length=REPS)[0])
    np.asarray(f())                     # compile+run
    t0 = time.time()
    np.asarray(f())
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:32s} {dt:8.2f} ms/iter")
    return dt


# components (vmapped over batch like the real body)
jac = jax.vmap(lambda Z: I._jacobians(nlp, Z, g_b[0], params))
hess = jax.vmap(lambda Z, lam: I._stage_hessians_split(nlp, Z, g_b[0],
                                                       params, lam))
timed("jacobians", jac, Zb)
timed("stage hessians (split)", hess, Zb, lam_b)

Cself, Cnext, Jg = jax.jit(jac)(Zb)
Hext = jax.jit(hess)(Zb, lam_b)
W = Hext[:, :, :dz, :dz]
timed("psd_clamp (20 NS iters)", jax.vmap(
    lambda w: psd_clamp(w, 3e-3, iters=20)), W)
HB = jax.jit(jax.vmap(lambda w: psd_clamp(w, 3e-3, iters=20)))(W)
Rrow = jnp.ones((B, N, m), jnp.float32) * 1e-3
Cn = Cnext[:, :-1]
fac = jax.vmap(condensed_factor)
timed("condensed factor (blocked chol + CR)", fac, HB, Cself, Rrow, Cn)
F = jax.jit(fac)(HB, Cself, Rrow, Cn)
rhs = jnp.ones((B, N, dz + m), jnp.float32)
timed("condensed solve x3 (S/SOC/refine)", jax.vmap(
    lambda f1, f2, c, cn, r: condensed_solve(
        (f1, f2), c, cn, r, dz)), F[0], F[1], Cself, Cn, rhs)
