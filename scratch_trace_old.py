import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions, solve_nlp_traced

prob = bm.cnot_problem(N=60, T=12.0)
opts = IPMOptions(max_iter=15, tol=1e-6, constr_viol_tol=1e-6)
nlp, params, Z0, g0, layout = prob.build()
st, h = jax.jit(solve_nlp_traced, static_argnames=("options",))(
    nlp, params, Z0, g0, options=opts)
st = jax.block_until_ready(st)
d = np.asarray(h["delta"])
for i in range(0, 15):
    print(f"it={i:3d} f={float(h['f'][i]):.5e} kkt={float(h['kkt'][i]):.3e} "
          f"mu={float(h['mu'][i]):.2e} a={float(h['alpha'][i]):.2e} "
          f"delta={int(d[i])}")
print("final kkt", float(st.kkt_err), "it", int(st.it))
