import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys

import numpy as np

from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions

backend = sys.argv[1] if len(sys.argv) > 1 else "cr"
prob = bm.cnot_problem(N=60, T=12.0)
opts = IPMOptions(max_iter=15, tol=1e-6, constr_viol_tol=1e-6,
                  kkt_backend=backend)
import io
import contextlib
if True:
    prob.solve(options=opts, verbose="detailed")
h = prob.history
prob2 = prob
d = np.asarray(h["delta"])
for i in range(0, 15):
    print(f"it={i:3d} f={float(h['f'][i]):.5e} kkt={float(h['kkt'][i]):.3e} "
          f"mu={float(h['mu'][i]):.2e} a={float(h['alpha'][i]):.2e} "
          f"delta={int(d[i])}")
print("F =", float(prob2.fidelity()))
