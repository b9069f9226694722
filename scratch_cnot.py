import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import sys
import time

from piccolax import benchmarks as bm
from piccolax.solver.ipm import IPMOptions

backend = sys.argv[1] if len(sys.argv) > 1 else "cr"
stall = int(sys.argv[2]) if len(sys.argv) > 2 else 12

prob = bm.cnot_problem(N=60, T=12.0)
opts = IPMOptions(max_iter=250, tol=1e-6, constr_viol_tol=1e-6,
                  kkt_backend=backend, stall_iter=stall)
t0 = time.time()
prob.solve(options=opts, verbose=True)
st = prob.result
print(f"backend={backend} stall={stall} F={float(prob.fidelity()):.6f} "
      f"it={int(st.it)} kkt={float(st.kkt_err):.3e} "
      f"t={time.time()-t0:.1f}s delta_used={float(st.delta_used)}")
