"""Benchmark: batched SX-gate collocation solves per second.

BASELINE.json config 1: single-qubit SX gate, 2 drives, N=50 knots.
Driver target: >= 1000 solves/s on a v5p-16 (16 chips) => ~62.5 solves/s
per chip. This bench runs a vmapped batch of independent SX solves
(different random initial pulses) on the available device(s) and reports
solves/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Usage: python bench.py [--quick] [--batch B] [--iters I]
  --quick: small CPU-safe run (used by the project verify skill).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--knots", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    # The solver runs in float64: the quasidefinite KKT recursion spans a
    # ~1e15 dynamic range (boundary-pinned knots regularized only by
    # delta_c), beyond f32. On TPU, f64 is software-emulated — the whole
    # solver is matmul-only real arithmetic precisely so that the
    # emulation compiles (no LU/c128; see solver/kkt.py, ops/expm.py).
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import piccolax as px
    from piccolax.solver.ipm import IPMOptions, solve_nlp

    N = 15 if args.quick else args.knots
    B = args.batch or (4 if args.quick else 64)
    T = 10.0

    # Build the problem entirely on CPU: eager dispatches to the TPU are
    # serialized through the remote-compile tunnel; only the jitted solver
    # should touch the device.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sys2 = px.QuantumSystem(np.zeros((2, 2)),
                                [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
        times = np.linspace(0, T, N)
        rng = np.random.default_rng(0)
        us0 = 0.01 * rng.standard_normal((N, 2))
        qtraj = px.UnitaryTrajectory(sys2, px.ZeroOrderPulse(us0, times),
                                     px.GATES["SX"])
        prob = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2,
                                     du_bound=0.5, ddu_bound=1.0)
        nlp, params, Z0, g0, layout = prob.build()

        opts = IPMOptions(max_iter=args.iters, tol=1e-6, constr_viol_tol=1e-6)

        # batch over different initial pulses (calibration-sweep workload)
        u_sl = layout.slices["u"]
        Z0_batch = jnp.broadcast_to(Z0[None], (B, *Z0.shape)).copy()
        du0 = 0.02 * rng.standard_normal((B, N, 2))
        Z0_batch = Z0_batch.at[:, :, u_sl].add(du0)
        g0_batch = jnp.zeros((B, 0))

    def solve_one(Z0_i, g0_i):
        return solve_nlp(nlp, params, Z0_i, g0_i, opts)

    fn = jax.jit(jax.vmap(solve_one))

    # warmup / compile
    st = fn(Z0_batch, g0_batch)
    jax.block_until_ready(st)

    t0 = time.time()
    runs = 1 if args.quick else 3
    for _ in range(runs):
        st = fn(Z0_batch, g0_batch)
        jax.block_until_ready(st)
    dt = (time.time() - t0) / runs

    n_dev = jax.local_device_count()
    solves_per_s = B / dt
    per_chip = solves_per_s / max(n_dev, 1)

    # solution-quality gate: mean fidelity of solved problems (CPU eval)
    from piccolax.quantum import isomorphisms as iso
    from piccolax.quantum.dynamics import unitary_fidelity
    U_sl = layout.slices["U"]
    Z_host = jnp.asarray(np.asarray(st.Z))
    with jax.default_device(cpu):
        U_final = iso.iso_vec_to_operator(Z_host[:, -1, U_sl])
        F = np.asarray(unitary_fidelity(U_final, jnp.asarray(px.GATES["SX"])))
    mean_F = float(np.mean(F))
    frac_ok = float(np.mean(F > 0.999))

    baseline_per_chip = 1000.0 / 16.0  # v5p-16 target spread over 16 chips
    out = {
        "metric": f"SX-gate collocation solves/s/chip (N={N}, batch={B}, "
                  f"mean_F={mean_F:.6f}, frac_F>0.999={frac_ok:.2f})",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / baseline_per_chip, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
