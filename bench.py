"""Benchmark: batched SX-gate collocation solves per second.

BASELINE.json config 1: single-qubit SX gate, 2 drives, N=50 knots.
Driver target: >= 1000 solves/s on a v5p-16 (16 chips) => ~62.5 solves/s
per chip. This bench runs a vmapped batch of independent SX solves
(different random initial pulses) on the available device(s) and reports
solves/s/chip.

The solver runs in FLOAT32 — the TPU-native path (MXU matmuls at full-f32
precision). The IPM's proximally-stabilized AL globalization and
dtype-aware regularization are what make f32 converge (solver/ipm.py);
solution quality is gated by an independent f64 ZOH re-integration of the
solved pulses on the host.

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
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--knots", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.tree_util as jtu

    import piccolax as px
    from piccolax.solver.ipm import IPMOptions, solve_nlp

    N = 15 if args.quick else args.knots
    B = args.batch or (4 if args.quick else 256)
    iters = 60 if args.quick else args.iters
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

        f32 = jnp.float32
        cast = lambda t: jtu.tree_map(
            lambda x: x.astype(f32) if hasattr(x, "dtype")
            and x.dtype == jnp.float64 else x, t)
        nlp, params = cast(nlp), cast(params)

        opts = IPMOptions(max_iter=iters, tol=1e-5, constr_viol_tol=1e-5)

        # batch over different initial pulses (calibration-sweep workload)
        u_sl = layout.slices["u"]
        Z0_batch = np.broadcast_to(
            np.asarray(Z0, np.float32)[None], (B, *Z0.shape)).copy()
        du0 = 0.02 * rng.standard_normal((B, N, 2)).astype(np.float32)
        Z0_batch[:, :, u_sl] += du0
        g0_batch = np.zeros((B, 0), np.float32)

    def solve_one(Z0_i, g0_i):
        return solve_nlp(nlp, params, Z0_i, g0_i, opts)

    fn = jax.jit(jax.vmap(solve_one))

    def run_once():
        st = fn(Z0_batch, g0_batch)
        # force materialization: through the remote (axon) TPU tunnel,
        # block_until_ready returns at enqueue time — only a device->host
        # transfer actually waits for execution.
        np.asarray(st.Z)
        return st

    # warmup / compile
    st = run_once()

    t0 = time.time()
    runs = 1 if args.quick else 3
    for _ in range(runs):
        st = run_once()
    dt = (time.time() - t0) / runs

    n_dev = jax.local_device_count()
    solves_per_s = B / dt
    per_chip = solves_per_s / max(n_dev, 1)

    # quality gate: exact f64 ZOH re-integration of every solved pulse on
    # the host (independent of the solver's discrete dynamics)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)        # [B, N, 2]
    from piccolax.quantum.dynamics import unitary_fidelity, unitary_rollout
    with jax.default_device(cpu):
        goal = jnp.asarray(px.GATES["SX"])
        Fs = []
        for b in range(min(B, 32)):                      # spot-check 32
            pulse = px.ZeroOrderPulse(us[b], times)
            Us = unitary_rollout(sys2, pulse, times)
            Fs.append(float(unitary_fidelity(Us[-1], goal)))
        Fs = np.asarray(Fs)
    mean_F = float(np.mean(Fs))
    frac_ok = float(np.mean(Fs > 0.999))

    baseline_per_chip = 1000.0 / 16.0  # v5p-16 target spread over 16 chips
    out = {
        "metric": f"SX-gate collocation solves/s/chip (N={N}, batch={B}, "
                  f"f32, rollout mean_F={mean_F:.6f}, "
                  f"frac_F>0.999={frac_ok:.2f})",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / baseline_per_chip, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
