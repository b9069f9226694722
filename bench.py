"""Benchmark: the five BASELINE configs as batched TPU collocation solves.

Default run = config 1 (SX gate, N=50, batch 256) — the driver's headline
metric (>= 1000 solves/s on a v5p-16 => 62.5 solves/s/chip). `--all` also
runs configs 2-5 at full BASELINE sizes, printing ONE JSON line per
config; the config-1 line is always printed LAST so the driver's parser
picks it up:

1. SX gate, 2-level, 2 drives, N=50 (batch 256)
2. qutrit X with leakage suppression, N=100 (batch 64)
3. two-qubit CNOT on coupled transmons, N=200 (batch 16, F >= 0.999 gate
   per reference two_qubit_gate_validation.jl:347)
4. 1024-member robustness ensemble via vmap (per-sample perturbed drift)
5. open-system Lindblad 3-level transmon with decay, N=50 (batch 64)

The solver runs in FLOAT32 — the TPU-native path (MXU matmuls at full-f32
precision). Every solve must pass the IPM tolerance test (tol 5e-3, the
honest f32 target — no stall heuristic), and solution quality is gated by
an independent f64 re-integration of ALL solved pulses on the host.

Usage: python bench.py [--quick] [--all] [--batch B] [--iters I]
  --quick: small CPU-safe run (used by the project verify skill).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TOL = 5e-3


def _cast32(tree):
    import jax.numpy as jnp
    import jax.tree_util as jtu
    return jtu.tree_map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype")
        and x.dtype == jnp.float64 else x, tree)


def _timed_batch_solve(nlp, params, Z0_b, g0_b, opts, runs=3,
                       params_batched=False):
    """jit(vmap(solve_nlp)), warmup + timed runs; returns (state, dt)."""
    import jax
    from piccolax.solver.ipm import solve_nlp

    if params_batched:
        fn = jax.jit(jax.vmap(
            lambda Z, g, p: solve_nlp(nlp, p, Z, g, opts),
            in_axes=(0, 0, 0)))
        args = (Z0_b, g0_b, params)
    else:
        fn = jax.jit(jax.vmap(
            lambda Z, g: solve_nlp(nlp, params, Z, g, opts)))
        args = (Z0_b, g0_b)

    def run_once():
        st = fn(*args)
        # force materialization: through the remote (axon) TPU tunnel,
        # block_until_ready returns at enqueue time — only a device->host
        # transfer actually waits for execution.
        np.asarray(st.Z)
        return st

    st = run_once()                          # warmup / compile
    t0 = time.time()
    for _ in range(runs):
        st = run_once()
    return st, (time.time() - t0) / runs


def _emit(name, B, dt, st, quality, vs_baseline=None):
    import jax
    n_dev = max(jax.local_device_count(), 1)
    per_chip = B / dt / n_dev
    n_conv = int(np.asarray(st.converged).sum())
    out = {
        "metric": f"{name} solves/s/chip (batch={B}, f32, "
                  f"converged={n_conv}/{B}, {quality})",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip",
        "vs_baseline": vs_baseline,
    }
    print(json.dumps(out), flush=True)
    return out


def _perturb_u(Z0, u_sl, B, seed=0, scale=0.02):
    rng = np.random.default_rng(seed)
    Zb = np.broadcast_to(np.asarray(Z0, np.float32)[None],
                         (B, *Z0.shape)).copy()
    Zb[:, :, u_sl] += scale * rng.standard_normal(
        (B, Z0.shape[0], u_sl.stop - u_sl.start)).astype(np.float32)
    return Zb


def bench_sx(args, cpu):
    """Config 1 — the driver headline metric."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions

    N = 15 if args.quick else args.knots
    B = args.batch or (4 if args.quick else 256)
    T = 10.0
    with jax.default_device(cpu):
        prob = bm.sx_gate_problem(N=N, T=T)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts,
                                runs=1 if args.quick else 3)
    # exhaustive f64 rollout gate
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    from piccolax.quantum.dynamics import unitary_fidelity, unitary_rollout
    with jax.default_device(cpu):
        sys2 = px.QuantumSystem(np.zeros((2, 2)),
                                [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2], 1.0)
        goal = jnp.asarray(px.GATES["SX"])

        def fid_one(u):
            Us = unitary_rollout(sys2, px.ZeroOrderPulse(u, times), times)
            return unitary_fidelity(Us[-1], goal)

        Fs = np.asarray(jax.jit(jax.vmap(fid_one))(jnp.asarray(us)))
    q = (f"rollout mean_F={Fs.mean():.6f}, "
         f"frac_F>0.999={np.mean(Fs > 0.999):.2f}")
    baseline_per_chip = 1000.0 / 16.0
    n_dev = max(jax.local_device_count(), 1)
    return _emit(f"SX-gate collocation (N={N})", B, dt, st, q,
                 vs_baseline=round(B / dt / n_dev / baseline_per_chip, 3))


def bench_qutrit(args, cpu):
    """Config 2 — qutrit X with leakage suppression, N=100."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions

    N, T, B = 100, 20.0, 64
    with jax.default_device(cpu):
        prob = bm.qutrit_x_problem(N=N, T=T)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B, scale=0.005)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    from piccolax.quantum.dynamics import unitary_rollout
    with jax.default_device(cpu):
        sys3 = px.TransmonSystem(levels=3, omega=4.0, delta=0.2,
                                 drive_bounds=0.2)
        goal = jnp.asarray(px.GATES["X"])

        def fid_leak(u):
            Us = unitary_rollout(sys3, px.ZeroOrderPulse(u, times), times)
            Usub = Us[-1][:2, :2]
            # Pedersen subspace fidelity (handles leakage-induced
            # non-unitarity of the subspace block)
            d = 2
            tr_gu = jnp.trace(goal.conj().T @ Usub)
            tr_uu = jnp.trace(Usub.conj().T @ Usub)
            F = (jnp.abs(tr_gu) ** 2 + tr_uu.real) / (d * (d + 1))
            leak = 1.0 - tr_uu.real / d
            return F, leak

        Fs, leaks = jax.jit(jax.vmap(fid_leak))(jnp.asarray(us))
        Fs, leaks = np.asarray(Fs), np.asarray(leaks)
    q = (f"subspace mean_F={Fs.mean():.5f}, frac_F>0.99="
         f"{np.mean(Fs > 0.99):.2f}, mean_leakage={leaks.mean():.2e}")
    return _emit(f"qutrit-X leakage-suppressed (N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.99)), 3))


def bench_cnot(args, cpu):
    """Config 3 — CNOT on coupled transmons, N=200, F >= 0.999 bar."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions

    N, T, B = 200, 50.0, 16
    with jax.default_device(cpu):
        prob = bm.cnot_problem(N=N, T=T)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B, scale=0.002)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=max(args.iters, 100), tol=args.tol,
                      constr_viol_tol=args.tol)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    from piccolax.quantum.dynamics import unitary_fidelity, unitary_rollout
    with jax.default_device(cpu):
        sys_c = bm.cnot_problem(N=8, T=T).qtraj.system
        goal = jnp.asarray(px.GATES["CX"])

        def fid_one(u):
            Us = unitary_rollout(sys_c, px.ZeroOrderPulse(u, times), times)
            return unitary_fidelity(Us[-1], goal)

        Fs = np.asarray(jax.jit(jax.vmap(fid_one))(jnp.asarray(us)))
    q = (f"rollout mean_F={Fs.mean():.5f}, "
         f"frac_F>0.999={np.mean(Fs > 0.999):.2f}")
    return _emit(f"2q-CNOT coupled transmons (N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.999)), 3))


def bench_ensemble(args, cpu):
    """Config 4 — 1024-member robustness ensemble via vmap."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions

    B, N, T, eps_scale = 1024, 50, 10.0, 0.02
    with jax.default_device(cpu):
        nlp, params_b, Z0_b, layout = bm.robustness_ensemble(
            n_samples=B, N=N, T=T, eps_scale=eps_scale)
        nlp, params_b = _cast32(nlp), _cast32(params_b)
        Z0_b = jnp.asarray(np.asarray(Z0_b, np.float32))
        gb = jnp.zeros((B, 0), jnp.float32)
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol)
    st, dt = _timed_batch_solve(nlp, params_b, Z0_b, gb, opts,
                                params_batched=True)
    # per-sample f64 rollout under each sample's OWN perturbed drift
    u_sl = layout.slices["u"]
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(0)
    eps = eps_scale * rng.standard_normal(B)
    from piccolax.quantum.dynamics import unitary_fidelity, unitary_rollout
    with jax.default_device(cpu):
        goal = jnp.asarray(px.GATES["SX"])
        Z = np.asarray(px.PAULIS["Z"])

        def fid_one(u, e):
            sys_e = px.QuantumSystem(e * Z / 2,
                                     [px.PAULIS["X"] / 2, px.PAULIS["Y"] / 2],
                                     1.0)
            Us = unitary_rollout(sys_e, px.ZeroOrderPulse(u, times), times)
            return unitary_fidelity(Us[-1], goal)

        Fs = np.asarray(jax.jit(jax.vmap(fid_one))(
            jnp.asarray(us), jnp.asarray(eps)))
    q = (f"per-sample rollout mean_F={Fs.mean():.5f}, "
         f"frac_F>0.999={np.mean(Fs > 0.999):.2f}")
    return _emit(f"robustness ensemble (K={B}, N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.999)), 3))


def bench_lindblad(args, cpu):
    """Config 5 — Lindblad 3-level transmon with decay, N=50."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions

    N, T, B, gamma = 50, 10.0, 64, 0.01
    with jax.default_device(cpu):
        prob = bm.lindblad_problem(N=N, T=T, gamma=gamma)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B, scale=0.005)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    from piccolax.quantum.dynamics import density_rollout
    with jax.default_device(cpu):
        sys_o = bm.lindblad_problem(N=8, T=T, gamma=gamma).qtraj.system
        rho0 = jnp.zeros((3, 3), jnp.complex128).at[0, 0].set(1.0)

        def fid_one(u):
            rhos = density_rollout(sys_o, px.ZeroOrderPulse(u, times),
                                   times, rho0)
            return rhos[-1][1, 1].real      # target population |1><1|

        Fs = np.asarray(jax.jit(jax.vmap(fid_one))(jnp.asarray(us)))
    q = (f"lindblad rollout mean_F={Fs.mean():.5f}, "
         f"frac_F>0.95={np.mean(Fs > 0.95):.2f}")
    return _emit(f"lindblad 3-level decay (N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.95)), 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="run all five BASELINE configs (one JSON line "
                         "each; config-1 line last)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--knots", type=int, default=50)
    ap.add_argument("--tol", type=float, default=TOL)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    # Build problems entirely on CPU: eager dispatches to the TPU are
    # serialized through the remote-compile tunnel; only the jitted
    # solver should touch the device.
    cpu = jax.devices("cpu")[0]

    if args.all:
        for fn in (bench_qutrit, bench_cnot, bench_ensemble,
                   bench_lindblad):
            try:
                fn(args, cpu)
            except Exception as e:       # one config must not kill the run
                print(json.dumps({"metric": f"{fn.__name__} FAILED: {e}",
                                  "value": 0.0, "unit": "solves/s/chip",
                                  "vs_baseline": 0.0}), flush=True)
    bench_sx(args, cpu)
    return 0


if __name__ == "__main__":
    sys.exit(main())
