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
precision). Quality gates are TRULY float64 and integrator-independent:
every solved pulse is re-integrated on the host with batched DOP853
(`piccolax.verification`, pure numpy+scipy — immune to jax_enable_x64
state). The F statistics and the frac_F gates are computed from that
independent rollout — the physics ground truth for the solved CONTROLS.

The |dF| columns compare the solver's raw final-KNOT state fidelity
against the independent rollout (the reference's DeltaF check,
two_qubit_gate_validation.jl:348, which hits 1e-4 at Ipopt tol 1e-8 in
f64). At the f32 path's tol, |dF| measures the accumulated collocation
defect N * constr_viol across the horizon — e.g. ~5e-2 for the SX
config at tol 5e-3 / N=50, and ~2-4e-3 for configs 2-3 which run with
delta_c_f32 = 1e-4 (tighter primal floor). It is reported for
transparency, not gated: a user-facing `problem.fidelity()` re-rolls
the solved pulse, which is what the F columns measure.

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


def _reported_final_operator(st, layout, name="U"):
    """Solver-claimed final unitary, decoded from the last knot's iso-vec
    (float64 numpy — no JAX)."""
    from piccolax.verification import iso_vec_to_operator_np
    sl = layout.slices[name]
    return iso_vec_to_operator_np(np.asarray(st.Z[:, -1, sl], np.float64))


def bench_sx(args, cpu):
    """Config 1 — the driver headline metric."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions
    from piccolax.verification import (batched_unitary_dop853,
                                       unitary_fidelity_np)

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
    # ls_iters=6 / clamp_iters=15: measured A/B (round 5, batch 256) —
    # identical convergence (256/256, same iteration counts) at +15%
    # throughput; the NS resolution floor at 15 sweeps (1.1e-3 * s) is
    # still below hess_floor_f32 (3e-3 * s) so the clamp is unchanged
    # to within its own floor.
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol,
                      ls_iters=6, clamp_iters=15)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts,
                                runs=1 if args.quick else 3)
    # truly-f64 independent gate: batched DOP853 on the host (numpy)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    X = np.array([[0, 1], [1, 0]], complex)
    Y = np.array([[0, -1j], [1j, 0]], complex)
    goal = px.GATES["SX"]
    U64 = batched_unitary_dop853(np.zeros((2, 2)), [X / 2, Y / 2],
                                 us, times, rtol=1e-10, atol=1e-10)
    Fs = unitary_fidelity_np(U64, goal)
    F_rep = unitary_fidelity_np(_reported_final_operator(st, layout), goal)
    dF = np.abs(F_rep - Fs)
    q = (f"f64-DOP853 mean_F={Fs.mean():.6f}, "
         f"frac_F>0.999={np.mean(Fs > 0.999):.2f}, "
         f"mean|dF|={dF.mean():.1e}, max|dF|={dF.max():.1e}")
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
    from piccolax.quantum.operators import annihilate
    from piccolax.solver.ipm import IPMOptions
    from piccolax.verification import (batched_unitary_dop853,
                                       pedersen_fidelity_np)

    N, T, B = 100, 20.0, 64
    with jax.default_device(cpu):
        prob = bm.qutrit_x_problem(N=N, T=T)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B, scale=0.005)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=args.iters_qutrit, tol=args.tol,
                      constr_viol_tol=args.tol,
                      hess_mode=args.hess_mode,
                      delta_c_f32=1e-4, prox_iter=3)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    # rotating-frame transmon drift/drives in numpy f64
    # (TransmonSystem: 2pi * (-delta/2 a'a'aa), drives 2pi (a+a'),
    # 2pi i(a-a'))
    a = annihilate(3)
    ad = a.conj().T
    H0 = 2 * np.pi * (-0.2 / 2) * (ad @ ad @ a @ a)
    Hds = [2 * np.pi * (a + ad), 2 * np.pi * 1j * (a - ad)]
    goal = px.GATES["X"]
    U64 = batched_unitary_dop853(H0, Hds, us, times)
    Fs = pedersen_fidelity_np(U64[:, :2, :2], goal)
    # leakage of the computational block: 1 - ||U_sub||_F^2 / 2
    leaks = 1.0 - np.einsum("bij,bij->b", U64[:, :2, :2].conj(),
                            U64[:, :2, :2]).real / 2
    U_rep = _reported_final_operator(st, layout)
    F_rep = pedersen_fidelity_np(U_rep[:, :2, :2], goal)
    dF = np.abs(F_rep - Fs)
    q = (f"f64-DOP853 subspace mean_F={Fs.mean():.5f}, frac_F>0.99="
         f"{np.mean(Fs > 0.99):.2f}, mean_leakage={leaks.mean():.2e}, "
         f"mean|dF|={dF.mean():.1e}, max|dF|={dF.max():.1e}")
    return _emit(f"qutrit-X leakage-suppressed (N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.99)), 3))


def bench_cnot(args, cpu):
    """Config 3 — CNOT on coupled transmons, N=200, F >= 0.999 bar."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.quantum.operators import annihilate, lift_operator
    from piccolax.solver.ipm import IPMOptions
    from piccolax.verification import (batched_unitary_dop853,
                                       unitary_fidelity_np)

    N, T, B = 200, 50.0, 16
    with jax.default_device(cpu):
        prob = bm.cnot_problem(N=N, T=T)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B, scale=0.002)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=max(args.iters, 150), tol=args.tol,
                      constr_viol_tol=args.tol,
                      hess_mode=args.hess_mode,
                      delta_c_f32=1e-4, prox_iter=3)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    # coupled 2x2-level transmons, built directly in numpy f64
    # (same operators as benchmarks.cnot_problem — no throwaway
    # problem rebuild, so no spurious dt*||H|| warning)
    a1 = lift_operator(annihilate(2), 0, [2, 2])
    a2 = lift_operator(annihilate(2), 1, [2, 2])
    H0 = 2 * np.pi * 0.1 * (a1 @ a2.conj().T + a1.conj().T @ a2)
    Hds = [2 * np.pi * H for H in
           (a1 + a1.conj().T, 1j * (a1 - a1.conj().T),
            a2 + a2.conj().T, 1j * (a2 - a2.conj().T))]
    goal = px.GATES["CX"]
    U64 = batched_unitary_dop853(H0, Hds, us, times)
    Fs = unitary_fidelity_np(U64, goal)
    F_rep = unitary_fidelity_np(_reported_final_operator(st, layout), goal)
    dF = np.abs(F_rep - Fs)
    q = (f"f64-DOP853 mean_F={Fs.mean():.5f}, "
         f"frac_F>0.999={np.mean(Fs > 0.999):.2f}, "
         f"mean|dF|={dF.mean():.1e}, max|dF|={dF.max():.1e}")
    return _emit(f"2q-CNOT coupled transmons (N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.999)), 3))


def bench_ensemble(args, cpu):
    """Config 4 — 1024-member robustness ensemble via vmap."""
    import jax
    import jax.numpy as jnp
    import piccolax as px
    from piccolax import benchmarks as bm
    from piccolax.solver.ipm import IPMOptions
    from piccolax.verification import (batched_unitary_dop853,
                                       unitary_fidelity_np)

    B, N, T, eps_scale = 1024, 50, 10.0, 0.02
    with jax.default_device(cpu):
        nlp, params_b, Z0_b, layout = bm.robustness_ensemble(
            n_samples=B, N=N, T=T, eps_scale=eps_scale)
        nlp, params_b = _cast32(nlp), _cast32(params_b)
        Z0_b = jnp.asarray(np.asarray(Z0_b, np.float32))
        gb = jnp.zeros((B, 0), jnp.float32)
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol,
                      ls_iters=6, clamp_iters=15)
    st, dt = _timed_batch_solve(nlp, params_b, Z0_b, gb, opts,
                                params_batched=True)
    # per-sample f64 DOP853 under each sample's OWN perturbed drift
    u_sl = layout.slices["u"]
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    rng = np.random.default_rng(0)
    eps = eps_scale * rng.standard_normal(B)
    X = np.array([[0, 1], [1, 0]], complex)
    Y = np.array([[0, -1j], [1j, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    H0_b = eps[:, None, None] * Z[None] / 2
    goal = px.GATES["SX"]
    U64 = batched_unitary_dop853(H0_b, [X / 2, Y / 2], us, times)
    Fs = unitary_fidelity_np(U64, goal)
    F_rep = unitary_fidelity_np(_reported_final_operator(st, layout), goal)
    dF = np.abs(F_rep - Fs)
    q = (f"per-sample f64-DOP853 mean_F={Fs.mean():.5f}, "
         f"frac_F>0.999={np.mean(Fs > 0.999):.2f}, "
         f"mean|dF|={dF.mean():.1e}, max|dF|={dF.max():.1e}")
    return _emit(f"robustness ensemble (K={B}, N={N})", B, dt, st, q,
                 vs_baseline=round(float(np.mean(Fs > 0.999)), 3))


def bench_lindblad(args, cpu):
    """Config 5 — Lindblad 3-level transmon with decay, N=50."""
    import jax
    import jax.numpy as jnp
    from piccolax import benchmarks as bm
    from piccolax.quantum.operators import annihilate
    from piccolax.solver.ipm import IPMOptions
    from piccolax.verification import (batched_density_dop853,
                                       compact_iso_to_density_np)

    N, T, B, gamma = 50, 10.0, 64, 0.01
    with jax.default_device(cpu):
        prob = bm.lindblad_problem(N=N, T=T, gamma=gamma)
        nlp, params, Z0, g0, layout = prob.build()
        nlp, params = _cast32(nlp), _cast32(params)
        u_sl = layout.slices["u"]
        Zb = _perturb_u(Z0, u_sl, B, scale=0.005)
        gb = np.zeros((B, 0), np.float32)
    opts = IPMOptions(max_iter=args.iters, tol=args.tol,
                      constr_viol_tol=args.tol,
                      ls_iters=6, clamp_iters=15)
    st, dt = _timed_batch_solve(nlp, params, jnp.asarray(Zb),
                                jnp.asarray(gb), opts)
    us = np.asarray(st.Z[:, :, u_sl], np.float64)
    times = np.linspace(0, T, N)
    a = annihilate(3)
    ad = a.conj().T
    H0 = 2 * np.pi * (-0.2 / 2) * (ad @ ad @ a @ a)
    Hds = [2 * np.pi * (a + ad), 2 * np.pi * 1j * (a - ad)]
    rho0 = np.zeros((3, 3), complex)
    rho0[0, 0] = 1.0
    rho64 = batched_density_dop853(H0, Hds, [np.sqrt(gamma) * a],
                                   us, times, rho0)
    Fs = rho64[:, 1, 1].real                 # target population |1><1|
    rho_rep = compact_iso_to_density_np(
        np.asarray(st.Z[:, -1, layout.slices["rho"]], np.float64))
    dF = np.abs(rho_rep[:, 1, 1].real - Fs)
    q = (f"f64-DOP853 lindblad mean_F={Fs.mean():.5f}, "
         f"frac_F>0.95={np.mean(Fs > 0.95):.2f}, "
         f"mean|dF|={dF.mean():.1e}, max|dF|={dF.max():.1e}")
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
    ap.add_argument("--iters-qutrit", type=int, default=300,
                    help="config 2 needs a longer budget (long leakage-"
                         "fidelity valley; PROFILE.md round 5)")
    ap.add_argument("--hess-mode", default="abs",
                    help="IPM convexification for the hard nonconvex "
                         "configs 2-3 (abs = saddle-free |H|)")
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
