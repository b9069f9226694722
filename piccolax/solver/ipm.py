"""Batched primal-dual interior-point method for collocation NLPs.

The Ipopt replacement (SURVEY.md section 7, "hard parts" #1). Fiacco-
McCormick monotone barrier with:

- exact per-knot Lagrangian Hessians via JAX autodiff;
- the FULL symmetric indefinite KKT system factored directly: ordering
  unknowns per knot as (z_k, lambda_k) makes the KKT matrix
  block-tridiagonal over the knot axis, factored by the condensed dual
  Schur complement + block cyclic reduction (`solver/kkt.py`, O(log N)
  sequential depth); a NaN factorization signals an indefinite primal
  block and routes the iteration to the PSD-clamped fallback direction
  (exactly two factorizations per iteration, static shapes);
- global variables (free phases, slacks) via a small bordered Schur
  complement on the factored system;
- fraction-to-boundary rule + vectorized Armijo backtracking on an l1
  merit function (all candidate step sizes evaluated in parallel);
- everything shape-static: one `lax.while_loop` whose body is pure
  batched linear algebra, so thousands of problems solve simultaneously
  under `vmap` with per-problem convergence masks.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass
from .kkt import (condensed_factor, condensed_solve, psd_clamp,
                  qd_factor, qd_solve)
from .nlp import CollocationNLP, nlp_constraint_residuals, nlp_total_cost

__all__ = ["IPMOptions", "IPMState", "solve_nlp", "solve_nlp_traced"]


@dataclasses.dataclass(frozen=True)
class IPMOptions:
    max_iter: int = 100
    tol: float = 1e-8
    constr_viol_tol: float = 1e-8
    mu_init: float = 1e-1
    kappa_eps: float = 10.0
    kappa_mu: float = 0.2
    theta_mu: float = 1.5
    tau_min: float = 0.99
    delta_c: float = 1e-8        # constraint-row regularization (f64)
    # float32 production path (TPU): the quasidefinite recursion must keep
    # its dynamic range inside ~1/eps32. Because the dual regularization
    # acts as a TRAILING proximal term (the Newton rhs uses the true
    # constraint residual and the dual reference moves with the iterate),
    # a large delta_c damps dual steps without biasing the fixed point.
    delta_c_f32: float = 1e-3    # constraint-row regularization (f32)
    hess_floor: float = 1e-6     # fallback-Hessian eigenvalue floor (f64)
    hess_floor_f32: float = 3e-3  # fallback-Hessian eigenvalue floor (f32)
    ls_iters: int = 8            # parallel backtracking candidates (each
                                 # is a full merit evaluation x 3
                                 # directions; 8 halvings reach 2^-7 of
                                 # the fraction-to-boundary step, below
                                 # which the clamp direction C at its own
                                 # Armijo step is the better rescue)
    armijo_eta: float = 1e-4
    kappa_sigma: float = 1e10    # dual box safeguard
    bound_push: float = 1e-2
    bound_frac: float = 1e-2
    bound_relax: float = 1e-7    # Ipopt bound_relax_factor: keeps equality-
                                 # pinned points strictly interior
    nu_max: float = 1e8
    # Ipopt-style acceptable termination: once primal feasibility is tight
    # and the (scaled) dual error is below acceptable_tol, declare success
    # if the objective has stagnated for acceptable_iter iterations.
    acceptable_tol: float = 1e-3
    acceptable_obj_change: float = 1e-5
    acceptable_iter: int = 10
    # Numerical-floor stall detection: once primal-feasible and the
    # barrier is driven down, if the best KKT error has not improved by
    # at least (1 - stall_ratio) over a window of stall_iter iterations,
    # the iterate is creeping at the dtype's accuracy floor — stop with
    # stalled=True (NOT converged) instead of burning max_iter (the f32
    # TPU path plateaus around 1e-3 stationarity).
    stall_iter: int = 12
    stall_ratio: float = 0.7
    # Inexact proximal-point refresh: the dual reference lam_ref normally
    # steps when the inner (shifted) subproblem reaches kappa_eps*mu; at
    # the dtype's accuracy floor that test is unreachable and the TRUE
    # constraint violation would freeze at reg*(lam - lam_ref). If the
    # inner error makes < (1 - prox_ratio) relative progress over a
    # prox_iter window, refresh lam_ref anyway — the outer AL iteration
    # then keeps contracting ||c|| below the shift floor (this is what
    # lets the float32 path reach ~1e-5 feasibility with delta_c ~ 1e-3).
    prox_iter: int = 6
    prox_ratio: float = 0.7
    # KKT linear-solver backend:
    #   "cr"     — condensed dual Schur complement + block cyclic
    #              reduction (kkt.py). O(log N) sequential depth, all
    #              batched matmuls: the TPU production path.
    #   "qd"     — sequential quasidefinite block-tridiagonal recursion
    #              (O(N) scan; reference implementation).
    #   "native" — C++ exact-Cholesky host library via pure_callback
    #              (the Ipopt/MadNLP-style second backend, CPU only).
    #   "knot"   — knot-sharded condensed KKT over a device mesh
    #              (parallel/sharded_kkt.py): SPIKE partitioning with one
    #              all_gather per solve — the long-horizon sequence-
    #              parallel path (SURVEY.md section 5.7). Requires
    #              solve_nlp(..., mesh=...); N divisible by the mesh axis
    #              with >= 3 knots per device; not vmappable.
    kkt_backend: str = "cr"
    # Exact-Newton direction: factor the UNCLAMPED Lagrangian-Hessian KKT
    # as a second candidate (quadratic local convergence when the primal
    # blocks are PD). None = auto: enabled in float64 (tight tolerances
    # want the Newton tail), disabled in float32 (measured on the TPU
    # bench: the exact-Hessian factorization fails the PD test on ~100%
    # of iterations for nonconvex fidelity objectives, so its
    # factorization + solves are pure overhead; the SOC-corrected clamp
    # direction converges to the f32 accuracy floor regardless).
    newton_dir: bool | None = None
    # Primal-Hessian convexification mode:
    #   "clamp" — matmul-only PSD clamp of the per-knot Lagrangian
    #             Hessian (+ optional exact-Newton candidate, above).
    #   "abs"   — saddle-free |H| variant of the clamp (kkt.psd_clamp
    #             mode="abs"): negative curvature becomes positive
    #             stiffness of the same magnitude instead of being
    #             flattened — measured (round 5) to contract the dual
    #             residual far faster on nonconvex fidelity landscapes;
    #             same cost as "clamp" with newton_dir off.
    #   "shift" — Ipopt-style adaptive inertia regularization: ONE
    #             factorization of W + delta_w I per iteration, with
    #             delta_w carried in the solver state and adapted
    #             ACROSS iterations (success -> delta_w * delta_w_dec,
    #             failure -> delta_w * delta_w_inc + a null step this
    #             iteration). Ipopt re-factors inside one iteration
    #             until the inertia is correct; amortizing the ladder
    #             across iterations keeps shapes static and costs one
    #             factorization per iteration instead of two. The
    #             measured motivation (round-5 diagnostics): the
    #             max(lam, 0) clamp distorts the saddle structure of
    #             collocation Hessians (state rows have zero objective
    #             curvature) so the dual residual contracts slowly; the
    #             uniform shift preserves the Newton system up to
    #             delta_w and tracks the true negative-curvature level.
    hess_mode: str = "clamp"
    # Newton-Schulz sweeps in the clamp/abs modes; None = dtype default
    # (20 in f32, 32 in f64). The sign-iteration resolution floor is
    # 0.5 * 1.5^-iters of the spectral bound — keep it below hess_floor.
    clamp_iters: int | None = None
    delta_w_init: float = 1e-3
    delta_w_inc: float = 30.0
    delta_w_dec: float = 0.5
    delta_w_min: float = 1e-8
    delta_w_max: float = 1e10


@pytree_dataclass
class IPMState:
    Z: jnp.ndarray          # [N, dz]
    g: jnp.ndarray          # [dg]
    lam: jnp.ndarray        # [N, m] stacked (eq; dyn) multipliers
    lam_ref: jnp.ndarray    # [N, m] proximal multiplier reference
    zL: jnp.ndarray         # [N, dz]
    zU: jnp.ndarray         # [N, dz]
    gL: jnp.ndarray         # [dg]
    gU: jnp.ndarray         # [dg]
    mu: jnp.ndarray
    nu: jnp.ndarray         # merit penalty (diagnostic: max |lam_ref|)
    it: jnp.ndarray
    converged: jnp.ndarray
    kkt_err: jnp.ndarray
    alpha: jnp.ndarray      # last accepted primal step (diagnostics)
    delta_used: jnp.ndarray  # direction diagnostics (0=S, 1=N, 2=C,
                             # +10 okN, +100 okC)
    f_prev: jnp.ndarray     # objective at previous iterate
    stagnant: jnp.ndarray   # consecutive acceptable+stagnant iterations
    kkt_best: jnp.ndarray   # best KKT error seen (stall detection)
    kkt_mark: jnp.ndarray   # kkt_best at the last stall-window boundary
    inner_best: jnp.ndarray  # best inner (shifted) error this subproblem
    inner_mark: jnp.ndarray  # inner_best at the last prox-window boundary
    inner_count: jnp.ndarray  # iterations since the last prox window
    stall_wins: jnp.ndarray  # consecutive no-progress stall windows
    no_prog: jnp.ndarray    # iterations since the last window boundary
    stalled: jnp.ndarray    # True if the stop was the numerical-floor
                            # stall heuristic (kkt_err exceeds tol and
                            # converged stays False), not the tolerance
                            # test — surfaced by QuantumControlProblem
    err_prim: jnp.ndarray   # diagnostics: max |c| at the last iterate
    err_dual: jnp.ndarray   # diagnostics: scaled dual residual max-norm
    delta_w: jnp.ndarray    # adaptive inertia shift (hess_mode="shift")


def _finite(x):
    return jnp.isfinite(x)


def _safe_gap(x, bound, mask):
    """x - bound where the bound is finite (interior-positive), else 1."""
    return jnp.where(mask, x - bound, 1.0)


def _init_interior(x, lo, hi, push_abs, push_frac):
    """Push x strictly inside [lo, hi] (Ipopt-style bound_push)."""
    has_lo = _finite(lo)
    has_hi = _finite(hi)
    lo_f = jnp.where(has_lo, lo, 0.0)
    hi_f = jnp.where(has_hi, hi, 0.0)
    width = jnp.where(has_lo & has_hi, hi_f - lo_f, jnp.inf)
    pl = jnp.minimum(push_abs * jnp.maximum(1.0, jnp.abs(lo_f)),
                     push_frac * width)
    pu = jnp.minimum(push_abs * jnp.maximum(1.0, jnp.abs(hi_f)),
                     push_frac * width)
    x = jnp.where(has_lo, jnp.maximum(x, lo_f + pl), x)
    x = jnp.where(has_hi, jnp.minimum(x, hi_f - pu), x)
    return x


def _row_activity(nlp: CollocationNLP):
    """[N, m] float mask of active constraint rows (masked eq rows and the
    dynamics rows of the final knot are inactive)."""
    parts = [nlp.eq_mask]
    if nlp.md:
        dyn_act = jnp.concatenate(
            [jnp.ones((nlp.N - 1, nlp.md)), jnp.zeros((1, nlp.md))], axis=0)
        parts.append(dyn_act)
    else:
        parts.append(jnp.zeros((nlp.N, 0)))
    return jnp.concatenate(parts, axis=1)


def _jacobians(nlp: CollocationNLP, Z, g, params):
    """Constraint Jacobian blocks: Cself [N, m, dz] (rows vs z_k),
    Cnext [N, m, dz] (rows of knot k vs z_{k+1}; zero at k=N-1),
    Jg [N, m, dg]."""
    N, dz, dg, me, md = nlp.N, nlp.dz, nlp.dg, nlp.me, nlp.md
    dt = Z.dtype
    if me:
        ks = jnp.arange(N)
        E = jax.vmap(lambda k, z: jax.jacfwd(
            lambda zz: nlp.stage_eq(k, zz, g, params))(z))(ks, Z)
        E = E * nlp.eq_mask[:, :, None]
        if dg:
            F = jax.vmap(lambda k, z: jax.jacfwd(
                lambda gg: nlp.stage_eq(k, z, gg, params))(g))(ks, Z)
            F = F * nlp.eq_mask[:, :, None]
        else:
            F = jnp.zeros((N, me, 0), dt)
    else:
        E = jnp.zeros((N, 0, dz), dt)
        F = jnp.zeros((N, 0, dg), dt)
    if md:
        ks = jnp.arange(N - 1)
        if nlp.dynamics_split is not None:
            # Split-argument fast path (see nlp.py): differentiate the
            # expm-bearing (nl) and linear (state) column groups in two
            # jacfwd calls so the state tangents never enter the expm
            # derivative chain (symbolic zeros). Exact — same values.
            nl_ix = np.asarray(nlp.nl_cols)
            li_ix = np.asarray(nlp.lin_cols)
            Zn, Zl = Z[:, nl_ix], Z[:, li_ix]
            An = jax.vmap(lambda k, zn, zl, zp: jax.jacfwd(
                lambda w: nlp.dynamics_split(k, w, zl, zp, g, params))(zn))(
                    ks, Zn[:-1], Zl[:-1], Z[1:])
            Al = jax.vmap(lambda k, zn, zl, zp: jax.jacfwd(
                lambda w: nlp.dynamics_split(k, zn, w, zp, g, params))(zl))(
                    ks, Zn[:-1], Zl[:-1], Z[1:])
            A = jnp.zeros((N - 1, md, dz), dt)
            A = A.at[:, :, nl_ix].set(An).at[:, :, li_ix].set(Al)
        else:
            A = jax.vmap(lambda k, z, zp: jax.jacfwd(
                lambda zz: nlp.dynamics(k, zz, zp, g, params))(z))(
                    ks, Z[:-1], Z[1:])
        B = jax.vmap(lambda k, z, zp: jax.jacfwd(
            lambda zz: nlp.dynamics(k, z, zz, g, params))(zp))(ks, Z[:-1], Z[1:])
        if dg:
            Dg = jax.vmap(lambda k, z, zp: jax.jacfwd(
                lambda gg: nlp.dynamics(k, z, zp, gg, params))(g))(
                    ks, Z[:-1], Z[1:])
        else:
            Dg = jnp.zeros((N - 1, md, 0), dt)
        zpad = jnp.zeros((1, md, dz), dt)
        A = jnp.concatenate([A, zpad], axis=0)
        B_rows = jnp.concatenate([B, zpad], axis=0)
        Dg = jnp.concatenate([Dg, jnp.zeros((1, md, dg), dt)], axis=0)
    else:
        A = jnp.zeros((N, 0, dz), dt)
        B_rows = jnp.zeros((N, 0, dz), dt)
        Dg = jnp.zeros((N, 0, dg), dt)
    Cself = jnp.concatenate([E, A], axis=1)
    Cnext = jnp.concatenate([jnp.zeros((N, me, dz), dt), B_rows], axis=1)
    Jg = jnp.concatenate([F, Dg], axis=1)
    return Cself, Cnext, Jg


def _stage_hessians(nlp: CollocationNLP, Z, g, params, lam):
    """Extended per-knot Lagrangian Hessians over (z_k, g): [N, dz+dg, ...].

    Relies on the affine-in-z_{k+1} dynamics contract (nlp.py): all
    curvature of constraint k lives in (z_k, g)."""
    N, dz, dg, me, md = nlp.N, nlp.dz, nlp.dg, nlp.me, nlp.md
    lam_e = lam[:, :me]
    lam_d = lam[:, me:]
    Zp = jnp.concatenate([Z[1:], Z[-1:]], axis=0)      # dummy at last knot
    dyn_on = jnp.concatenate(
        [jnp.ones(N - 1), jnp.zeros(1)]) if md else jnp.zeros(N)

    def lagr(k, w, zp, le, ld, on):
        z, gg = w[:dz], w[dz:]
        val = nlp.stage_cost(k, z, gg, params)
        if me:
            val = val + jnp.dot(le, nlp.eq_mask[k] * nlp.stage_eq(k, z, gg, params))
        if md:
            val = val + on * jnp.dot(ld, nlp.dynamics(k, z, zp, gg, params))
        return val

    ks = jnp.arange(N)
    W0 = jnp.concatenate([Z, jnp.broadcast_to(g, (N, dg))], axis=1) \
        if dg else Z
    H = jax.vmap(lambda k, w, zp, le, ld, on: jax.hessian(
        lambda ww: lagr(k, ww, zp, le, ld, on))(w))(
            ks, W0, Zp, lam_e, lam_d, dyn_on)
    return 0.5 * (H + jnp.swapaxes(H, -1, -2))


def _stage_hessians_split(nlp: CollocationNLP, Z, g, params, lam):
    """Split-argument variant of `_stage_hessians` (exact, faster).

    The Lagrangian is differentiated with w partitioned as
    wn = [z[nl_cols]; g] (reaches the expm kernel) and wl = z[lin_cols]
    (residuals are linear in it): the jacfwd sweep over wl propagates
    symbolic-zero tangents through the expm derivative chain, so only
    the few control/timestep columns pay the forward-over-reverse expm
    cost. Output is identical to `_stage_hessians` up to float rounding.
    """
    N, dz, dg, me, md = nlp.N, nlp.dz, nlp.dg, nlp.me, nlp.md
    nl_ix = np.asarray(nlp.nl_cols)
    li_ix = np.asarray(nlp.lin_cols)
    n_nl = nl_ix.size
    lam_e = lam[:, :me]
    lam_d = lam[:, me:]
    Zp = jnp.concatenate([Z[1:], Z[-1:]], axis=0)
    dyn_on = jnp.concatenate(
        [jnp.ones(N - 1), jnp.zeros(1)]) if md else jnp.zeros(N)

    def lagr(k, wn, wl, zp, le, ld, on):
        zn, gg = wn[:n_nl], wn[n_nl:]
        val = nlp.stage_cost_split(k, zn, wl, gg, params)
        if me:
            val = val + jnp.dot(le, nlp.eq_mask[k]
                                * nlp.stage_eq_split(k, zn, wl, gg, params))
        if md:
            val = val + on * jnp.dot(
                ld, nlp.dynamics_split(k, zn, wl, zp, gg, params))
        return val

    grad2 = jax.grad(lagr, argnums=(1, 2))

    def hess_one(k, wn, wl, zp, le, ld, on):
        Hn = jax.jacfwd(grad2, argnums=1)(k, wn, wl, zp, le, ld, on)
        Hl = jax.jacfwd(grad2, argnums=2)(k, wn, wl, zp, le, ld, on)
        top = jnp.concatenate([Hn[0], Hl[0]], axis=1)   # rows: d/d wn
        bot = jnp.concatenate([Hn[1], Hl[1]], axis=1)   # rows: d/d wl
        return jnp.concatenate([top, bot], axis=0)      # permuted [dw, dw]

    ks = jnp.arange(N)
    Wn = jnp.concatenate([Z[:, nl_ix], jnp.broadcast_to(g, (N, dg))], axis=1)
    Wl = Z[:, li_ix]
    Hp = jax.vmap(hess_one)(ks, Wn, Wl, Zp, lam_e, lam_d, dyn_on)
    # unpermute: Hp's index order is [nl_cols, dz..dz+dg, lin_cols]
    perm = np.concatenate([nl_ix, np.arange(dz, dz + dg), li_ix])
    inv = np.empty(dz + dg, dtype=np.int32)
    inv[perm] = np.arange(dz + dg)
    H = Hp[:, inv][:, :, inv]
    return 0.5 * (H + jnp.swapaxes(H, -1, -2))


def _gradients(nlp: CollocationNLP, Z, g, params):
    ks = jnp.arange(nlp.N)
    gz = jax.vmap(lambda k, z: jax.grad(
        lambda zz: nlp.stage_cost(k, zz, g, params))(z))(ks, Z)
    if nlp.dg:
        gg = jax.vmap(lambda k, z: jax.grad(
            lambda ggv: nlp.stage_cost(k, z, ggv, params))(g))(ks, Z)
        gg = jnp.sum(gg, axis=0)
    else:
        gg = jnp.zeros(0, Z.dtype)
    return gz, gg


def _setup(nlp: CollocationNLP, params, Z0, g0, options: IPMOptions,
           mesh=None, knot_axis: str = "knot", resume_from=None):
    """Build (initial state, iteration body) for the IPM loop."""
    o = options
    N, dz, dg, me, md = nlp.N, nlp.dz, nlp.dg, nlp.me, nlp.md
    m = me + md
    mb = dz + m
    f64 = Z0.dtype
    g0 = jnp.zeros(dg, f64) if g0 is None else jnp.asarray(g0, f64)
    # dtype-aware numerics (static at trace time): float32 needs larger
    # dual regularization and fallback-Hessian floor to keep the
    # quasidefinite recursion's dynamic range within 1/eps32.
    is_f32 = jnp.dtype(f64) == jnp.float32
    use_newton = o.newton_dir if o.newton_dir is not None else not is_f32
    delta_c = max(o.delta_c, o.delta_c_f32) if is_f32 else o.delta_c
    hess_floor = max(o.hess_floor, o.hess_floor_f32) if is_f32 \
        else o.hess_floor
    # bound gaps of degenerate-active components scale as bound_relax;
    # Sigma = z/gap ~ mu/gap^2 must stay inside f32 range
    bound_relax = max(o.bound_relax, 1e-4) if is_f32 else o.bound_relax

    # Fixed-variable treatment (nlp.pin_mask; Ipopt
    # fixed_variable_treatment = make_parameter): pinned coordinates are
    # parameters, not variables. Their values are injected into Z0 from
    # params["pin_val"]; their barrier terms are dropped; every KKT
    # Jacobian/Hessian column is zeroed (unit diagonal on the primal
    # block) so their step is identically zero. This removes the
    # boundary-pin equality rows from the per-knot KKT entirely — m
    # halves on typical problems (PROFILE.md "dead boundary rows").
    pinf = jnp.asarray(nlp.pin_mask, f64)            # [N, dz] 1.0 = fixed
    free = 1.0 - pinf
    free_next = jnp.concatenate([free[1:], jnp.ones((1, dz), f64)], axis=0)
    mflat = jnp.concatenate(
        [free, jnp.ones((N, dg), f64)], axis=1) if dg else free

    hasL = _finite(nlp.lo) & (pinf < 0.5)
    hasU = _finite(nlp.hi) & (pinf < 0.5)
    ghasL = _finite(nlp.g_lo)
    ghasU = _finite(nlp.g_hi)
    row_act = _row_activity(nlp)

    # Relax bounds slightly (Ipopt bound_relax_factor) so equality-pinned
    # variables sitting exactly on a bound stay strictly interior.
    relax = bound_relax
    nlp = nlp.replace(
        lo=jnp.where(hasL, nlp.lo - relax * jnp.maximum(1.0, jnp.abs(nlp.lo)),
                     nlp.lo),
        hi=jnp.where(hasU, nlp.hi + relax * jnp.maximum(1.0, jnp.abs(nlp.hi)),
                     nlp.hi),
        g_lo=jnp.where(ghasL, nlp.g_lo
                       - relax * jnp.maximum(1.0, jnp.abs(nlp.g_lo)),
                       nlp.g_lo),
        g_hi=jnp.where(ghasU, nlp.g_hi
                       + relax * jnp.maximum(1.0, jnp.abs(nlp.g_hi)),
                       nlp.g_hi),
    )

    pv = params.get("pin_val") if isinstance(params, dict) else None
    if pv is not None:
        Z0 = jnp.where(pinf > 0.5, jnp.asarray(pv, f64), Z0)
    Z0 = _init_interior(Z0, nlp.lo, nlp.hi, o.bound_push, o.bound_frac)
    g0 = _init_interior(g0, nlp.g_lo, nlp.g_hi, o.bound_push, o.bound_frac)
    mu0 = jnp.asarray(o.mu_init, f64)
    state = IPMState(
        Z=Z0, g=g0,
        lam=jnp.zeros((N, m), f64),
        lam_ref=jnp.zeros((N, m), f64),
        zL=jnp.where(hasL, mu0 / _safe_gap(Z0, nlp.lo, hasL), 0.0),
        zU=jnp.where(hasU, mu0 / _safe_gap(nlp.hi, Z0, hasU), 0.0),
        gL=jnp.where(ghasL, mu0 / _safe_gap(g0, nlp.g_lo, ghasL), 0.0),
        gU=jnp.where(ghasU, mu0 / _safe_gap(nlp.g_hi, g0, ghasU), 0.0),
        mu=mu0, nu=jnp.asarray(1.0, f64),
        it=jnp.asarray(0), converged=jnp.asarray(False),
        kkt_err=jnp.asarray(jnp.inf, f64), alpha=jnp.asarray(0.0, f64),
        delta_used=jnp.asarray(0.0, f64),
        f_prev=jnp.asarray(jnp.inf, f64), stagnant=jnp.asarray(0),
        kkt_best=jnp.asarray(jnp.inf, f64),
        kkt_mark=jnp.asarray(jnp.inf, f64),
        inner_best=jnp.asarray(jnp.inf, f64),
        inner_mark=jnp.asarray(jnp.inf, f64),
        inner_count=jnp.asarray(0), stall_wins=jnp.asarray(0),
        no_prog=jnp.asarray(0),
        stalled=jnp.asarray(False),
        err_prim=jnp.asarray(jnp.inf, f64),
        err_dual=jnp.asarray(jnp.inf, f64),
        delta_w=jnp.asarray(o.delta_w_init, f64),
    )
    if resume_from is not None:
        # Exact checkpoint resume (utils/checkpoint.py; SURVEY.md
        # section 5.3/5.4): restore the FULL iterate — primal, duals,
        # barrier, and every adaptation counter — so a preempted solve
        # continues bit-for-bit where it stopped (15 + 25 iterations
        # reproduces 40 uninterrupted; tests/test_checkpoint.py). Only
        # the iteration counter and stop flags reset.
        state = resume_from.replace(
            it=jnp.asarray(0), converged=jnp.asarray(False),
            stalled=jnp.asarray(False))

    # Per-row dual regularization r_i (delta_c on active rows; ~1 on
    # masked-out rows so their multipliers decay to the reference). The
    # SHIFTED constraint c_hat_i = c_i - r_i (lam_i - lam_ref_i) is what
    # the Newton step linearizes exactly (the -r_i entry in the KKT (2,2)
    # block is its true Jacobian, not a perturbation), so globalization
    # must measure c_hat, not c — otherwise every dual move of size
    # |dlam| reads as a constraint violation r|dlam| and the line search
    # stalls once |c| < r|dlam| (fatal for the float32 path, where r must
    # be large). lam_ref trails the iterate (proximal point on the dual),
    # so the fixed point still has c = 0 exactly.
    reg_row = delta_c + (1.0 - row_act)          # [N, m]

    def _barrier(Z, g, mu):
        gapL = _safe_gap(Z, nlp.lo, hasL)
        gapU = _safe_gap(nlp.hi, Z, hasU)
        bar = -mu * (jnp.sum(jnp.where(hasL, jnp.log(jnp.maximum(gapL, 1e-300)), 0.0))
                     + jnp.sum(jnp.where(hasU, jnp.log(jnp.maximum(gapU, 1e-300)), 0.0)))
        if dg:
            ggL = _safe_gap(g, nlp.g_lo, ghasL)
            ggU = _safe_gap(nlp.g_hi, g, ghasU)
            bar = bar - mu * (
                jnp.sum(jnp.where(ghasL, jnp.log(jnp.maximum(ggL, 1e-300)), 0.0))
                + jnp.sum(jnp.where(ghasU, jnp.log(jnp.maximum(ggU, 1e-300)), 0.0)))
        return bar

    def al_merit(Z, g, lam, lam_ref, mu):
        """Gill-Robinson primal-dual augmented-Lagrangian barrier merit:
        f + barrier + lam_ref^T c + sum_i (c_i^2 + c_hat_i^2) / (2 r_i).
        Smooth in (Z, g, lam); the regularized-KKT Newton direction is a
        descent direction whenever the primal block is PD. Also returns
        the infeasibility max-norm for the theta_max guard."""
        f = nlp_total_cost(nlp, Z, g, params)
        bar = _barrier(Z, g, mu)
        c = nlp_constraint_residuals(nlp, Z, g, params)
        ch = c - reg_row * (lam - lam_ref)
        pen = jnp.sum((c * c + ch * ch) / (2.0 * reg_row)) \
            + jnp.sum(lam_ref * c)
        theta = jnp.max(jnp.abs(c)) if c.size else jnp.asarray(0.0, Z.dtype)
        return f + bar + pen, theta

    # Ipopt-style absolute infeasibility cap: with a FIXED AL penalty the
    # merit can be unbounded below through infeasible territory (e.g. the
    # unitary-infidelity objective decreases without bound for
    # unnormalized states); no step may take max|c| beyond theta_max.
    c0_init = nlp_constraint_residuals(nlp, Z0, g0, params)
    theta0 = jnp.max(jnp.abs(c0_init)) if c0_init.size \
        else jnp.asarray(0.0, f64)
    theta_max = jnp.maximum(1.0, 10.0 * theta0)

    def full_kkt_error(Z, g, lam, zL, zU, gL, gU, mu):
        """(max-norm, 2-norm) primal-dual residual of the mu-barrier KKT
        system. Uses a single VJP for J^T lam — cheap enough to evaluate at
        several trial points per iteration."""
        gapL = _safe_gap(Z, nlp.lo, hasL)
        gapU = _safe_gap(nlp.hi, Z, hasU)
        grad_z, grad_g = _gradients(nlp, Z, g, params)
        c, vjp_fn = jax.vjp(
            lambda Zz, gg: nlp_constraint_residuals(nlp, Zz, gg, params),
            Z, g)
        JTlam, JgTlam = vjp_fn(lam)
        r1 = (grad_z + JTlam - jnp.where(hasL, zL, 0.0)
              + jnp.where(hasU, zU, 0.0)) * free
        compL = jnp.where(hasL, gapL * zL - mu, 0.0)
        compU = jnp.where(hasU, gapU * zU - mu, 0.0)
        parts = [r1.ravel(), c.ravel(), compL.ravel(), compU.ravel()]
        if dg:
            ggapL = _safe_gap(g, nlp.g_lo, ghasL)
            ggapU = _safe_gap(nlp.g_hi, g, ghasU)
            r1g = grad_g + JgTlam - jnp.where(ghasL, gL, 0.0) \
                + jnp.where(ghasU, gU, 0.0)
            parts += [r1g.ravel(),
                      jnp.where(ghasL, ggapL * gL - mu, 0.0).ravel(),
                      jnp.where(ghasU, ggapU * gU - mu, 0.0).ravel()]
        vec = jnp.concatenate(parts)
        return jnp.max(jnp.abs(vec)), jnp.linalg.norm(vec)

    def body(s: IPMState) -> IPMState:
        Z, g, lam = s.Z, s.g, s.lam
        mu = s.mu

        gapL = _safe_gap(Z, nlp.lo, hasL)
        gapU = _safe_gap(nlp.hi, Z, hasU)
        ggapL = _safe_gap(g, nlp.g_lo, ghasL)
        ggapU = _safe_gap(nlp.g_hi, g, ghasU)

        grad_z, grad_g = _gradients(nlp, Z, g, params)
        c = nlp_constraint_residuals(nlp, Z, g, params)
        ch = c - reg_row * (lam - s.lam_ref)    # proximally shifted residual
        Cself, Cnext, Jg = _jacobians(nlp, Z, g, params)
        # fixed-variable treatment: pinned coordinates take no step, so
        # their Jacobian columns vanish from the KKT (Cnext row k holds
        # columns of z_{k+1} -> mask with free[k+1])
        Cself = Cself * free[:, None, :]
        Cnext = Cnext * free_next[:, None, :]

        JTlam = jnp.einsum("kmz,km->kz", Cself, lam)
        JTlam = JTlam.at[1:].add(jnp.einsum("kmz,km->kz", Cnext[:-1], lam[:-1]))
        JgTlam = jnp.einsum("kmg,km->g", Jg, lam) if dg else jnp.zeros(0, f64)

        # -- KKT errors / convergence ------------------------------------- #
        r_dual_z = (grad_z + JTlam - jnp.where(hasL, s.zL, 0.0)
                    + jnp.where(hasU, s.zU, 0.0)) * free
        r_dual_g = grad_g + JgTlam - jnp.where(ghasL, s.gL, 0.0) \
            + jnp.where(ghasU, s.gU, 0.0)
        compL = jnp.where(hasL, gapL * s.zL, 0.0)
        compU = jnp.where(hasU, gapU * s.zU, 0.0)
        gcompL = jnp.where(ghasL, ggapL * s.gL, 0.0)
        gcompU = jnp.where(ghasU, ggapU * s.gU, 0.0)

        def _max0(x):
            return jnp.max(jnp.abs(x)) if x.size else jnp.asarray(0.0, f64)

        err_dual = jnp.maximum(_max0(r_dual_z), _max0(r_dual_g))
        err_prim = _max0(c)
        err_comp0 = jnp.maximum(jnp.maximum(_max0(compL), _max0(compU)),
                                jnp.maximum(_max0(gcompL), _max0(gcompU)))
        kkt0 = jnp.maximum(err_dual, jnp.maximum(err_prim, err_comp0))
        # Ipopt-style dual scaling s_d (multiplier magnitudes inflate the
        # raw dual residual)
        n_duals = lam.size + 2 * Z.size + 2 * max(dg, 1)
        dual_mass = jnp.sum(jnp.abs(lam)) + jnp.sum(jnp.abs(s.zL)) \
            + jnp.sum(jnp.abs(s.zU)) + jnp.sum(jnp.abs(s.gL)) \
            + jnp.sum(jnp.abs(s.gU))
        s_d = jnp.maximum(100.0, dual_mass / n_duals) / 100.0
        # Relative-KKT termination (Knitro opttol semantics): the dual /
        # complementarity tolerance is measured against max(1,
        # ||grad f||_inf). At a constrained optimum the objective
        # gradient does NOT vanish — it is balanced by J^T lam — so with
        # a Q ~ 100 fidelity objective the achievable absolute dual
        # residual floor sits ~2 orders above a unit-scale problem's
        # (round-5 config-2 diagnosis: f32 floor ~0.2 against
        # ||grad f|| ~ 50 is a 4e-3 RELATIVE error).
        grad_inf = jnp.maximum(_max0(grad_z), _max0(grad_g))
        s_g = jnp.maximum(1.0, grad_inf)
        converged = (err_dual / (s_d * s_g) < o.tol) & \
            (err_prim < o.constr_viol_tol) & \
            (err_comp0 / (s_d * s_g) < o.tol)
        # acceptable termination: feasible + acceptably-stationary + the
        # objective has stagnated for acceptable_iter iterations
        f_now = nlp_total_cost(nlp, Z, g, params)
        acc_now = (err_prim < o.constr_viol_tol) & \
            (err_dual / (s_d * s_g) < o.acceptable_tol) & \
            (jnp.abs(f_now - s.f_prev)
             <= o.acceptable_obj_change * jnp.maximum(1.0, jnp.abs(f_now)))
        stagnant = jnp.where(acc_now, s.stagnant + 1, 0)
        converged = converged | (stagnant >= o.acceptable_iter)
        # numerical-floor stall: windowed progress test. Every stall_iter
        # iterations, compare the best KKT error against its value at the
        # previous window mark; TWO consecutive windows each with less
        # than (1 - stall_ratio) relative improvement, after the barrier
        # is fully driven down, mean the iterate is creeping at the
        # dtype's accuracy floor. Reported as stalled=True, converged
        # stays honest (mid-descent plateaus and warm re-solves whose mu
        # was reset to mu_init must not read as a numerical floor — the
        # double-window rule plus the mu gate protect those).
        kkt_best = jnp.minimum(kkt0, s.kkt_best)
        window_done = s.no_prog + 1 >= o.stall_iter
        win_stalled = window_done & (kkt_best > o.stall_ratio * s.kkt_mark)
        stall_wins = jnp.where(
            window_done, jnp.where(win_stalled, s.stall_wins + 1, 0),
            s.stall_wins)
        # only stop at an iterate near the best error seen — a proximal
        # refresh transiently spikes the dual residual and the stop must
        # not land on the spike
        stall_now = (stall_wins >= 2) & (mu <= 1e-3) & \
            (kkt0 <= 3.0 * kkt_best)
        kkt_mark = jnp.where(window_done, kkt_best, s.kkt_mark)
        no_prog = jnp.where(window_done, 0, s.no_prog + 1)
        stalled = s.stalled | (stall_now & ~converged)

        # -- barrier update ------------------------------------------------ #
        def _cmax(comp, mask):
            return jnp.max(jnp.abs(jnp.where(mask, comp - mu, 0.0))) \
                if comp.size else jnp.asarray(0.0, f64)

        err_comp_mu = jnp.maximum(
            jnp.maximum(_cmax(compL, hasL), _cmax(compU, hasU)),
            jnp.maximum(_cmax(gcompL, ghasL), _cmax(gcompU, ghasU)))
        # the INNER (shifted) subproblem drives the barrier schedule and
        # the proximal reference update: once it is solved to kappa_eps*mu,
        # shrink mu and move lam_ref to the current multipliers (dual
        # proximal-point step — this is what makes the large-delta_c f32
        # path converge to the unshifted solution).
        # Ipopt scales the dual/complementarity errors by s_d in the
        # barrier test too: with large multipliers the raw dual residual
        # floor sits above kappa_eps*mu and mu would never advance.
        err_mu = jnp.maximum(err_dual / s_d,
                             jnp.maximum(_max0(ch), err_comp_mu / s_d))
        inner_done = err_mu <= o.kappa_eps * mu
        mu = jnp.where(
            inner_done,
            jnp.maximum(o.tol / 10.0,
                        jnp.minimum(o.kappa_mu * mu, mu ** o.theta_mu)),
            mu)
        # inexact proximal refresh (see IPMOptions.prox_iter): windowed
        # inner-progress test; a stalled inner subproblem still steps the
        # dual proximal reference so ||c|| keeps contracting.
        inner_best = jnp.minimum(err_mu, s.inner_best)
        iwin_done = s.inner_count + 1 >= o.prox_iter
        inner_stalled = iwin_done & (inner_best > o.prox_ratio * s.inner_mark)
        refresh = inner_done | inner_stalled
        lam_ref = jnp.where(refresh, lam, s.lam_ref)
        ch = jnp.where(refresh, c - reg_row * (lam - lam_ref), ch)
        inner_mark = jnp.where(iwin_done, inner_best, s.inner_mark)
        inner_count = jnp.where(iwin_done | inner_done, 0, s.inner_count + 1)
        # a new subproblem (mu shrank or reference moved) resets the
        # inner-progress tracking
        INF_ = jnp.asarray(jnp.inf, f64)
        inner_best = jnp.where(refresh, INF_, inner_best)
        inner_mark = jnp.where(refresh, INF_, inner_mark)

        # -- KKT matrix blocks --------------------------------------------- #
        Hext = (_stage_hessians_split(nlp, Z, g, params, lam)
                if nlp.stage_cost_split is not None
                else _stage_hessians(nlp, Z, g, params, lam))
        # fixed-variable treatment: zero pinned rows/cols, unit diagonal
        Hext = Hext * mflat[:, :, None] * mflat[:, None, :]
        Hext = Hext.at[:, jnp.arange(dz), jnp.arange(dz)].add(pinf)
        SigL = jnp.where(hasL, s.zL / gapL, 0.0)
        SigU = jnp.where(hasU, s.zU / gapU, 0.0)
        if use_newton:
            Wzz = Hext[:, :dz, :dz]
            Wzz = Wzz.at[:, jnp.arange(dz), jnp.arange(dz)].add(SigL + SigU)
        if dg:
            Cz = Hext[:, :dz, dz:]
            gSig = jnp.where(ghasL, s.gL / ggapL, 0.0) + \
                jnp.where(ghasU, s.gU / ggapU, 0.0)
            Wg = jnp.sum(Hext[:, dz:, dz:], axis=0) + jnp.diag(gSig)

        # dual-equation RHS (after eliminating bound duals); zero at
        # pinned coordinates (their dual equation leaves the system)
        a = (-grad_z - JTlam + jnp.where(hasL, mu / gapL, 0.0)
             - jnp.where(hasU, mu / gapU, 0.0)) * free
        if dg:
            b = -grad_g - JgTlam + jnp.where(ghasL, mu / ggapL, 0.0) \
                - jnp.where(ghasU, mu / ggapU, 0.0)

        lam_reg = reg_row
        Cn = Cnext[:-1]                                 # [N-1, m, dz]

        # -- KKT factorization machinery ------------------------------------ #
        # Factorization backend: the condensed dual Schur complement +
        # block cyclic reduction (kkt.py) by default — O(log2 N)
        # sequential depth, all batched matmuls.
        if dg:
            Pblk = jnp.concatenate([Cz, Jg], axis=1)    # [N, mb, dg]

        def K_matvec(Wmat, w):                          # w [N, mb, r]
            wz, wl = w[:, :dz], w[:, dz:]
            oz = Wmat @ wz + jnp.swapaxes(Cself, -1, -2) @ wl
            oz = oz.at[1:].add(jnp.swapaxes(Cn, -1, -2) @ wl[:-1])
            ol = Cself @ wz - lam_reg[..., None] * wl
            ol = ol.at[:-1].add(Cn @ wz[1:])
            return jnp.concatenate([oz, ol], axis=1)

        def kkt_apply(aux, r):
            """Solve the (z, lam) KKT block given factorization products;
            one step of iterative refinement recovers the accuracy lost
            to the explicit triangular inverses at float32."""
            squeeze = r.ndim == 2
            if squeeze:
                r = r[..., None]
            if o.kkt_backend == "native":
                from .native_kkt import qd_solve_callback
                w = qd_solve_callback(aux["W"], Cself, lam_reg, Cn, r)
            else:
                if o.kkt_backend == "qd":
                    def s1(rr):
                        return qd_solve(aux["f"], Cself, Cn, rr, dz)
                elif o.kkt_backend == "knot":
                    from ..parallel.sharded_kkt import knot_condensed_solve

                    def s1(rr):
                        return knot_condensed_solve(
                            aux["f"], rr, mesh, knot_axis, dz)
                else:
                    def s1(rr):
                        return condensed_solve(aux["f"], Cself, Cn, rr, dz)
                w = s1(r)
                w = w + s1(r - K_matvec(aux["W"], w))
            return w[..., 0] if squeeze else w

        def factorize(Wmat):
            """Factor the KKT with primal Hessian block Wmat. Returns a
            pytree of factorization products (selectable leaf-wise with
            jnp.where). NaNs signal a non-PD primal block — the caller's
            direction-validity test. Matmul-only linear algebra: MXU-
            friendly and the only formulation that compiles in emulated
            float64 on TPU."""
            aux = {"W": Wmat}
            if o.kkt_backend == "qd":
                aux["f"] = qd_factor(Wmat, Cself, lam_reg, Cn)
            elif o.kkt_backend == "knot":
                from ..parallel.sharded_kkt import knot_condensed_factor
                if mesh is None:
                    raise ValueError(
                        "kkt_backend='knot' needs solve_nlp(..., mesh=...)")
                aux["f"] = knot_condensed_factor(
                    Wmat, Cself, lam_reg, Cn, mesh, knot_axis)
            elif o.kkt_backend != "native":
                aux["f"] = condensed_factor(Wmat, Cself, lam_reg, Cn)
            if dg:
                Xcols = kkt_apply(aux, Pblk)            # [N, mb, dg]
                Schur_g = Wg - jnp.einsum("kbg,kbh->gh", Pblk, Xcols)
                ew, EV = jnp.linalg.eigh(0.5 * (Schur_g + Schur_g.T))
                # Saddle-free treatment of the small global block: |ew|
                # with a RELATIVE floor. An absolute max(ew, eps) floor
                # lets an indefinite global objective (e.g. the nonconvex
                # free-phase landscape) keep a near-zero positive
                # eigenvalue and take a huge step along negative
                # curvature, blowing up the phase globals.
                scale = jnp.maximum(jnp.max(jnp.abs(ew)), 1.0)
                floor = jnp.sqrt(jnp.finfo(f64).eps) * scale
                aux.update(Xcols=Xcols,
                           ew=jnp.maximum(jnp.abs(ew), floor), EV=EV)
            return aux

        def kkt_solve(aux, rz, rc, bg):
            """(rz [N,dz], rc [N,m], bg [dg]) -> (dZ, dlam, dgs); globals
            via the small bordered Schur complement."""
            r = jnp.concatenate([rz, rc], axis=1)
            w = kkt_apply(aux, r)
            if dg:
                rhs_g = bg - jnp.einsum("kbg,kb->g", Pblk, w)
                dgs_ = aux["EV"] @ ((aux["EV"].T @ rhs_g) / aux["ew"])
                w = w - jnp.einsum("kbg,g->kb", aux["Xcols"], dgs_)
                return w[:, :dz], w[:, dz:], dgs_
            return w[:, :dz], w[:, dz:], jnp.zeros(0, f64)

        def curvature_ok(Wmat, dZ_, dlam_, dgs_):
            sq = jnp.sum(dZ_ * dZ_) + jnp.sum(dgs_ * dgs_)
            curv = jnp.einsum("kz,kzy,ky->", dZ_, Wmat, dZ_)
            if dg:
                curv = curv + dgs_ @ (Wg @ dgs_) \
                    + 2.0 * jnp.einsum("kz,kzg,g->", dZ_, Cz, dgs_)
            finite = jnp.all(jnp.isfinite(dZ_)) & jnp.all(jnp.isfinite(dlam_)) \
                & jnp.all(jnp.isfinite(dgs_))
            return finite & (curv >= 1e-9 * sq)

        bg0 = b if dg else jnp.zeros(0, f64)
        rng_dz = jnp.arange(dz)

        # -- candidate-direction strategy ------------------------------------ #
        # hess_mode="clamp":
        # C: globally-robust direction from the matmul-only PSD-clamped
        #    Lagrangian Hessian (kkt.psd_clamp — preserves all positive
        #    curvature, no eigendecomposition) — always a descent direction.
        # N (options.newton_dir): exact Newton on the full indefinite KKT
        #    (quadratic tail), kept only if the factorization goes through
        #    (primal blocks PD along the condensed/quasidefinite recursion)
        #    AND it passes a positive-curvature test.
        # S: Mehrotra/SOC-corrected step, computed on the best valid base
        #    factorization (N when enabled and valid, else C) — so the
        #    corrector exists even when the exact-Hessian KKT is rejected.
        # Static shapes throughout: one factorization when newton_dir is
        # off, two when on — no inertia ladder.
        #
        # hess_mode="shift" (see IPMOptions.hess_mode): ONE factorization
        # of W + delta_w I with the adaptive inertia shift carried in the
        # state; a failed factorization takes a null step this iteration
        # and retries with delta_w * delta_w_inc next iteration.
        if o.hess_mode == "shift":
            Wsh = Hext[:, :dz, :dz]
            Wsh = Wsh.at[:, rng_dz, rng_dz].add(SigL + SigU + s.delta_w)
            auxB = factorize(Wsh)
            dZN, dlamN, dgsN = kkt_solve(auxB, a, -ch, bg0)
            okN = jnp.all(jnp.isfinite(dZN)) & jnp.all(jnp.isfinite(dlamN)) \
                & jnp.all(jnp.isfinite(dgsN))
            dZN = jnp.where(okN, dZN, 0.0)
            dlamN = jnp.where(okN, dlamN, 0.0)
            dgsN = jnp.where(okN, dgsN, 0.0)
            okC = jnp.asarray(False)
            aux = auxB
            dZb, dgsb, dlamb = dZN, dgsN, dlamN
            okB = okN
        else:
            HB = psd_clamp(Hext[:, :dz, :dz], hess_floor,
                           iters=o.clamp_iters if o.clamp_iters is not None
                           else (20 if is_f32 else 32),
                           mode="abs" if o.hess_mode == "abs" else "pos")
            WzzC = HB.at[:, rng_dz, rng_dz].add(SigL + SigU)
            auxC = factorize(WzzC)
            dZC, dlamC, dgsC = kkt_solve(auxC, a, -ch, bg0)
            okC = jnp.all(jnp.isfinite(dZC)) & jnp.all(jnp.isfinite(dlamC)) \
                & jnp.all(jnp.isfinite(dgsC))
            dZC = jnp.where(okC, dZC, 0.0)
            dlamC = jnp.where(okC, dlamC, 0.0)
            dgsC = jnp.where(okC, dgsC, 0.0)

            if use_newton:
                auxN = factorize(Wzz)
                dZN, dlamN, dgsN = kkt_solve(auxN, a, -ch, bg0)
                okN = curvature_ok(Wzz, dZN, dlamN, dgsN)
                # Sanitize: a failed factorization signals with NaNs, which
                # must not leak into the SOC right-hand sides or the merit.
                dZN = jnp.where(okN, dZN, 0.0)
                dlamN = jnp.where(okN, dlamN, 0.0)
                dgsN = jnp.where(okN, dgsN, 0.0)
                # SOC rides the exact-Newton factorization only: correcting
                # the clamp direction instead (tried) lets a plausible-merit
                # but poorly-scaled corrected step win the comparison and
                # derail hard nonconvex solves.
                aux = auxN
                dZb, dgsb, dlamb = dZN, dgsN, dlamN
                okB = okN
            else:
                okN = jnp.asarray(False)
                # clamp-based SOC: without the Newton direction the
                # corrector is what restores fast local convergence on
                # the f32 path
                aux = auxC
                dZb, dgsb, dlamb = dZC, dgsC, dlamC
                okB = okC

        # -- second-order corrected step S ---------------------------------- #
        # (i) Mehrotra-style complementarity corrector: push the dZ*dzL
        #     products of the first solve into the eliminated dual rhs;
        # (ii) constraint SOC (Maratos fix): correct for the quadratic
        #     remainder of the dynamics/equality residuals.
        # Both reuse the base factorization.
        dzL1 = jnp.where(hasL, mu / gapL - s.zL - SigL * dZb, 0.0)
        dzU1 = jnp.where(hasU, mu / gapU - s.zU + SigU * dZb, 0.0)
        a_corr = a - jnp.where(hasL, dZb * dzL1 / gapL, 0.0) \
            - jnp.where(hasU, dZb * dzU1 / gapU, 0.0)
        if dg:
            dgL1 = jnp.where(ghasL, mu / ggapL - s.gL
                             - (s.gL / ggapL) * dgsb, 0.0)
            dgU1 = jnp.where(ghasU, mu / ggapU - s.gU
                             + (s.gU / ggapU) * dgsb, 0.0)
            b_corr = b - jnp.where(ghasL, dgsb * dgL1 / ggapL, 0.0) \
                - jnp.where(ghasU, dgsb * dgU1 / ggapU, 0.0)
        else:
            b_corr = bg0
        c_soc = nlp_constraint_residuals(nlp, Z + dZb, g + dgsb, params)
        ch_soc = c_soc - reg_row * (lam + dlamb - lam_ref)
        JdZ1 = jnp.einsum("kmz,kz->km", Cself, dZb)
        JdZ1 = JdZ1.at[:-1].add(
            jnp.einsum("kmz,kz->km", Cnext[:-1], dZb[1:]))
        if dg:
            JdZ1 = JdZ1 + jnp.einsum("kmg,g->km", Jg, dgsb)
        # quadratic remainder of the SHIFTED constraint (linear model is
        # ch + J dZ - reg * dlam)
        q2 = ch_soc - ch - (JdZ1 - reg_row * dlamb)
        dZS, dlamS, dgsS = kkt_solve(aux, a_corr, -ch - q2, b_corr)
        okS = okB & jnp.all(jnp.isfinite(dZS)) & jnp.all(jnp.isfinite(dlamS)) \
            & jnp.all(jnp.isfinite(dgsS))
        dZS = jnp.where(okS, dZS, 0.0)
        dlamS = jnp.where(okS, dlamS, 0.0)
        dgsS = jnp.where(okS, dgsS, 0.0)

        # -- fraction-to-boundary helper ------------------------------------ #
        tau = jnp.maximum(o.tau_min, 1.0 - mu)

        def max_step(gap, d, mask):
            ratio = jnp.where(mask & (d < 0),
                              -tau * gap / jnp.where(d < 0, d, -1.0), jnp.inf)
            return jnp.minimum(1.0, jnp.min(ratio) if ratio.size else jnp.inf)

        # -- AL merit: gradient and parallel Armijo line search ------------- #
        # The merit moves (Z, g, lam) jointly; its exact gradient is cheap
        # from pieces already computed:
        #   grad_Z M = grad_z + barrier' + C^T (lam_ref + (c + ch)/reg)
        #   grad_g M = grad_g + barrier' + Jg^T (same vector)
        #   grad_lam M = -ch
        w_pen = lam_ref + (c + ch) / reg_row
        CTw = jnp.einsum("kmz,km->kz", Cself, w_pen)
        CTw = CTw.at[1:].add(jnp.einsum("kmz,km->kz", Cnext[:-1], w_pen[:-1]))
        gradM_z = grad_z - jnp.where(hasL, mu / gapL, 0.0) \
            + jnp.where(hasU, mu / gapU, 0.0) + CTw
        if dg:
            gradM_g = grad_g - jnp.where(ghasL, mu / ggapL, 0.0) \
                + jnp.where(ghasU, mu / ggapU, 0.0) \
                + jnp.einsum("kmg,km->g", Jg, w_pen)
        else:
            gradM_g = jnp.zeros(0, f64)

        def merit_dderiv(dZ_, dgs_, dlam_):
            val = jnp.sum(gradM_z * dZ_) - jnp.sum(ch * dlam_)
            if dg:
                val = val + jnp.sum(gradM_g * dgs_)
            return val

        phi0, _ = al_merit(Z, g, lam, lam_ref, mu)

        def alpha_max_primal(dZ_, dgs_):
            ap = jnp.minimum(max_step(gapL, dZ_, hasL),
                             max_step(gapU, -dZ_, hasU))
            if dg:
                ap = jnp.minimum(ap, jnp.minimum(
                    max_step(ggapL, dgs_, ghasL),
                    max_step(ggapU, -dgs_, ghasU)))
            return ap

        # Candidate set: (dZ, dgs, dlam, ok, diagnostic code). The last
        # entry is the fallback when nothing passes: the clamp direction
        # C ("clamp" mode) or the null step ("shift" mode — the iterate
        # waits one iteration while delta_w grows).
        if o.hess_mode == "shift":
            dirs = [(dZS, dgsS, dlamS, okS, 0.0),
                    (dZN, dgsN, dlamN, okN, 1.0),
                    (jnp.zeros_like(Z), jnp.zeros_like(g),
                     jnp.zeros_like(lam), jnp.asarray(True), 3.0)]
        else:
            dirs = [(dZS, dgsS, dlamS, okS, 0.0)]
            if use_newton:
                dirs.append((dZN, dgsN, dlamN, okN, 1.0))
            dirs.append((dZC, dgsC, dlamC, okC, 2.0))
        codes = jnp.asarray([d[4] for d in dirs], f64)

        # ONE merged parallel Armijo backtracking over all candidate
        # directions: all len(dirs) x ls_iters merit evaluations run in
        # a single vmapped batch.
        dZ2 = jnp.stack([d[0] for d in dirs])
        dgs2 = jnp.stack([d[1] for d in dirs])
        dlam2 = jnp.stack([d[2] for d in dirs])
        ok_dir = jnp.stack([d[3] for d in dirs])
        ap2 = jnp.stack([alpha_max_primal(d[0], d[1]) for d in dirs])
        D2 = jnp.minimum(jnp.stack(
            [merit_dderiv(d[0], d[1], d[2]) for d in dirs]), 0.0)
        alphas2 = ap2[:, None] * (0.5 ** jnp.arange(o.ls_iters, dtype=f64))

        def eval_merit(dZ_, dgs_, dlam_, al):
            return al_merit(Z + al * dZ_, g + al * dgs_,
                            lam + al * dlam_, lam_ref, mu)

        phis2, thetas2 = jax.vmap(jax.vmap(
            eval_merit, in_axes=(None, None, None, 0)),
            in_axes=(0, 0, 0, 0))(dZ2, dgs2, dlam2, alphas2)
        # Noise-tolerant Armijo: the merit is a sum of O(N*m) float
        # terms, so its evaluation carries ~eps*|phi| rounding noise;
        # without the floor the test starves in float32 (every true
        # decrease smaller than the noise is rejected and the solver
        # crawls at alpha_min). Negligible slack in float64.
        noise = 10.0 * jnp.finfo(f64).eps * jnp.abs(phi0)
        ok2 = (phis2 <= phi0 + o.armijo_eta * alphas2 * D2[:, None] + noise) \
            & jnp.isfinite(phis2) & (thetas2 <= theta_max)
        idx2 = jnp.argmax(ok2, axis=1)
        any2 = jnp.any(ok2, axis=1)

        def _take(arr, i):
            return jnp.take_along_axis(arr, i[:, None], axis=1)[:, 0]

        alpha2 = jnp.where(any2, _take(alphas2, idx2), alphas2[:, -1])
        phi2 = jnp.where(any2, _take(phis2, idx2), phis2[:, -1])

        # -- bound-dual update machinery ------------------------------------ #
        def dual_updates(dZ_, dgs_):
            dzL_ = jnp.where(hasL, mu / gapL - s.zL - SigL * dZ_, 0.0)
            dzU_ = jnp.where(hasU, mu / gapU - s.zU + SigU * dZ_, 0.0)
            if dg:
                dgL_ = jnp.where(ghasL, mu / ggapL - s.gL
                                 - (s.gL / ggapL) * dgs_, 0.0)
                dgU_ = jnp.where(ghasU, mu / ggapU - s.gU
                                 + (s.gU / ggapU) * dgs_, 0.0)
            else:
                dgL_ = jnp.zeros(0, f64)
                dgU_ = jnp.zeros(0, f64)
            ad = jnp.minimum(max_step(s.zL, dzL_, hasL),
                             max_step(s.zU, dzU_, hasU))
            if dg:
                ad = jnp.minimum(ad, jnp.minimum(
                    max_step(s.gL, dgL_, ghasL), max_step(s.gU, dgU_, ghasU)))
            return dzL_, dzU_, dgL_, dgU_, ad

        # -- merit selection ------------------------------------------------ #
        # Pick the valid candidate with the lowest merit at its own
        # Armijo-accepted step (argmin prefers the SOC-corrected Newton
        # step S on ties); if every direction is invalid, fall back to
        # the clamp direction C at the minimum step — its Armijo alpha
        # still guarantees merit descent whenever it exists. Residual-
        # based "accept the raw Newton step even when the merit rejects
        # it" heuristics were tried and REGRESS: the AL merit is nearly
        # dual-blind, so a residual-2-norm line search can latch onto
        # steps whose multiplier component explodes, entering a limit
        # cycle that never converges (round-2 regression, VERDICT.md).
        INF = jnp.asarray(jnp.inf, f64)
        phi3 = jnp.where(ok_dir & any2, phi2, INF)
        pick = jnp.argmin(phi3)
        pick = jnp.where(jnp.isinf(jnp.min(phi3)), len(dirs) - 1, pick)
        delta_used = codes[pick]

        dZ = dZ2[pick] * free          # exact zero step on pinned coords
        dgs = dgs2[pick]
        dlam = dlam2[pick]
        alpha = alpha2[pick]

        # -- bound dual steps + dual fraction-to-boundary ------------------- #
        dzL, dzU, dgL, dgU, alpha_d = dual_updates(dZ, dgs)

        # -- masked update ------------------------------------------------- #
        done = converged | stalled
        step = jnp.where(done, 0.0, alpha)
        dstep = jnp.where(done, 0.0, alpha_d)
        Z_new = Z + step * dZ
        g_new = g + step * dgs
        lam_new = lam + step * dlam
        zL_new = s.zL + dstep * dzL
        zU_new = s.zU + dstep * dzU
        gL_new = s.gL + dstep * dgL
        gU_new = s.gU + dstep * dgU

        # dual box safeguard (Ipopt kappa_sigma)
        gapL_n = _safe_gap(Z_new, nlp.lo, hasL)
        gapU_n = _safe_gap(nlp.hi, Z_new, hasU)
        zL_new = jnp.where(hasL, jnp.clip(
            zL_new, mu / (o.kappa_sigma * gapL_n),
            o.kappa_sigma * mu / gapL_n), 0.0)
        zU_new = jnp.where(hasU, jnp.clip(
            zU_new, mu / (o.kappa_sigma * gapU_n),
            o.kappa_sigma * mu / gapU_n), 0.0)
        if dg:
            ggapL_n = _safe_gap(g_new, nlp.g_lo, ghasL)
            ggapU_n = _safe_gap(nlp.g_hi, g_new, ghasU)
            gL_new = jnp.where(ghasL, jnp.clip(
                gL_new, mu / (o.kappa_sigma * ggapL_n),
                o.kappa_sigma * mu / ggapL_n), 0.0)
            gU_new = jnp.where(ghasU, jnp.clip(
                gU_new, mu / (o.kappa_sigma * ggapU_n),
                o.kappa_sigma * mu / ggapU_n), 0.0)

        return IPMState(
            Z=Z_new, g=g_new, lam=lam_new, lam_ref=lam_ref,
            zL=zL_new, zU=zU_new,
            gL=gL_new, gU=gU_new, mu=mu,
            nu=jnp.max(jnp.abs(lam_ref)) if lam_ref.size
            else jnp.asarray(0.0, f64),
            it=s.it + 1, converged=converged, kkt_err=kkt0, alpha=alpha,
            delta_used=delta_used
            + 10.0 * okN.astype(f64) + 100.0 * okC.astype(f64),
            f_prev=f_now, stagnant=stagnant,
            kkt_best=kkt_best, kkt_mark=kkt_mark,
            inner_best=inner_best, inner_mark=inner_mark,
            inner_count=inner_count, stall_wins=stall_wins,
            no_prog=no_prog, stalled=stalled,
            err_prim=err_prim, err_dual=err_dual / s_d,
            delta_w=jnp.where(
                done, s.delta_w,
                jnp.where(okB,
                          jnp.maximum(o.delta_w_min,
                                      s.delta_w * o.delta_w_dec),
                          jnp.minimum(o.delta_w_max,
                                      s.delta_w * o.delta_w_inc)))
            if o.hess_mode == "shift" else s.delta_w)

    return state, body


def _trace_ctx(Z0):
    """Tracing context for the solver: full-f32 matmul precision always
    (the MXU's default bf16 dot passes destroy KKT accuracy), and x64
    DISABLED when the iterate is float32 — otherwise closure-captured f64
    constants (generator matrices, goal isos) promote intermediate values
    to f64 and split the dtype of the while_loop carry."""
    ctx = contextlib.ExitStack()
    ctx.enter_context(jax.default_matmul_precision("float32"))
    if jnp.dtype(Z0.dtype) == jnp.float32 and jax.config.jax_enable_x64:
        ctx.enter_context(jax.enable_x64(False))
    return ctx


def solve_nlp(nlp: CollocationNLP, params, Z0, g0=None,
              options: IPMOptions = IPMOptions(),
              callback=None, callback_every: int = 1,
              mesh=None, knot_axis: str = "knot",
              resume_from: IPMState | None = None) -> IPMState:
    """Solve the collocation NLP from (Z0, g0). Fully jittable/vmappable
    (except kkt_backend="knot", which is single-problem).

    Runs in the dtype of Z0: float32 is the TPU production path (see
    IPMOptions *_f32 knobs), float64 the CPU/verification path.

    callback: optional HOST function (it, kkt_err, mu, alpha, Z) fired
    via jax.debug.callback every callback_every accepted iterations —
    the per-iteration observability hook (Ipopt iteration log /
    LivePulsePlotCallback analogue). Adds a host sync per firing; leave
    None in production.

    mesh/knot_axis: device mesh for kkt_backend="knot" — the knot axis of
    every [N, ...] array is sharded over mesh's knot_axis devices and the
    KKT is solved with the SPIKE-partitioned sharded backend
    (parallel/sharded_kkt.py); the per-knot derivative/residual sweeps
    partition automatically under GSPMD."""
    with _trace_ctx(Z0):
        state, body = _setup(nlp, params, Z0, g0, options,
                             mesh=mesh, knot_axis=knot_axis,
                             resume_from=resume_from)

        if callback is not None:
            inner_body = body

            def body(s: IPMState) -> IPMState:
                s2 = inner_body(s)

                def fire(_):
                    jax.debug.callback(callback, s2.it, s2.kkt_err,
                                       s2.mu, s2.alpha, s2.Z)
                    return 0

                jax.lax.cond(s2.it % callback_every == 0,
                             fire, lambda _: 0, 0)
                return s2

        def cond(s: IPMState):
            return (s.it < options.max_iter) & ~(s.converged | s.stalled)

        return jax.lax.while_loop(cond, body, state)


def solve_nlp_traced(nlp: CollocationNLP, params, Z0, g0=None,
                     options: IPMOptions = IPMOptions(),
                     mesh=None, knot_axis: str = "knot"):
    """Like solve_nlp but runs exactly max_iter scan steps and returns
    (state, history dict) for convergence diagnostics."""
    with _trace_ctx(Z0):
        state0, body = _setup(nlp, params, Z0, g0, options,
                              mesh=mesh, knot_axis=knot_axis)

        def step(s, _):
            s_new = jax.lax.cond(s.converged | s.stalled, lambda x: x, body, s)
            return s_new, {"kkt": s_new.kkt_err, "mu": s_new.mu,
                           "alpha": s_new.alpha, "nu": s_new.nu,
                           "delta": s_new.delta_used, "f": s_new.f_prev,
                           "err_prim": s_new.err_prim,
                           "err_dual": s_new.err_dual,
                           "dw": s_new.delta_w}

        return jax.lax.scan(step, state0, None, length=options.max_iter)
