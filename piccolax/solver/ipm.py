"""Batched primal-dual interior-point method for collocation NLPs.

The Ipopt replacement (SURVEY.md section 7, "hard parts" #1). Fiacco-
McCormick monotone barrier with:

- exact per-knot Lagrangian Hessians via JAX autodiff;
- the FULL symmetric indefinite KKT system factored directly: ordering
  unknowns per knot as (z_k, lambda_k) makes the KKT matrix
  block-tridiagonal over the knot axis, factored by a block LDL^T
  (`solver/kkt.py`) whose Schur-complemented diagonal blocks expose the
  inertia (Sylvester), driving Ipopt-style inertia-corrected
  regularization (delta_w ladder) with a STATIC trial loop;
- global variables (free phases, slacks) via a small bordered Schur
  complement on the factored system;
- fraction-to-boundary rule + vectorized Armijo backtracking on an l1
  merit function (all candidate step sizes evaluated in parallel);
- everything shape-static: one `lax.while_loop` whose body is pure
  batched linear algebra, so thousands of problems solve simultaneously
  under `vmap` with per-problem convergence masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .kkt import qd_factor, qd_solve
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
    delta_w0: float = 1e-4       # cold-start inertia-correction magnitude
    delta_w_scale: float = 10.0  # ladder growth factor
    delta_w_shrink: float = 3.0  # warm-start shrink of the last correction
    inertia_trials: int = 12     # max regularization attempts
    delta_c: float = 1e-8        # constraint-row regularization (f64)
    # float32 production path (TPU): the quasidefinite recursion must keep
    # its dynamic range inside ~1/eps32. Because the dual regularization
    # acts as a TRAILING proximal term (the Newton rhs uses the true
    # constraint residual and the dual reference moves with the iterate),
    # a large delta_c damps dual steps without biasing the fixed point.
    delta_c_f32: float = 1e-3    # constraint-row regularization (f32)
    hess_floor: float = 1e-6     # fallback-Hessian eigenvalue floor (f64)
    hess_floor_f32: float = 3e-3  # fallback-Hessian eigenvalue floor (f32)
    ls_iters: int = 14           # parallel backtracking candidates
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
    # KKT linear-solver backend: "jax" (matmul-only quasidefinite
    # factorization, the TPU production path) or "native" (C++ exact-
    # Cholesky host library via pure_callback — the Ipopt/MadNLP-style
    # second backend, CPU runs only).
    kkt_backend: str = "jax"


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
    delta_used: jnp.ndarray  # direction diagnostics (0=S, 1=A, 2=B)
    f_prev: jnp.ndarray     # objective at previous iterate
    stagnant: jnp.ndarray   # consecutive acceptable+stagnant iterations


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
        A = jax.vmap(lambda k, z, zp: jax.jacfwd(
            lambda zz: nlp.dynamics(k, zz, zp, g, params))(z))(ks, Z[:-1], Z[1:])
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


def _setup(nlp: CollocationNLP, params, Z0, g0, options: IPMOptions):
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
    delta_c = max(o.delta_c, o.delta_c_f32) if is_f32 else o.delta_c
    hess_floor = max(o.hess_floor, o.hess_floor_f32) if is_f32 \
        else o.hess_floor
    # bound gaps of degenerate-active components scale as bound_relax;
    # Sigma = z/gap ~ mu/gap^2 must stay inside f32 range
    bound_relax = max(o.bound_relax, 1e-4) if is_f32 else o.bound_relax

    hasL = _finite(nlp.lo)
    hasU = _finite(nlp.hi)
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
    )

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
        r1 = grad_z + JTlam - jnp.where(hasL, zL, 0.0) \
            + jnp.where(hasU, zU, 0.0)
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

        JTlam = jnp.einsum("kmz,km->kz", Cself, lam)
        JTlam = JTlam.at[1:].add(jnp.einsum("kmz,km->kz", Cnext[:-1], lam[:-1]))
        JgTlam = jnp.einsum("kmg,km->g", Jg, lam) if dg else jnp.zeros(0, f64)

        # -- KKT errors / convergence ------------------------------------- #
        r_dual_z = grad_z + JTlam - jnp.where(hasL, s.zL, 0.0) \
            + jnp.where(hasU, s.zU, 0.0)
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
        converged = (err_dual / s_d < o.tol) & \
            (err_prim < o.constr_viol_tol) & (err_comp0 / s_d < o.tol)
        # acceptable termination: feasible + acceptably-stationary + the
        # objective has stagnated for acceptable_iter iterations
        f_now = nlp_total_cost(nlp, Z, g, params)
        acc_now = (err_prim < o.constr_viol_tol) & \
            (err_dual / s_d < o.acceptable_tol) & \
            (jnp.abs(f_now - s.f_prev)
             <= o.acceptable_obj_change * jnp.maximum(1.0, jnp.abs(f_now)))
        stagnant = jnp.where(acc_now, s.stagnant + 1, 0)
        converged = converged | (stagnant >= o.acceptable_iter)

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
        err_mu = jnp.maximum(err_dual, jnp.maximum(_max0(ch), err_comp_mu))
        inner_done = err_mu <= o.kappa_eps * mu
        mu = jnp.where(
            inner_done,
            jnp.maximum(o.tol / 10.0,
                        jnp.minimum(o.kappa_mu * mu, mu ** o.theta_mu)),
            mu)
        lam_ref = jnp.where(inner_done, lam, s.lam_ref)
        ch = jnp.where(inner_done, c - reg_row * (lam - lam_ref), ch)

        # -- KKT matrix blocks --------------------------------------------- #
        Hext = _stage_hessians(nlp, Z, g, params, lam)
        SigL = jnp.where(hasL, s.zL / gapL, 0.0)
        SigU = jnp.where(hasU, s.zU / gapU, 0.0)
        Wzz = Hext[:, :dz, :dz]
        Wzz = Wzz.at[:, jnp.arange(dz), jnp.arange(dz)].add(SigL + SigU)
        if dg:
            Cz = Hext[:, :dz, dz:]
            gSig = jnp.where(ghasL, s.gL / ggapL, 0.0) + \
                jnp.where(ghasU, s.gU / ggapU, 0.0)
            Wg = jnp.sum(Hext[:, dz:, dz:], axis=0) + jnp.diag(gSig)

        # dual-equation RHS (after eliminating bound duals)
        a = -grad_z - JTlam + jnp.where(hasL, mu / gapL, 0.0) \
            - jnp.where(hasU, mu / gapU, 0.0)
        if dg:
            b = -grad_g - JgTlam + jnp.where(ghasL, mu / ggapL, 0.0) \
                - jnp.where(ghasU, mu / ggapU, 0.0)

        lam_reg = reg_row
        Cn = Cnext[:-1]                                 # [N-1, m, dz]

        # -- two-direction strategy ----------------------------------------- #
        # A: exact Newton on the full indefinite KKT (quadratic tail), kept
        #    only if the quasidefinite factorization goes through (primal
        #    block PD along the Schur recursion) AND it passes a
        #    positive-curvature test.
        # B: globally-robust fallback with the eigenvalue-clamped (PD)
        #    Lagrangian Hessian — always a descent direction.
        # Both get a parallel Armijo line search; the better merit wins.
        # Fixed two factorizations per iteration: static shapes, no ladder.
        def make_solver(Wmat):
            """Factor the quasidefinite block-tridiagonal KKT with primal
            Hessian block Wmat; return a solver
            (rz [N,dz], rc [N,m], bg [dg]) -> (dZ, dlam, dgs) reusable for
            second-order corrections. Matmul-only linear algebra (kkt.py
            `qd_factor`): MXU-friendly and the only formulation that
            compiles in emulated float64 on TPU. NaNs signal a non-PD
            primal block (the caller's direction-validity test). One step
            of iterative refinement recovers the accuracy lost to the
            explicit triangular inverses at float32."""
            if o.kkt_backend == "native":
                from .native_kkt import qd_solve_callback

                def kkt_solve(r):
                    squeeze = r.ndim == 2
                    if squeeze:
                        r = r[..., None]
                    w = qd_solve_callback(Wmat, Cself, lam_reg, Cn, r)
                    return w[..., 0] if squeeze else w
            else:
                factors = qd_factor(Wmat, Cself, lam_reg, Cn)

                def K_matvec(w):                        # w [N, mb, r]
                    wz, wl = w[:, :dz], w[:, dz:]
                    oz = Wmat @ wz + jnp.swapaxes(Cself, -1, -2) @ wl
                    oz = oz.at[1:].add(jnp.swapaxes(Cn, -1, -2) @ wl[:-1])
                    ol = Cself @ wz - lam_reg[..., None] * wl
                    ol = ol.at[:-1].add(Cn @ wz[1:])
                    return jnp.concatenate([oz, ol], axis=1)

                def kkt_solve(r):
                    squeeze = r.ndim == 2
                    if squeeze:
                        r = r[..., None]
                    w = qd_solve(factors, Cself, Cn, r, dz)
                    w = w + qd_solve(factors, Cself, Cn, r - K_matvec(w), dz)
                    return w[..., 0] if squeeze else w

            if dg:
                P = jnp.concatenate([Cz, Jg], axis=1)   # [N, mb, dg]
                Xcols = kkt_solve(P)
                Schur_g = Wg - jnp.einsum("kbg,kbh->gh", P, Xcols)
                ew, EV = jnp.linalg.eigh(0.5 * (Schur_g + Schur_g.T))
                ew = jnp.maximum(ew, 1e-10)

                def solve(rz, rc, bg):
                    r = jnp.concatenate([rz, rc], axis=1)
                    w0 = kkt_solve(r)
                    rhs_g = bg - jnp.einsum("kbg,kb->g", P, w0)
                    dgs_ = EV @ ((EV.T @ rhs_g) / ew)
                    w = w0 - jnp.einsum("kbg,g->kb", Xcols, dgs_)
                    return w[:, :dz], w[:, dz:], dgs_
            else:
                def solve(rz, rc, bg):
                    r = jnp.concatenate([rz, rc], axis=1)
                    w = kkt_solve(r)
                    return w[:, :dz], w[:, dz:], jnp.zeros(0, f64)
            return solve

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
        solveA = make_solver(Wzz)
        dZA, dlamA, dgsA = solveA(a, -ch, bg0)
        okA = curvature_ok(Wzz, dZA, dlamA, dgsA)
        # Sanitize: the quasidefinite factorization signals an indefinite
        # primal block with NaNs, which must not leak into the merit
        # penalty (nu) or the SOC right-hand sides.
        dZA = jnp.where(okA, dZA, 0.0)
        dlamA = jnp.where(okA, dlamA, 0.0)
        dgsA = jnp.where(okA, dgsA, 0.0)

        # -- second-order corrected step S ---------------------------------- #
        # (i) Mehrotra-style complementarity corrector: push the dZ*dzL
        #     products of the first solve into the eliminated dual rhs;
        # (ii) constraint SOC (Maratos fix): correct for the quadratic
        #     remainder of the dynamics/equality residuals.
        # Both reuse the SAME factorization.
        dzL1 = jnp.where(hasL, mu / gapL - s.zL - SigL * dZA, 0.0)
        dzU1 = jnp.where(hasU, mu / gapU - s.zU + SigU * dZA, 0.0)
        a_corr = a - jnp.where(hasL, dZA * dzL1 / gapL, 0.0) \
            - jnp.where(hasU, dZA * dzU1 / gapU, 0.0)
        if dg:
            dgL1 = jnp.where(ghasL, mu / ggapL - s.gL
                             - (s.gL / ggapL) * dgsA, 0.0)
            dgU1 = jnp.where(ghasU, mu / ggapU - s.gU
                             + (s.gU / ggapU) * dgsA, 0.0)
            b_corr = b - jnp.where(ghasL, dgsA * dgL1 / ggapL, 0.0) \
                - jnp.where(ghasU, dgsA * dgU1 / ggapU, 0.0)
        else:
            b_corr = bg0
        c_soc = nlp_constraint_residuals(nlp, Z + dZA, g + dgsA, params)
        ch_soc = c_soc - reg_row * (lam + dlamA - lam_ref)
        JdZ1 = jnp.einsum("kmz,kz->km", Cself, dZA)
        JdZ1 = JdZ1.at[:-1].add(
            jnp.einsum("kmz,kz->km", Cnext[:-1], dZA[1:]))
        if dg:
            JdZ1 = JdZ1 + jnp.einsum("kmg,g->km", Jg, dgsA)
        # quadratic remainder of the SHIFTED constraint (linear model is
        # ch + J dZ - reg * dlam)
        q2 = ch_soc - ch - (JdZ1 - reg_row * dlamA)
        dZS, dlamS, dgsS = solveA(a_corr, -ch - q2, b_corr)
        okS = okA & jnp.all(jnp.isfinite(dZS)) & jnp.all(jnp.isfinite(dlamS)) \
            & jnp.all(jnp.isfinite(dgsS))
        dZS = jnp.where(okS, dZS, 0.0)
        dlamS = jnp.where(okS, dlamS, 0.0)
        dgsS = jnp.where(okS, dgsS, 0.0)

        # clamped-PD fallback Hessian (relative floor: an absolute 1e-8
        # clamp leaves the block with condition ~1e10+, which poisons the
        # downstream Schur products even in f64)
        ewB, EVB = jnp.linalg.eigh(Hext[:, :dz, :dz])
        ewB_floor = hess_floor * jnp.maximum(
            1.0, jnp.max(jnp.abs(ewB), axis=-1, keepdims=True))
        HB = jnp.einsum("kij,kj,klj->kil", EVB,
                        jnp.maximum(ewB, ewB_floor), EVB)
        WzzB = HB.at[:, jnp.arange(dz), jnp.arange(dz)].add(SigL + SigU)
        dZB, dlamB, dgsB = make_solver(WzzB)(a, -ch, bg0)
        okB = jnp.all(jnp.isfinite(dZB)) & jnp.all(jnp.isfinite(dlamB)) \
            & jnp.all(jnp.isfinite(dgsB))
        dZB = jnp.where(okB, dZB, 0.0)
        dlamB = jnp.where(okB, dlamB, 0.0)
        dgsB = jnp.where(okB, dgsB, 0.0)

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

        dphiA = merit_dderiv(dZA, dgsA, dlamA)
        dphiS = merit_dderiv(dZS, dgsS, dlamS)
        dphiB = merit_dderiv(dZB, dgsB, dlamB)
        phi0, _ = al_merit(Z, g, lam, lam_ref, mu)

        def line_search(dZ_, dgs_, dlam_, dphi_):
            alpha_p = jnp.minimum(max_step(gapL, dZ_, hasL),
                                  max_step(gapU, -dZ_, hasU))
            if dg:
                alpha_p = jnp.minimum(alpha_p, jnp.minimum(
                    max_step(ggapL, dgs_, ghasL),
                    max_step(ggapU, -dgs_, ghasU)))
            D = jnp.minimum(dphi_, 0.0)
            alphas = alpha_p * (0.5 ** jnp.arange(o.ls_iters, dtype=f64))

            def eval_merit(al):
                return al_merit(Z + al * dZ_, g + al * dgs_,
                                lam + al * dlam_, lam_ref, mu)

            phis, thetas = jax.vmap(eval_merit)(alphas)
            # Noise-tolerant Armijo: the merit is a sum of O(N*m) float
            # terms, so its evaluation carries ~eps*|phi| rounding noise;
            # without the floor the test starves in float32 (every true
            # decrease smaller than the noise is rejected and the solver
            # crawls at alpha_min). Negligible slack in float64.
            noise = 10.0 * jnp.finfo(f64).eps * jnp.abs(phi0)
            ok_ls = (phis <= phi0 + o.armijo_eta * alphas * D + noise) \
                & jnp.isfinite(phis) & (thetas <= theta_max)
            idx = jnp.argmax(ok_ls)
            any_ok = jnp.any(ok_ls)
            alpha = jnp.where(any_ok, alphas[idx], alphas[-1])
            phi_a = jnp.where(any_ok, phis[idx], phis[-1])
            return alpha, phi_a, any_ok

        alphaS, phiS, anyS = line_search(dZS, dgsS, dlamS, dphiS)
        alphaA, phiA, anyA = line_search(dZA, dgsA, dlamA, dphiA)
        alphaB, phiB, anyB = line_search(dZB, dgsB, dlamB, dphiB)

        # -- primal-dual (residual) acceptance of the Newton-SOC step ------- #
        # The l1 merit is blind to dual progress and rejects pure-dual
        # Newton steps near the central path; accept the SOC step outright
        # whenever it contracts the full mu-KKT residual.
        def s_trial():
            """Residual-norm line search along the corrected Newton step."""
            aSp = jnp.minimum(max_step(gapL, dZS, hasL),
                              max_step(gapU, -dZS, hasU))
            if dg:
                aSp = jnp.minimum(aSp, jnp.minimum(
                    max_step(ggapL, dgsS, ghasL),
                    max_step(ggapU, -dgsS, ghasU)))
            dzLS = jnp.where(hasL, mu / gapL - s.zL - SigL * dZS, 0.0)
            dzUS = jnp.where(hasU, mu / gapU - s.zU + SigU * dZS, 0.0)
            aSd = jnp.minimum(max_step(s.zL, dzLS, hasL),
                              max_step(s.zU, dzUS, hasU))
            if dg:
                dgLS = jnp.where(ghasL, mu / ggapL - s.gL
                                 - (s.gL / ggapL) * dgsS, 0.0)
                dgUS = jnp.where(ghasU, mu / ggapU - s.gU
                                 + (s.gU / ggapU) * dgsS, 0.0)
                aSd = jnp.minimum(aSd, jnp.minimum(
                    max_step(s.gL, dgLS, ghasL), max_step(s.gU, dgUS, ghasU)))
            else:
                dgLS = jnp.zeros(0, f64)
                dgUS = jnp.zeros(0, f64)

            def trial(al):
                ad = jnp.minimum(al, aSd)
                _, e2 = full_kkt_error(
                    Z + al * dZS, g + al * dgsS, lam + al * dlamS,
                    s.zL + ad * dzLS, s.zU + ad * dzUS,
                    s.gL + ad * dgLS, s.gU + ad * dgUS, mu)
                return e2

            alphas = aSp * (0.5 ** jnp.arange(8, dtype=f64))
            errs2 = jax.vmap(trial)(alphas)
            errs2 = jnp.where(jnp.isfinite(errs2), errs2, jnp.inf)
            best = jnp.argmin(errs2)
            return alphas[best], errs2[best]

        aSp, errS2 = s_trial()
        _, err2_now = full_kkt_error(Z, g, lam, s.zL, s.zU, s.gL, s.gU, mu)
        newton_ok = okS & jnp.isfinite(errS2) & \
            (errS2 <= (1.0 - 0.1 * aSp) * err2_now)

        # pick the valid candidate with the lowest merit (prefer the
        # SOC-corrected Newton step on ties); fall back to B. A
        # residual-accepted Newton-SOC step always wins.
        INF = jnp.asarray(jnp.inf, f64)
        phiS_e = jnp.where(okS & anyS, phiS, INF)
        phiS_e = jnp.where(newton_ok, -INF, phiS_e)
        alphaS = jnp.where(newton_ok, aSp, alphaS)
        phiA_e = jnp.where(okA & anyA, phiA, INF)
        phiB_e = jnp.where(okB & anyB, phiB, INF)
        pick = jnp.argmin(jnp.stack([phiS_e, phiA_e, phiB_e]))
        pick = jnp.where(jnp.isinf(jnp.minimum(phiS_e,
                                               jnp.minimum(phiA_e, phiB_e))),
                         2, pick)                      # all invalid -> B
        delta_used = pick.astype(f64)

        def sel(xs):
            return jnp.stack(xs)[pick]

        dZ = sel([dZS, dZA, dZB])
        dgs = sel([dgsS, dgsA, dgsB])
        dlam = sel([dlamS, dlamA, dlamB])
        alpha = sel([alphaS, alphaA, alphaB])

        # -- bound dual steps + dual fraction-to-boundary ------------------- #
        dzL = jnp.where(hasL, mu / gapL - s.zL - SigL * dZ, 0.0)
        dzU = jnp.where(hasU, mu / gapU - s.zU + SigU * dZ, 0.0)
        if dg:
            dgL = jnp.where(ghasL, mu / ggapL - s.gL
                            - (s.gL / ggapL) * dgs, 0.0)
            dgU = jnp.where(ghasU, mu / ggapU - s.gU
                            + (s.gU / ggapU) * dgs, 0.0)
        else:
            dgL = jnp.zeros(0, f64)
            dgU = jnp.zeros(0, f64)
        alpha_d = jnp.minimum(max_step(s.zL, dzL, hasL),
                              max_step(s.zU, dzU, hasU))
        if dg:
            alpha_d = jnp.minimum(alpha_d, jnp.minimum(
                max_step(s.gL, dgL, ghasL), max_step(s.gU, dgU, ghasU)))

        # -- masked update ------------------------------------------------- #
        step = jnp.where(converged, 0.0, alpha)
        dstep = jnp.where(converged, 0.0, alpha_d)
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
            + 10.0 * okA.astype(f64) + 100.0 * okB.astype(f64)
            + 1000.0 * anyB.astype(f64),
            f_prev=f_now, stagnant=stagnant)

    return state, body


import contextlib


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
              options: IPMOptions = IPMOptions()) -> IPMState:
    """Solve the collocation NLP from (Z0, g0). Fully jittable/vmappable.

    Runs in the dtype of Z0: float32 is the TPU production path (see
    IPMOptions *_f32 knobs), float64 the CPU/verification path."""
    with _trace_ctx(Z0):
        state, body = _setup(nlp, params, Z0, g0, options)

        def cond(s: IPMState):
            return (s.it < options.max_iter) & (~s.converged)

        return jax.lax.while_loop(cond, body, state)


def solve_nlp_traced(nlp: CollocationNLP, params, Z0, g0=None,
                     options: IPMOptions = IPMOptions()):
    """Like solve_nlp but runs exactly max_iter scan steps and returns
    (state, history dict) for convergence diagnostics."""
    with _trace_ctx(Z0):
        state0, body = _setup(nlp, params, Z0, g0, options)

        def step(s, _):
            s_new = jax.lax.cond(s.converged, lambda x: x, body, s)
            return s_new, {"kkt": s_new.kkt_err, "mu": s_new.mu,
                           "alpha": s_new.alpha, "nu": s_new.nu,
                           "delta": s_new.delta_used, "f": s_new.f_prev}

        return jax.lax.scan(step, state0, None, length=options.max_iter)
