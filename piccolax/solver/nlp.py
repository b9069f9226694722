"""Collocation NLP specification.

The problem class the batched IPM (`ipm.py`) solves — the structured
replacement for DirectTrajOpt's generic sparse NLP (SURVEY.md section 2.7):

    min_{Z, g}   sum_k stage_cost(k, z_k, g, params)
    s.t.         dynamics(k, z_k, z_{k+1}, g, params) = 0   k = 0..N-2
                 stage_eq(k, z_k, g, params) * eq_mask_k = 0
                 lo <= Z <= hi   (elementwise, +-inf allowed)
                 g_lo <= g <= g_hi

Z is the [N, dz] knot matrix (states as iso vectors, controls, dt), g the
[dg] global vector (free phases, slacks for terminal inequalities, ...).

STRUCTURAL CONTRACT (hard-coded into the KKT condensation):
- `dynamics` must be AFFINE in z_{k+1} (true for exponential-integrator
  collocation x_{k+1} - expm(dt G(u_k)) x_k and for derivative
  integrators); all curvature lives in (z_k, g).
- stage_cost must be separable per knot (terminal terms fold into
  k = N-1).

`params` is an arbitrary pytree (goal isos, weights, ...) threaded to all
callables, so one compiled solver instance serves batches of problems
with different data via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field

__all__ = ["CollocationNLP", "nlp_total_cost", "nlp_constraint_residuals"]


@pytree_dataclass
class CollocationNLP:
    lo: jnp.ndarray                     # [N, dz]
    hi: jnp.ndarray                     # [N, dz]
    g_lo: jnp.ndarray                   # [dg]
    g_hi: jnp.ndarray                   # [dg]
    eq_mask: jnp.ndarray                # [N, me] (1.0 active / 0.0 inactive)
    pin_mask: jnp.ndarray = None        # [N, dz] 1.0 = FIXED variable
                                        # (Ipopt fixed_variable_treatment
                                        # make_parameter: the IPM removes
                                        # these coordinates from the
                                        # optimization — values come from
                                        # params["pin_val"])
    stage_cost: object = static_field(default=None)   # (k, z, g, params) -> scalar
    dynamics: object = static_field(default=None)     # (k, z, zp, g, params) -> [md]
    stage_eq: object = static_field(default=None)     # (k, z, g, params) -> [me]
    N: int = static_field(default=0)
    dz: int = static_field(default=0)
    dg: int = static_field(default=0)
    md: int = static_field(default=0)
    me: int = static_field(default=0)
    # Optional split-argument views for fast derivatives (see build_nlp):
    # the same callables with z partitioned into (z_nl, z_lin) arguments,
    # where z_nl = z[nl_cols] are the columns that reach the matrix
    # exponential (drives, dt, t) and z_lin = z[lin_cols] the columns the
    # residuals are linear in (state isos, pulse derivatives). Separate
    # autodiff arguments let JAX propagate symbolic-zero tangents through
    # the expm kernel for lin columns — an EXACT restructuring (the split
    # is a performance hint, never an approximation). All None disables
    # the fast path.
    dynamics_split: object = static_field(default=None)   # (k, zn, zl, zp, g, p)
    stage_cost_split: object = static_field(default=None)  # (k, zn, zl, g, p)
    stage_eq_split: object = static_field(default=None)    # (k, zn, zl, g, p)
    nl_cols: tuple = static_field(default=None)
    lin_cols: tuple = static_field(default=None)

    def __init__(self, *, N, dz, dg, md, me, stage_cost, dynamics=None,
                 stage_eq=None, lo=None, hi=None, g_lo=None, g_hi=None,
                 eq_mask=None, pin_mask=None, dynamics_split=None,
                 stage_cost_split=None, stage_eq_split=None, nl_cols=None,
                 lin_cols=None):
        f64 = jnp.result_type(float)
        lo = jnp.full((N, dz), -jnp.inf, f64) if lo is None else jnp.asarray(lo, f64)
        hi = jnp.full((N, dz), jnp.inf, f64) if hi is None else jnp.asarray(hi, f64)
        g_lo = jnp.full((dg,), -jnp.inf, f64) if g_lo is None else jnp.asarray(g_lo, f64)
        g_hi = jnp.full((dg,), jnp.inf, f64) if g_hi is None else jnp.asarray(g_hi, f64)
        if eq_mask is None:
            eq_mask = jnp.ones((N, me), f64) if me else jnp.zeros((N, 0), f64)
        pin_mask = jnp.zeros((N, dz), f64) if pin_mask is None \
            else jnp.asarray(pin_mask, f64)
        if dynamics is None:
            dynamics = lambda k, z, zp, g, p: jnp.zeros(0)  # noqa: E731
            md = 0
        if stage_eq is None:
            stage_eq = lambda k, z, g, p: jnp.zeros(0)  # noqa: E731
            me = 0
            eq_mask = jnp.zeros((N, 0), f64)
        for name, val in (("lo", lo), ("hi", hi), ("g_lo", g_lo),
                          ("g_hi", g_hi), ("eq_mask", jnp.asarray(eq_mask, f64)),
                          ("pin_mask", pin_mask)):
            object.__setattr__(self, name, val)
        object.__setattr__(self, "stage_cost", stage_cost)
        object.__setattr__(self, "dynamics", dynamics)
        object.__setattr__(self, "stage_eq", stage_eq)
        object.__setattr__(self, "dynamics_split", dynamics_split)
        object.__setattr__(self, "stage_cost_split", stage_cost_split)
        object.__setattr__(self, "stage_eq_split", stage_eq_split)
        object.__setattr__(self, "nl_cols",
                           tuple(nl_cols) if nl_cols is not None else None)
        object.__setattr__(self, "lin_cols",
                           tuple(lin_cols) if lin_cols is not None else None)
        object.__setattr__(self, "N", int(N))
        object.__setattr__(self, "dz", int(dz))
        object.__setattr__(self, "dg", int(dg))
        object.__setattr__(self, "md", int(md))
        object.__setattr__(self, "me", int(me))

    @property
    def m(self) -> int:
        """Constraint rows per knot in the condensed KKT (eq + dynamics)."""
        return self.me + self.md


def nlp_total_cost(nlp: CollocationNLP, Z, g, params):
    ks = jnp.arange(nlp.N)
    costs = jax.vmap(lambda k, z: nlp.stage_cost(k, z, g, params))(ks, Z)
    return jnp.sum(costs)


def nlp_constraint_residuals(nlp: CollocationNLP, Z, g, params):
    """Stacked per-knot residuals [N, m]: [stage_eq * mask ; dynamics].

    Dynamics rows at the last knot are zero-padded (inactive).
    """
    N = nlp.N
    parts = []
    if nlp.me:
        ks = jnp.arange(N)
        e = jax.vmap(lambda k, z: nlp.stage_eq(k, z, g, params))(ks, Z)
        parts.append(e * nlp.eq_mask)
    else:
        parts.append(jnp.zeros((N, 0), Z.dtype))
    if nlp.md:
        ks = jnp.arange(N - 1)
        d = jax.vmap(lambda k, z, zp: nlp.dynamics(k, z, zp, g, params))(
            ks, Z[:-1], Z[1:])
        d = jnp.concatenate([d, jnp.zeros((1, nlp.md), Z.dtype)], axis=0)
        parts.append(d)
    else:
        parts.append(jnp.zeros((N, 0), Z.dtype))
    return jnp.concatenate(parts, axis=1)


def _np_inf_mask(x):
    return np.isfinite(np.asarray(x))
