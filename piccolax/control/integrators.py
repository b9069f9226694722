"""Collocation dynamics integrators (residual builders).

TPU-native counterpart of the reference integrator dispatch layer
(reference: src/control/integrators.jl + DirectTrajOpt's
BilinearIntegrator / DerivativeIntegrator, SURVEY.md section 2.7).

Each integrator contributes rows to the stage dynamics constraint
d_k(z_k, z_{k+1}, g) = 0. The exponential (Pade) integrator step is

    x_{k+1} = expm(dt_k * G(u_k)) x_k

evaluated ENTIRELY IN REAL ARITHMETIC on the iso generator
G(u) = iso(-i H(u)) assembled from precomputed real term matrices
(systems.RealGeneratorSystem): the jitted solver must trace no complex
ops on TPU (the f64 x64 rewriter has no f64<->c128 conversions), and a
real f64 matmul costs half its emulated-c128 equivalent. Derivatives
come from JAX autodiff straight through the fixed-order Pade kernel, so
the NLP sees the exact Jacobian/Hessian of the discrete dynamics (the
reference hand-assembles these).

All residuals are affine in z_{k+1} — the structural contract of the
condensed KKT (solver/nlp.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.expm import TAYLOR_THETA, expm_fixed
from ..quantum import isomorphisms as iso

__all__ = [
    "BilinearUnitaryIntegrator",
    "BilinearKetIntegrator",
    "BilinearDensityIntegrator",
    "VariationalUnitaryIntegrator",
    "VariationalKetIntegrator",
    "DerivativeIntegrator",
    "TimeConsistencyIntegrator",
    "TimeStepsEqualIntegrator",
    "choose_squarings",
]


def choose_squarings(max_norm: float, order="taylor") -> int:
    """Static squaring count so ||A||/2^s is inside the approximant's
    accuracy radius (Taylor: ops/expm.py TAYLOR_THETA)."""
    radius = TAYLOR_THETA if order == "taylor" \
        else {3: 0.02, 5: 0.25, 7: 0.95, 9: 2.1}[order]
    if max_norm <= radius:
        return 0
    return max(0, math.ceil(math.log2(max_norm / radius)))


def _bound_dt_G_norm(system, traj) -> float:
    """Conservative bound on ||dt * H(u)|| over the feasible box."""
    H0 = np.asarray(system.get_drift())
    norm = np.linalg.norm(H0, 2) if H0.size else 0.0
    bounds = np.asarray(system.drive_bounds)
    for i, d in enumerate(system.get_drives()):
        b = max(abs(bounds[i, 0]), abs(bounds[i, 1])) if i < len(bounds) else 1.0
        if not np.isfinite(b):
            b = 1.0
        norm += b * np.linalg.norm(np.asarray(d), 2)
    dts = np.asarray(traj.get_timesteps())
    dt_max = float(np.max(dts))
    if "dt" in traj.bounds:
        dt_max = max(dt_max, float(np.max(np.asarray(traj.bounds["dt"])[:, 1])))
    return norm * dt_max


class _IntegratorBase:
    dim: int

    def residual(self, k, get, getp, g, params):
        """get/getp: callables name -> component of z_k / z_{k+1}."""
        raise NotImplementedError


class BilinearUnitaryIntegrator(_IntegratorBase):
    """Rows: U_{k+1} - expm(-i dt_k H(u_k)) U_k in operator iso-vec form.

    `state_names` may list several components sharing one propagator
    (sampling problems pass per-system states with per-system Hamiltonians
    via `system_fn`). reference: control/integrators.jl:29-52.
    """

    def __init__(self, state_name: str, drive_name: str, levels: int,
                 order="taylor", squarings: int = 2, system_fn=None,
                 time_name: str = "dt", time_dependent: bool = False,
                 t_name: str = "t"):
        self.state_name = state_name
        self.drive_name = drive_name
        self.time_name = time_name
        self.order = order
        self.squarings = squarings
        self.levels = levels
        self.dim = 2 * levels * levels
        self.time_dependent = time_dependent
        self.t_name = t_name
        # system_fn(params) -> QuantumSystem (default: params["system"])
        self.system_fn = system_fn or (lambda p: p["system"])

    def residual(self, k, get, getp, g, params):
        system = self.system_fn(params)
        u = get(self.drive_name)
        dt = get(self.time_name)[0]
        # midpoint rule for the time modulation: u is ZOH on [t_k, t_k+dt]
        # but b(t) varies continuously, and the midpoint sample makes the
        # step 2nd-order in dt against the Magnus verification rollout
        t = get(self.t_name)[0] + 0.5 * dt if self.time_dependent else 0.0
        Phi = expm_fixed(dt * system.G(u, t), self.order,
                         self.squarings)   # real [2n, 2n]
        n = self.levels
        X_k = _isovec_to_isocols(get(self.state_name), n, 0)
        X_next = _isovec_to_isocols(getp(self.state_name), n, 0)
        R = X_next - Phi @ X_k
        return jnp.swapaxes(R, 0, 1).reshape(-1)


class BilinearKetIntegrator(_IntegratorBase):
    """Same exponential step applied to one or more ket components sharing
    the propagator (MultiKet: one Phi, K states —
    reference: control/integrators.jl:96-138)."""

    def __init__(self, state_names, drive_name: str, levels: int,
                 order="taylor", squarings: int = 2, system_fn=None,
                 time_name: str = "dt", time_dependent: bool = False,
                 t_name: str = "t"):
        self.state_names = tuple(np.atleast_1d(state_names).tolist()) \
            if isinstance(state_names, (list, tuple, np.ndarray)) \
            else (state_names,)
        self.drive_name = drive_name
        self.time_name = time_name
        self.order = order
        self.squarings = squarings
        self.levels = levels
        self.dim = 2 * levels * len(self.state_names)
        self.time_dependent = time_dependent
        self.t_name = t_name
        self.system_fn = system_fn or (lambda p: p["system"])

    def residual(self, k, get, getp, g, params):
        system = self.system_fn(params)
        u = get(self.drive_name)
        dt = get(self.time_name)[0]
        t = get(self.t_name)[0] + 0.5 * dt if self.time_dependent else 0.0
        Phi = expm_fixed(dt * system.G(u, t), self.order,
                         self.squarings)   # real [2n, 2n]
        outs = []
        for nm in self.state_names:
            outs.append(getp(nm) - Phi @ get(nm))   # ket iso = [Re; Im]
        return jnp.concatenate(outs)


class BilinearDensityIntegrator(_IntegratorBase):
    """Exponential step of the compact-iso Lindblad generator:
    x_{k+1} = expm(dt * A(u)) x_k with A the n^2 x n^2 real compact
    Lindbladian (reference: control/integrators.jl:76-89)."""

    def __init__(self, state_names, drive_name: str, levels: int,
                 order="taylor", squarings: int = 2, system_fn=None,
                 time_name: str = "dt", time_dependent: bool = False,
                 t_name: str = "t"):
        self.state_names = (state_names,) if isinstance(state_names, str) \
            else tuple(state_names)
        self.drive_name = drive_name
        self.time_name = time_name
        self.order = order
        self.squarings = squarings
        self.levels = levels
        self.dim = levels * levels * len(self.state_names)
        self.time_dependent = time_dependent
        self.t_name = t_name
        self.system_fn = system_fn or (lambda p: p["system"])

    def residual(self, k, get, getp, g, params):
        system = self.system_fn(params)
        u = get(self.drive_name)
        dt = get(self.time_name)[0]
        t = get(self.t_name)[0] + 0.5 * dt if self.time_dependent else 0.0
        A = system.compact_lindbladian(u, t)
        Phi = expm_fixed(dt * A, order=self.order,
                              squarings=self.squarings)
        outs = []
        for nm in self.state_names:
            outs.append(getp(nm) - Phi @ get(nm))
        return jnp.concatenate(outs)


class VariationalUnitaryIntegrator(_IntegratorBase):
    """Stacked base+sensitivity propagation with the block-triangular
    variational generator (reference: control/integrators.jl:187-218).

    State component layout: [base iso-vec; sens_1 iso-vec; ...] of a
    VariationalQuantumSystem with n_vars directions.
    """

    def __init__(self, state_name: str, drive_name: str, levels: int,
                 n_vars: int, order="taylor", squarings: int = 2,
                 system_fn=None, time_name: str = "dt"):
        self.state_name = state_name
        self.drive_name = drive_name
        self.time_name = time_name
        self.order = order
        self.squarings = squarings
        self.levels = levels
        self.n_vars = n_vars
        self.dim = 2 * levels * levels * (n_vars + 1)
        self.system_fn = system_fn or (lambda p: p["system"])

    def residual(self, k, get, getp, g, params):
        system = self.system_fn(params)
        u = get(self.drive_name)
        dt = get(self.time_name)[0]
        Gv = system.var_G(u)                     # [(v+1) 2n, (v+1) 2n] real
        Phi = expm_fixed(dt * Gv, order=self.order,
                              squarings=self.squarings + 1)
        n = self.levels
        # state: (v+1) stacked operator iso-vecs -> stacked iso column
        # matrix [(v+1)*2n, n] matching var_G's block layout
        Xcols = jnp.concatenate(
            [_isovec_to_isocols(get(self.state_name), n, i)
             for i in range(self.n_vars + 1)], axis=0)
        Xpcols = jnp.concatenate(
            [_isovec_to_isocols(getp(self.state_name), n, i)
             for i in range(self.n_vars + 1)], axis=0)
        R = Xpcols - Phi @ Xcols
        return jnp.concatenate(
            [jnp.swapaxes(R[i * 2 * n:(i + 1) * 2 * n], 0, 1).reshape(-1)
             for i in range(self.n_vars + 1)])


def _isovec_to_isocols(x, n, block):
    """Block `block`'s operator iso-vec -> real iso column matrix [2n, n]."""
    seg = x[block * 2 * n * n:(block + 1) * 2 * n * n]
    blocks = seg.reshape(n, 2 * n)              # per column [Re; Im]
    return jnp.swapaxes(blocks, 0, 1)           # [2n, n] columns


class VariationalKetIntegrator(_IntegratorBase):
    """Variational ket propagation (reference: control/integrators.jl:187)."""

    def __init__(self, state_name: str, drive_name: str, levels: int,
                 n_vars: int, order="taylor", squarings: int = 2,
                 system_fn=None, time_name: str = "dt"):
        self.state_name = state_name
        self.drive_name = drive_name
        self.time_name = time_name
        self.order = order
        self.squarings = squarings
        self.levels = levels
        self.n_vars = n_vars
        self.dim = 2 * levels * (n_vars + 1)
        self.system_fn = system_fn or (lambda p: p["system"])

    def residual(self, k, get, getp, g, params):
        system = self.system_fn(params)
        u = get(self.drive_name)
        dt = get(self.time_name)[0]
        Gv = system.var_G(u)
        Phi = expm_fixed(dt * Gv, order=self.order,
                              squarings=self.squarings + 1)
        # state: stacked ket isos [ (v+1) * 2n ] with block structure
        # [Re psi; Im psi] per block -> reorder to match var_G's
        # kron(I, G) layout: full vector is [iso(psi_0); iso(psi_1); ...]
        x = get(self.state_name)
        xp = getp(self.state_name)
        return xp - Phi @ x


class DerivativeIntegrator(_IntegratorBase):
    """u_{k+1} - u_k - dt_k * du_k (reference: DerivativeIntegrator,
    SURVEY.md section 2.7)."""

    def __init__(self, name: str, dname: str, dim: int,
                 time_name: str = "dt"):
        self.name = name
        self.dname = dname
        self.time_name = time_name
        self.dim = dim

    def residual(self, k, get, getp, g, params):
        dt = get(self.time_name)[0]
        return getp(self.name) - get(self.name) - dt * get(self.dname)


class TimeConsistencyIntegrator(_IntegratorBase):
    """t_{k+1} - t_k - dt_k = 0: makes the accumulated-time component a
    consistent decision variable when dt is free (reference: DTO's
    TimeConsistencyConstraint, auto-applied when :t and :Δt are present —
    smooth_pulse_problem.jl:277)."""

    def __init__(self, time_name: str = "dt", t_name: str = "t"):
        self.time_name = time_name
        self.t_name = t_name
        self.dim = 1

    def residual(self, k, get, getp, g, params):
        return getp(self.t_name) - get(self.t_name) - get(self.time_name)


class TimeStepsEqualIntegrator(_IntegratorBase):
    """dt_{k+1} - dt_k = 0 (reference: TimeStepsAllEqualConstraint)."""

    def __init__(self, time_name: str = "dt"):
        self.time_name = time_name
        self.dim = 1

    def residual(self, k, get, getp, g, params):
        return getp(self.time_name) - get(self.time_name)
