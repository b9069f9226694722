"""Nonlinear constraints for collocation problems.

TPU-native counterpart of the reference quantum constraints
(reference: src/control/constraints.jl). All inequalities are converted
to equalities + bound-boxed slack variables (knot components or globals),
which the interior-point solver handles natively through its log barrier
— the structured replacement for Ipopt's general inequality handling.

Protocol: a constraint may extend the trajectory with slack components /
globals in `setup(traj)` and contributes masked stage-equality row groups
via `eq_rows(N, dims)`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..quantum import dynamics as dyn
from ..quantum import isomorphisms as iso

__all__ = [
    "EqRowGroup",
    "FinalUnitaryFidelityConstraint",
    "FinalUnitaryFreePhaseFidelityConstraint",
    "FinalKetFidelityConstraint",
    "FinalCoherentKetFidelityConstraint",
    "FinalDensityFidelityConstraint",
    "LeakageConstraint",
    "L1SlackConstraint",
    "BoundStateL2Constraint",
    "ComplexModulusConstraint",
    "GlobalPinConstraint",
    "iso_entry_pairs",
]


class EqRowGroup:
    """One group of stage-equality rows: dim, activity mask [N, dim], and
    fn(k, get, gview, g, params) -> [dim]."""

    def __init__(self, dim, mask, fn):
        self.dim = dim
        self.mask = mask
        self.fn = fn


class _ConstraintBase:
    def setup(self, traj):
        return traj

    def eq_rows(self, N: int):
        return []


class FinalUnitaryFidelityConstraint(_ConstraintBase):
    """F(U_{N-1}) >= min_fidelity via global slack s in [0, inf):
    F - F_min - s = 0 (reference: constraints.jl:191)."""

    def __init__(self, state_name: str, min_fidelity: float, subspace=None,
                 slack_name: str | None = None):
        self.state_name = state_name
        self.min_fidelity = float(min_fidelity)
        self.subspace = None if subspace is None else np.asarray(subspace)
        self.slack_name = slack_name or f"_fid_slack_{state_name}"

    def _F(self, x, params):
        goal = params["goal"][self.state_name]    # operator iso-vec
        if self.subspace is not None:
            n = int(round(np.sqrt(x.shape[-1] // 2)))
            idx = iso.operator_subspace_iso_indices(n, self.subspace)
            return dyn.pedersen_fidelity_iso(x[idx], goal[idx])
        return dyn.unitary_fidelity_iso(x, goal)

    def setup(self, traj):
        gd = dict(traj.global_data)
        gb = dict(traj.global_bounds)
        gd[self.slack_name] = jnp.asarray([0.01])
        gb[self.slack_name] = jnp.asarray([[0.0, np.inf]])
        return traj.replace(global_data=gd, global_bounds=gb)

    def eq_rows(self, N: int):
        mask = np.zeros((N, 1))
        mask[N - 1] = 1.0

        def fn(k, get, gview, g, params):
            s = gview(self.slack_name)[0]
            return jnp.array([self._F(get(self.state_name), params)
                              - self.min_fidelity - s])

        return [EqRowGroup(1, mask, fn)]


class FinalUnitaryFreePhaseFidelityConstraint(FinalUnitaryFidelityConstraint):
    """F(U_{N-1}, Z(theta) goal) >= min_fidelity with theta read from the
    trajectory globals (reference: constraints.jl:208)."""

    def __init__(self, state_name: str, min_fidelity: float, phase_name: str,
                 n_qubits: int, subspace=None, slack_name=None):
        super().__init__(state_name, min_fidelity, subspace, slack_name)
        self.phase_name = phase_name
        self.n_qubits = n_qubits

    def eq_rows(self, N: int):
        mask = np.zeros((N, 1))
        mask[N - 1] = 1.0

        def fn(k, get, gview, g, params):
            x = get(self.state_name)
            goal = params["goal"][self.state_name]
            phases = gview(self.phase_name)
            if self.subspace is not None:
                n = int(round(np.sqrt(x.shape[-1] // 2)))
                idx = iso.operator_subspace_iso_indices(n, self.subspace)
                x, goal = x[idx], goal[idx]
            m = int(round(np.sqrt(x.shape[-1] // 2)))
            ang = dyn.free_phase_angles(phases, self.n_qubits, m)
            goal = iso.apply_row_phase_iso(goal, jnp.cos(ang), jnp.sin(ang))
            if self.subspace is not None:
                F = dyn.pedersen_fidelity_iso(x, goal)
            else:
                F = dyn.unitary_fidelity_iso(x, goal)
            s = gview(self.slack_name)[0]
            return jnp.array([F - self.min_fidelity - s])

        return [EqRowGroup(1, mask, fn)]


class FinalKetFidelityConstraint(FinalUnitaryFidelityConstraint):
    """|<psi|goal>|^2 >= min_fidelity (reference: constraints.jl:24)."""

    def _F(self, x, params):
        return dyn.fidelity_iso(x, params["goal"][self.state_name])


class FinalCoherentKetFidelityConstraint(_ConstraintBase):
    """Coherent multi-ket fidelity >= min_fidelity
    (reference: constraints.jl:107)."""

    def __init__(self, state_names, min_fidelity: float,
                 slack_name: str = "_fid_slack_coherent"):
        self.state_names = tuple(state_names)
        self.min_fidelity = float(min_fidelity)
        self.slack_name = slack_name

    def setup(self, traj):
        gd = dict(traj.global_data)
        gb = dict(traj.global_bounds)
        gd[self.slack_name] = jnp.asarray([0.01])
        gb[self.slack_name] = jnp.asarray([[0.0, np.inf]])
        return traj.replace(global_data=gd, global_bounds=gb)

    def eq_rows(self, N: int):
        mask = np.zeros((N, 1))
        mask[N - 1] = 1.0

        def fn(k, get, gview, g, params):
            re = im = 0.0
            for nm in self.state_names:
                r, i = iso.iso_inner(params["goal"][nm], get(nm))
                re, im = re + r, im + i
            F = (re ** 2 + im ** 2) / len(self.state_names) ** 2
            return jnp.array([F - self.min_fidelity
                              - gview(self.slack_name)[0]])

        return [EqRowGroup(1, mask, fn)]


class FinalDensityFidelityConstraint(FinalUnitaryFidelityConstraint):
    """tr(rho rho_goal) >= min_fidelity (reference: constraints.jl:265)."""

    def _F(self, x, params):
        return dyn.density_fidelity_iso(x, params["goal"][self.state_name])


class LeakageConstraint(_ConstraintBase):
    """Per-knot leakage population <= value, via a per-knot slack component:
    value - sum(x_leak^2) - s_k = 0, s_k >= 0 (reference: constraints.jl:298).
    """

    def __init__(self, state_name: str, indices, value: float,
                 slack_name: str | None = None, times=None):
        self.state_name = state_name
        self.indices = np.asarray(indices)
        self.value = float(value)
        self.slack_name = slack_name or f"_leak_slack_{state_name}"
        self.times = times          # knot indices where active (default all)

    def setup(self, traj):
        x = traj[self.state_name]
        pop = jnp.sum(x[:, self.indices] ** 2, axis=1, keepdims=True)
        s0 = jnp.clip(self.value - pop, 1e-4, None)
        return traj.add_component(self.slack_name, s0,
                                  bound=np.array([[0.0, np.inf]]))

    def eq_rows(self, N: int):
        mask = np.ones((N, 1))
        if self.times is not None:
            mask = np.zeros((N, 1))
            mask[np.asarray(self.times)] = 1.0

        def fn(k, get, gview, g, params):
            pop = jnp.sum(get(self.state_name)[self.indices] ** 2)
            return jnp.array([self.value - pop - get(self.slack_name)[0]])

        return [EqRowGroup(1, mask, fn)]


class L1SlackConstraint(_ConstraintBase):
    """Exact L1 reformulation v = s+ - s-, s± >= 0 (with R * sum(s+ + s-)
    penalized by the template's objective) — promotes bang-bang pulses
    (reference: bang_bang_pulse_problem.jl:3-70 via DTO L1SlackConstraint).
    """

    def __init__(self, name: str, dim: int):
        self.name = name
        self.dim = dim
        self.pos_name = f"_s_pos_{name}"
        self.neg_name = f"_s_neg_{name}"

    def setup(self, traj):
        v = traj[self.name]
        pos = jnp.clip(v, 0.0, None) + 1e-4
        neg = jnp.clip(-v, 0.0, None) + 1e-4
        bound = np.stack([np.zeros(self.dim), np.full(self.dim, np.inf)], -1)
        traj = traj.add_component(self.pos_name, pos, bound=bound)
        traj = traj.add_component(self.neg_name, neg, bound=bound)
        return traj

    def eq_rows(self, N: int):
        mask = np.ones((N, self.dim))

        def fn(k, get, gview, g, params):
            return (get(self.name) - get(self.pos_name)
                    + get(self.neg_name))

        return [EqRowGroup(self.dim, mask, fn)]


class GlobalPinConstraint(_ConstraintBase):
    """Pin a global variable to a calibration target via an equality row
    at k=0 (reference: apply_calibration_targets! /
    DTO fix_global_variable!, _problem_templates.jl:393)."""

    def __init__(self, name: str, value):
        self.name = name
        self.value = np.atleast_1d(np.asarray(value, dtype=float))

    def eq_rows(self, N: int):
        d = self.value.shape[0]
        mask = np.zeros((N, d))
        mask[0] = 1.0
        target = jnp.asarray(self.value)

        def fn(k, get, gview, g, params):
            return gview(self.name) - target

        return [EqRowGroup(d, mask, fn)]


def iso_entry_pairs(dim: int, n: int):
    """(re, im) index pairs of every complex entry of an iso vector with
    [ncols, (Re, Im), n] layout: ket iso (ncols=1) or operator iso-vec
    (ncols=n). `dim` is the iso vector length, `n` the Hilbert dim."""
    ncols = dim // (2 * n)
    pairs = []
    for c in range(ncols):
        base = c * 2 * n
        for r in range(n):
            pairs.append((base + r, base + n + r))
    return np.asarray(pairs)


class BoundStateL2Constraint(_ConstraintBase):
    """Per complex component Re^2 + Im^2 <= value with per-knot slacks
    (reference: constraints.jl:380). `pairs` is [(re_idx, im_idx), ...]."""

    value = 1.0

    def __init__(self, state_name: str, pairs, slack_name=None, value=1.0):
        self.state_name = state_name
        self.pairs = np.asarray(pairs)
        self.slack_name = slack_name or f"_l2_slack_{state_name}"
        self.value = float(value)

    def setup(self, traj):
        x = traj[self.state_name]
        re = x[:, self.pairs[:, 0]]
        im = x[:, self.pairs[:, 1]]
        s0 = jnp.clip(self.value - (re ** 2 + im ** 2), 1e-4, None)
        d = self.pairs.shape[0]
        bound = np.stack([np.zeros(d), np.full(d, np.inf)], -1)
        return traj.add_component(self.slack_name, s0, bound=bound)

    def eq_rows(self, N: int):
        d = self.pairs.shape[0]
        mask = np.ones((N, d))

        def fn(k, get, gview, g, params):
            x = get(self.state_name)
            re = x[self.pairs[:, 0]]
            im = x[self.pairs[:, 1]]
            return self.value - (re ** 2 + im ** 2) - get(self.slack_name)

        return [EqRowGroup(d, mask, fn)]


class ComplexModulusConstraint(BoundStateL2Constraint):
    """|u_I + i u_Q| <= r per knot for I/Q drive pairs — the reference's
    complex-control-norm constraint (reference: PiccoloOptions
    complex_control_norm_constraint, options.jl:88-121). `pairs` are
    (I, Q) column index pairs WITHIN the named control component."""

    def __init__(self, name: str, pairs, r: float, slack_name=None):
        super().__init__(name, pairs,
                         slack_name or f"_cnorm_slack_{name}",
                         value=float(r) ** 2)
