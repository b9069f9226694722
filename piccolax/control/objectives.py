"""Objective terms for collocation problems.

TPU-native counterpart of the reference quantum objectives
(reference: src/control/objectives.jl). Each term contributes to the
separable stage cost sum_k term.stage_cost(k, get, g, params); terminal
terms activate at k = N-1 via a where-mask. Exact Hessians come from JAX
autodiff (the reference's hand-built low-rank HVP factors exist because
Ipopt needs explicit Hessians; autodiff + small dims subsumes them).

All fidelities are evaluated in REAL iso arithmetic: goals arrive in
params["goal"] as iso vectors (converted host-side by problem.build), so
the jitted solver traces no complex ops (required by TPU's f64 x64
rewriter; see quantum/dynamics.py iso kernels).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..quantum import dynamics as dyn
from ..quantum import isomorphisms as iso

__all__ = [
    "UnitaryInfidelityObjective",
    "UnitaryFreePhaseInfidelityObjective",
    "KetInfidelityObjective",
    "KetFreePhaseInfidelityObjective",
    "CoherentKetInfidelityObjective",
    "CoherentKetFreePhaseInfidelityObjective",
    "DensityInfidelityObjective",
    "QuadraticRegularizer",
    "MinimumTimeObjective",
    "LeakageObjective",
    "UnitarySensitivityObjective",
    "KetSensitivityObjective",
    "GlobalRegularizer",
]


class _ObjectiveBase:
    def stage_cost(self, k, get, g, params, N: int):
        raise NotImplementedError


def _terminal(k, N, val):
    return jnp.where(k == N - 1, val, 0.0)


class UnitaryInfidelityObjective(_ObjectiveBase):
    """Q * (1 - F(U_{N-1}, goal)); Pedersen subspace fidelity when the goal
    is embedded (reference: objectives.jl:323). Goal arrives as an
    operator iso-vec."""

    def __init__(self, state_name: str, Q: float = 100.0, subspace=None,
                 base_dim=None):
        self.state_name = state_name
        self.Q = Q
        self.subspace = None if subspace is None else np.asarray(subspace)
        # for variational states [base; sens_1; ...]: fidelity reads only
        # the leading base block of `base_dim` components
        self.base_dim = base_dim

    def _sub_idx(self, x):
        n = int(round(np.sqrt(x.shape[-1] // 2)))
        return iso.operator_subspace_iso_indices(n, self.subspace)

    def fidelity(self, x, params):
        if self.base_dim is not None:
            x = x[: self.base_dim]
        goal = params["goal"][self.state_name]     # iso-vec [2n^2]
        if self.subspace is not None:
            idx = self._sub_idx(x)
            return dyn.pedersen_fidelity_iso_bounded(x[idx], goal[idx], x)
        return dyn.unitary_fidelity_iso_bounded(x, goal)

    def stage_cost(self, k, get, g, params, N):
        F = self.fidelity(get(self.state_name), params)
        return _terminal(k, N, self.Q * (1.0 - F))


class UnitaryFreePhaseInfidelityObjective(UnitaryInfidelityObjective):
    """Free per-qubit Z phases theta (trajectory globals) rotate the goal
    before the fidelity (reference: objectives.jl:372)."""

    def __init__(self, state_name: str, phase_name: str, n_qubits: int,
                 Q: float = 100.0, subspace=None, gview=None):
        super().__init__(state_name, Q, subspace)
        self.phase_name = phase_name
        self.n_qubits = n_qubits
        self.gview = gview                       # g -> phases slice

    def stage_cost(self, k, get, g, params, N):
        phases = self.gview(g)
        x = get(self.state_name)
        goal = params["goal"][self.state_name]
        if self.subspace is not None:
            idx = self._sub_idx(x)
            x_sub, goal_sub = x[idx], goal[idx]
            m = int(round(np.sqrt(x_sub.shape[-1] // 2)))
            ang = dyn.free_phase_angles(phases, self.n_qubits, m)
            goal_rot = iso.apply_row_phase_iso(goal_sub, jnp.cos(ang),
                                               jnp.sin(ang))
            F = dyn.pedersen_fidelity_iso_bounded(x_sub, goal_rot, x)
        else:
            m = int(round(np.sqrt(x.shape[-1] // 2)))
            ang = dyn.free_phase_angles(phases, self.n_qubits, m)
            goal_rot = iso.apply_row_phase_iso(goal, jnp.cos(ang),
                                               jnp.sin(ang))
            F = dyn.unitary_fidelity_iso_bounded(x, goal_rot)
        return _terminal(k, N, self.Q * (1.0 - F))


class KetInfidelityObjective(_ObjectiveBase):
    """Q * (1 - |<psi|goal>|^2) (reference: objectives.jl:34)."""

    def __init__(self, state_name: str, Q: float = 100.0, base_dim=None):
        self.state_name = state_name
        self.Q = Q
        self.base_dim = base_dim          # variational: leading base block

    def stage_cost(self, k, get, g, params, N):
        x = get(self.state_name)
        if self.base_dim is not None:
            x = x[: self.base_dim]
        F = dyn.fidelity_iso_bounded(x, params["goal"][self.state_name])
        return _terminal(k, N, self.Q * (1.0 - F))


class KetFreePhaseInfidelityObjective(KetInfidelityObjective):
    """Single-ket infidelity with free number-operator phases on the goal:
    goal <- diag(exp(i sum_j s_j theta_j)) goal over subsystem_levels
    (reference: _make_free_phase_ket_goal, smooth_pulse_problem.jl:55-64;
    objectives.jl:230)."""

    def __init__(self, state_name: str, subsystem_levels, Q: float = 100.0,
                 gview=None, base_dim=None):
        super().__init__(state_name, Q, base_dim)
        self.subsystem_levels = tuple(int(v) for v in subsystem_levels)
        self.gview = gview

    def stage_cost(self, k, get, g, params, N):
        x = get(self.state_name)
        if self.base_dim is not None:
            x = x[: self.base_dim]
        goal = params["goal"][self.state_name]
        m = goal.shape[-1] // 2
        ang = dyn.free_phase_angles_levels(self.gview(g),
                                           self.subsystem_levels, m)
        goal_rot = iso.apply_row_phase_iso(goal, jnp.cos(ang), jnp.sin(ang))
        F = dyn.fidelity_iso_bounded(x, goal_rot)
        return _terminal(k, N, self.Q * (1.0 - F))


class CoherentKetInfidelityObjective(_ObjectiveBase):
    """Coherent multi-state fidelity F = |1/K sum_i <goal_i|psi_i>|^2
    (reference: objectives.jl:124-202)."""

    def __init__(self, state_names, Q: float = 100.0):
        self.state_names = tuple(state_names)
        self.Q = Q

    def _F(self, get, g, params):
        re = im = nrm2 = 0.0
        K = len(self.state_names)
        for nm in self.state_names:
            x = get(nm)
            r, i = iso.iso_inner(params["goal"][nm], x)
            re, im = re + r, im + i
            nrm2 = nrm2 + jnp.sum(x ** 2)
        # bounded coherent overlap: |sum <g_i|psi_i>|^2 / (K sum ||psi_i||^2)
        # <= 1 by Cauchy-Schwarz; equals the raw coherent fidelity on the
        # unit-norm manifold (see dynamics.fidelity_iso_bounded rationale)
        return (re ** 2 + im ** 2) / (K * jnp.maximum(nrm2, 1e-12))

    def stage_cost(self, k, get, g, params, N):
        return _terminal(k, N, self.Q * (1.0 - self._F(get, g, params)))


class CoherentKetFreePhaseInfidelityObjective(CoherentKetInfidelityObjective):
    """Coherent fidelity with free per-qubit Z phases on the goals
    (reference: objectives.jl:230,283)."""

    def __init__(self, state_names, n_qubits: int, Q: float = 100.0,
                 gview=None):
        super().__init__(state_names, Q)
        self.n_qubits = n_qubits
        self.gview = gview

    def _F(self, get, g, params):
        phases = self.gview(g)
        re = im = nrm2 = 0.0
        K = len(self.state_names)
        for nm in self.state_names:
            goal = params["goal"][nm]
            m = goal.shape[-1] // 2
            ang = dyn.free_phase_angles(phases, self.n_qubits, m)
            goal_rot = iso.apply_row_phase_iso(goal, jnp.cos(ang),
                                               jnp.sin(ang))
            x = get(nm)
            r, i = iso.iso_inner(goal_rot, x)
            re, im = re + r, im + i
            nrm2 = nrm2 + jnp.sum(x ** 2)
        return (re ** 2 + im ** 2) / (K * jnp.maximum(nrm2, 1e-12))


class DensityInfidelityObjective(_ObjectiveBase):
    """Q * (1 - tr(rho rho_goal)) on the compact density iso
    (reference: objectives.jl:418-437). Goal arrives as a compact iso."""

    def __init__(self, state_name: str, Q: float = 100.0):
        self.state_name = state_name
        self.Q = Q

    def stage_cost(self, k, get, g, params, N):
        F = dyn.density_fidelity_iso(get(self.state_name),
                                     params["goal"][self.state_name])
        return _terminal(k, N, self.Q * (1.0 - F))


class QuadraticRegularizer(_ObjectiveBase):
    """(R/2) * sum_k ||v_k||^2 (reference: DirectTrajOpt
    QuadraticRegularizer use, SURVEY.md section 2.7)."""

    def __init__(self, name: str, R):
        self.name = name
        self.R = R

    def stage_cost(self, k, get, g, params, N):
        v = get(self.name)
        R = jnp.asarray(self.R)
        return 0.5 * jnp.sum(R * v ** 2)


class GlobalRegularizer(_ObjectiveBase):
    """(R/2) ||gview(g)||^2 applied once (at k=0)."""

    def __init__(self, gview, R):
        self.gview = gview
        self.R = R

    def stage_cost(self, k, get, g, params, N):
        v = self.gview(g)
        return jnp.where(k == 0, 0.5 * jnp.sum(jnp.asarray(self.R) * v ** 2),
                         0.0)


class MinimumTimeObjective(_ObjectiveBase):
    """D * sum_k dt_k (reference: MinimumTimeObjective; SURVEY 2.7)."""

    def __init__(self, D: float = 1.0, time_name: str = "dt"):
        self.D = D
        self.time_name = time_name

    def stage_cost(self, k, get, g, params, N):
        # the final knot's dt pads the grid; sum the N-1 real intervals
        return jnp.where(k < N - 1, self.D * get(self.time_name)[0], 0.0)


class LeakageObjective(_ObjectiveBase):
    """Population outside the computational subspace summed over knots
    (reference: objectives.jl:479). `indices` are iso-vec component
    indices of leakage entries."""

    def __init__(self, state_name: str, indices, Q: float = 1.0):
        self.state_name = state_name
        self.indices = np.asarray(indices)
        self.Q = Q

    def stage_cost(self, k, get, g, params, N):
        x = get(self.state_name)
        return self.Q * jnp.sum(x[self.indices] ** 2)


class UnitarySensitivityObjective(_ObjectiveBase):
    """Norm of the terminal sensitivity blocks of a variational state
    (reference: objectives.jl:457). State layout: [base; sens_1; ...]
    stacked operator iso-vecs."""

    block = "operator"

    def __init__(self, state_name: str, levels: int, n_vars: int,
                 Q: float = 1.0):
        self.state_name = state_name
        self.levels = levels
        self.n_vars = n_vars
        self.Q = Q

    def stage_cost(self, k, get, g, params, N):
        x = get(self.state_name)
        n2 = 2 * self.levels * self.levels if self.block == "operator" \
            else 2 * self.levels
        val = 0.0
        for i in range(1, self.n_vars + 1):
            val = val + jnp.sum(x[i * n2:(i + 1) * n2] ** 2)
        return _terminal(k, N, self.Q * val)


class KetSensitivityObjective(UnitarySensitivityObjective):
    """Ket variant: sensitivity blocks are ket isos of dim 2n."""

    block = "ket"
