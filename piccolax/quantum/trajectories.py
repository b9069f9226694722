"""Quantum trajectories: physics objects -> NLP-ready discrete trajectories.

TPU-native counterpart of the reference bridge layer
(reference: src/quantum/trajectories/). A quantum trajectory holds
(system, pulse, initial(s), goal(s)) plus a cached rollout computed at
construction, so `fidelity(qtraj)` is O(1) afterwards (reference:
src/quantum/CONTEXT.md:262-263). `discretize` is the
NamedTrajectory(qtraj, N) conversion (named_trajectory_conversion.jl) and
`extract_pulse` its inverse (extract_pulse.jl:37-77).

Component naming: states are real iso vectors under names "U" (operator
iso-vec), "psi"/"psi{i}" (ket iso), "rho"/"rho{i}" (compact density iso);
controls default to the pulse drive name ("u"); free timesteps are "dt".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..trajectory import Trajectory
from ..utils.pytree import pytree_dataclass, static_field
from . import dynamics as dyn
from . import isomorphisms as iso
from .operators import EmbeddedOperator
from .pulses import CubicSplinePulse, LinearSplinePulse, ZeroOrderPulse

__all__ = [
    "UnitaryTrajectory",
    "KetTrajectory",
    "MultiKetTrajectory",
    "DensityTrajectory",
    "MultiDensityTrajectory",
    "SamplingTrajectory",
    "discretize",
    "extract_pulse",
]


def _goal_leaf(goal):
    """Split a goal into (array leaf, static subspace info)."""
    if isinstance(goal, EmbeddedOperator):
        return jnp.asarray(goal.operator), goal.subspace, goal.subsystem_levels
    return jnp.asarray(goal), None, None


class _QuantumTrajectoryBase:
    """Shared accessors (reference: trajectories/trajectory_interface.jl)."""

    @property
    def drive_name(self) -> str:
        return self.pulse.drive_name

    def get_system(self):
        return self.system

    def get_pulse(self):
        return self.pulse

    def get_goal(self):
        return self.goal

    @property
    def duration(self):
        return self.pulse.duration

    def knot_times(self):
        return self.pulse.knot_times()


@pytree_dataclass
class UnitaryTrajectory(_QuantumTrajectoryBase):
    """Unitary gate synthesis trajectory (reference: unitary_trajectory.jl:23).

    The rollout (saved at `times`) is computed at construction.
    """

    system: object
    pulse: object
    goal: jnp.ndarray                 # full-space goal operator (complex)
    times: jnp.ndarray                # [T] save times
    Us: jnp.ndarray                   # [T, n, n] cached rollout
    subspace: tuple = static_field(default=None)
    subsystem_levels: tuple = static_field(default=None)
    state_name: str = static_field(default="U")

    def __init__(self, system, pulse, goal, times=None, n_substeps: int = 1,
                 method=None):
        goal_arr, subspace, sub_levels = _goal_leaf(goal)
        if times is None:
            try:
                times = pulse.knot_times()
            except TypeError:
                times = jnp.linspace(0.0, pulse.duration, 101)
        times = jnp.asarray(times)
        Us = dyn.unitary_rollout(system, pulse, times, method=method,
                                 n_substeps=n_substeps)
        object.__setattr__(self, "system", system)
        object.__setattr__(self, "pulse", pulse)
        object.__setattr__(self, "goal", goal_arr)
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "Us", Us)
        object.__setattr__(self, "subspace", subspace)
        object.__setattr__(self, "subsystem_levels", sub_levels)
        object.__setattr__(self, "state_name", "U")

    @property
    def embedded_goal(self):
        if self.subspace is None:
            return None
        return EmbeddedOperator(
            np.asarray(self.goal)[np.ix_(self.subspace, self.subspace)],
            self.subspace, self.subsystem_levels)

    def fidelity(self, phases=None, n_qubits=None):
        U_final = self.Us[-1]
        if self.subspace is not None:
            sub = np.asarray(self.subspace)
            U_sub = U_final[sub[:, None], sub[None, :]]
            U_goal_sub = self.goal[sub[:, None], sub[None, :]]
            if phases is not None:
                diag = dyn.free_phase_diagonal(
                    jnp.asarray(phases), n_qubits or len(phases),
                    U_goal_sub.shape[-1])
                U_goal_sub = diag[:, None] * U_goal_sub
            return dyn.pedersen_fidelity(U_sub, U_goal_sub)
        goal = self.goal
        if phases is not None:
            diag = dyn.free_phase_diagonal(
                jnp.asarray(phases), n_qubits or len(phases),
                goal.shape[-1])
            goal = diag[:, None] * goal
        return dyn.unitary_fidelity(U_final, goal)

    def rollout(self, pulse=None, n_substeps: int = 1,
                method=None) -> "UnitaryTrajectory":
        """Re-integrate (optionally with a new pulse) -> fresh trajectory.

        method: rollout integrator override (PiccoloOptions.
        rollout_integrator; None = auto-select by pulse type)."""
        pulse = pulse or self.pulse
        goal = self.embedded_goal if self.subspace is not None else self.goal
        try:
            times = pulse.knot_times()
        except TypeError:
            times = self.times
        return UnitaryTrajectory(self.system, pulse, goal, times=times,
                                 n_substeps=n_substeps, method=method)

    def __call__(self, t):
        """Interpolate the cached rollout at time t (piecewise-linear)."""
        idx = jnp.clip(jnp.searchsorted(self.times, t, side="right") - 1,
                       0, self.times.shape[0] - 2)
        t0, t1 = self.times[idx], self.times[idx + 1]
        s = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        return (1 - s) * self.Us[idx] + s * self.Us[idx + 1]

    def state_iso(self, times):
        """Exact rollout states at arbitrary times as iso-vecs [T, 2n^2]."""
        Us = dyn.unitary_rollout(self.system, self.pulse, jnp.asarray(times))
        return iso.operator_to_iso_vec(Us)

    def goal_iso(self):
        return iso.operator_to_iso_vec(self.goal)


@pytree_dataclass
class KetTrajectory(_QuantumTrajectoryBase):
    """Single state-transfer trajectory (reference: ket_trajectory.jl:20)."""

    system: object
    pulse: object
    initial: jnp.ndarray
    goal: jnp.ndarray
    times: jnp.ndarray
    psis: jnp.ndarray                 # [T, n]
    state_name: str = static_field(default="psi")

    def __init__(self, system, pulse, initial, goal, times=None,
                 n_substeps: int = 1, method=None):
        if times is None:
            try:
                times = pulse.knot_times()
            except TypeError:
                times = jnp.linspace(0.0, pulse.duration, 101)
        times = jnp.asarray(times)
        initial = jnp.asarray(initial)
        psis = dyn.ket_rollout(system, pulse, times, initial, method=method,
                               n_substeps=n_substeps)
        object.__setattr__(self, "system", system)
        object.__setattr__(self, "pulse", pulse)
        object.__setattr__(self, "initial", initial)
        object.__setattr__(self, "goal", jnp.asarray(goal))
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "psis", psis)
        object.__setattr__(self, "state_name", "psi")

    def fidelity(self, phases=None, subsystem_levels=None):
        """|<goal|psi(T)>|^2; with phases, the goal is rotated by
        number-operator free phases over subsystem_levels (reference:
        _make_free_phase_ket_goal, smooth_pulse_problem.jl:55-64)."""
        goal = self.goal
        if phases is not None:
            phases = jnp.asarray(phases)
            lv = tuple(subsystem_levels) if subsystem_levels is not None \
                else (goal.shape[-1],)
            ang = dyn.free_phase_angles_levels(phases, lv, goal.shape[-1])
            goal = jnp.exp(1j * ang) * goal
        return dyn.fidelity(self.psis[-1], goal)

    def rollout(self, pulse=None, n_substeps: int = 1,
                method=None) -> "KetTrajectory":
        pulse = pulse or self.pulse
        try:
            times = pulse.knot_times()
        except TypeError:
            times = self.times
        return KetTrajectory(self.system, pulse, self.initial, self.goal,
                             times=times, n_substeps=n_substeps,
                             method=method)

    def state_iso(self, times):
        psis = dyn.ket_rollout(self.system, self.pulse, jnp.asarray(times),
                               self.initial)
        return iso.ket_to_iso(psis)

    def goal_iso(self):
        return iso.ket_to_iso(self.goal)


@pytree_dataclass
class MultiKetTrajectory(_QuantumTrajectoryBase):
    """Shared-pulse multi-state transfer (reference: ensemble_trajectory.jl:23).

    The coherent fidelity F = |1/n sum_i <goal_i|psi_i>|^2.
    """

    system: object
    pulse: object
    initials: jnp.ndarray             # [K, n]
    goals: jnp.ndarray                # [K, n]
    weights: jnp.ndarray              # [K]
    times: jnp.ndarray
    psis: jnp.ndarray                 # [T, K, n]
    state_name: str = static_field(default="psi")

    def __init__(self, system, pulse, initials, goals, weights=None,
                 times=None, n_substeps: int = 1, method=None):
        initials = jnp.asarray(initials)
        goals = jnp.asarray(goals)
        K = initials.shape[0]
        if weights is None:
            weights = jnp.full(K, 1.0 / K)
        if times is None:
            try:
                times = pulse.knot_times()
            except TypeError:
                times = jnp.linspace(0.0, pulse.duration, 101)
        times = jnp.asarray(times)
        psis = dyn.ket_rollout(system, pulse, times, initials, method=method,
                               n_substeps=n_substeps)
        for k, v in (("system", system), ("pulse", pulse),
                     ("initials", initials), ("goals", goals),
                     ("weights", jnp.asarray(weights)), ("times", times),
                     ("psis", psis), ("state_name", "psi")):
            object.__setattr__(self, k, v)

    @property
    def n_states(self) -> int:
        return self.initials.shape[0]

    def state_names(self):
        return tuple(f"psi{i + 1}" for i in range(self.n_states))

    def fidelity(self, phases=None, subsystem_levels=None):
        goals = self.goals
        if phases is not None:
            dim = goals.shape[-1]
            nq = len(phases)
            diag = dyn.free_phase_diagonal(jnp.asarray(phases), nq, dim)
            goals = goals * diag[None, :]
        overlaps = jnp.sum(jnp.conj(goals) * self.psis[-1], axis=-1)
        return jnp.abs(jnp.mean(overlaps)) ** 2

    def rollout(self, pulse=None, n_substeps: int = 1, method=None):
        pulse = pulse or self.pulse
        try:
            times = pulse.knot_times()
        except TypeError:
            times = self.times
        return MultiKetTrajectory(self.system, pulse, self.initials,
                                  self.goals, self.weights, times=times,
                                  n_substeps=n_substeps, method=method)

    def state_iso(self, times):
        psis = dyn.ket_rollout(self.system, self.pulse, jnp.asarray(times),
                               self.initials)           # [T, K, n]
        return iso.ket_to_iso(psis)

    def goal_iso(self):
        return iso.ket_to_iso(self.goals)


@pytree_dataclass
class DensityTrajectory(_QuantumTrajectoryBase):
    """Open-system density-matrix trajectory
    (reference: density_trajectory.jl:20)."""

    system: object
    pulse: object
    initial: jnp.ndarray
    goal: jnp.ndarray
    times: jnp.ndarray
    rhos: jnp.ndarray                 # [T, n, n]
    n_substeps: int = static_field(default=4)
    state_name: str = static_field(default="rho")

    def __init__(self, system, pulse, initial, goal, times=None,
                 n_substeps: int = 4):
        if times is None:
            try:
                times = pulse.knot_times()
            except TypeError:
                times = jnp.linspace(0.0, pulse.duration, 101)
        times = jnp.asarray(times)
        initial = jnp.asarray(initial)
        rhos = dyn.density_rollout(system, pulse, times, initial,
                                   n_substeps=n_substeps)
        for k, v in (("system", system), ("pulse", pulse),
                     ("initial", initial), ("goal", jnp.asarray(goal)),
                     ("times", times), ("rhos", rhos),
                     ("n_substeps", n_substeps), ("state_name", "rho")):
            object.__setattr__(self, k, v)

    def fidelity(self):
        return dyn.density_fidelity(self.rhos[-1], self.goal)

    def rollout(self, pulse=None, n_substeps=None):
        pulse = pulse or self.pulse
        try:
            times = pulse.knot_times()
        except TypeError:
            times = self.times
        return DensityTrajectory(self.system, pulse, self.initial, self.goal,
                                 times=times,
                                 n_substeps=n_substeps or self.n_substeps)

    def state_iso(self, times):
        rhos = dyn.density_rollout(self.system, self.pulse,
                                   jnp.asarray(times), self.initial,
                                   n_substeps=self.n_substeps)
        return iso.density_to_compact_iso(rhos)

    def goal_iso(self):
        return iso.density_to_compact_iso(self.goal)


@pytree_dataclass
class MultiDensityTrajectory(_QuantumTrajectoryBase):
    """Multiple density transfers sharing one pulse
    (reference: multi_density_trajectory.jl:23)."""

    system: object
    pulse: object
    initials: jnp.ndarray             # [K, n, n]
    goals: jnp.ndarray                # [K, n, n]
    weights: jnp.ndarray
    times: jnp.ndarray
    rhos: jnp.ndarray                 # [T, K, n, n]
    n_substeps: int = static_field(default=4)
    state_name: str = static_field(default="rho")

    def __init__(self, system, pulse, initials, goals, weights=None,
                 times=None, n_substeps: int = 4):
        initials = jnp.asarray(initials)
        goals = jnp.asarray(goals)
        K = initials.shape[0]
        if weights is None:
            weights = jnp.full(K, 1.0 / K)
        if times is None:
            try:
                times = pulse.knot_times()
            except TypeError:
                times = jnp.linspace(0.0, pulse.duration, 101)
        times = jnp.asarray(times)
        rhos = jax.vmap(
            lambda r0: dyn.density_rollout(system, pulse, times, r0,
                                           n_substeps=n_substeps),
            out_axes=1)(initials)
        for k, v in (("system", system), ("pulse", pulse),
                     ("initials", initials), ("goals", goals),
                     ("weights", jnp.asarray(weights)), ("times", times),
                     ("rhos", rhos), ("n_substeps", n_substeps),
                     ("state_name", "rho")):
            object.__setattr__(self, k, v)

    @property
    def n_states(self) -> int:
        return self.initials.shape[0]

    def state_names(self):
        return tuple(f"rho{i + 1}" for i in range(self.n_states))

    def fidelity(self):
        F = dyn.density_fidelity(self.rhos[-1], self.goals)
        return jnp.sum(self.weights * F)

    def rollout(self, pulse=None, n_substeps=None):
        pulse = pulse or self.pulse
        try:
            times = pulse.knot_times()
        except TypeError:
            times = self.times
        return MultiDensityTrajectory(
            self.system, pulse, self.initials, self.goals, self.weights,
            times=times, n_substeps=n_substeps or self.n_substeps)

    def state_iso(self, times):
        rhos = jax.vmap(
            lambda r0: dyn.density_rollout(self.system, self.pulse,
                                           jnp.asarray(times), r0,
                                           n_substeps=self.n_substeps),
            out_axes=1)(self.initials)
        return iso.density_to_compact_iso(rhos)

    def goal_iso(self):
        return iso.density_to_compact_iso(self.goals)


@pytree_dataclass
class SamplingTrajectory(_QuantumTrajectoryBase):
    """Robustness wrapper: one base trajectory + an ensemble of perturbed
    systems sharing the same controls
    (reference: sampling_trajectory.jl:35-64).

    `systems` must share the pytree structure of the base system (build
    them by perturbing leaves of one system, e.g. with tree_map), so the
    ensemble stacks into a single batched system for vmap.
    """

    base: object
    systems: tuple
    weights: jnp.ndarray

    def __init__(self, base, systems, weights=None):
        systems = tuple(systems)
        if weights is None:
            weights = jnp.full(len(systems), 1.0 / len(systems))
        object.__setattr__(self, "base", base)
        object.__setattr__(self, "systems", systems)
        object.__setattr__(self, "weights", jnp.asarray(weights))

    @property
    def system(self):
        return self.base.system

    @property
    def pulse(self):
        return self.base.pulse

    @property
    def goal(self):
        return self.base.goal

    @property
    def n_systems(self) -> int:
        return len(self.systems)

    def get_weights(self):
        return self.weights

    def stacked_systems(self):
        """Stack ensemble systems into one batched system pytree."""
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *self.systems)

    def fidelity(self):
        """Weighted mean fidelity of the base pulse across the ensemble."""
        vals = []
        for sys_i in self.systems:
            qt = self.base.replace(system=sys_i).rollout()
            vals.append(qt.fidelity())
        return jnp.sum(self.weights * jnp.stack(vals))

    def rollout(self, pulse=None, n_substeps: int = 1, method=None):
        return SamplingTrajectory(
            self.base.rollout(pulse, n_substeps, method=method),
            self.systems, self.weights)


# --------------------------------------------------------------------------- #
# Discretization: quantum trajectory -> knot Trajectory
# (reference: named_trajectory_conversion.jl:289-351)
# --------------------------------------------------------------------------- #


def _control_knot_data(pulse, times):
    """Sample pulse (and derivative DOFs for cubic) at knot times."""
    us = pulse.sample(times)
    if isinstance(pulse, CubicSplinePulse):
        dus = jax.vmap(pulse.derivative)(jnp.asarray(times))
        return us, dus
    return us, None


def _boundary_or_none(value):
    """NaN sentinel = free; returns None if all components free."""
    v = np.asarray(value)
    if np.all(np.isnan(v)):
        return None
    return np.nan_to_num(v)


def _unitary_geodesic(U_goal, s):
    """Geodesic I -> U_goal on U(n): U(s_k) = expm(s_k * log U_goal).

    Host-side f64 (initialization only)."""
    import scipy.linalg
    H = scipy.linalg.logm(np.asarray(U_goal, dtype=complex))
    return np.stack([scipy.linalg.expm(sk * H) for sk in np.asarray(s)])


def _ket_geodesic(psi0, g, s):
    """Great-circle (slerp) interpolation psi0 -> goal, phase-aligned so
    <psi0|goal> is real nonnegative along the path."""
    psi0 = np.asarray(psi0, dtype=complex)
    g = np.asarray(g, dtype=complex)
    ov = np.vdot(psi0, g)
    if abs(ov) > 1e-12:
        g = g * (np.conj(ov) / abs(ov))
    theta = np.arccos(np.clip(abs(ov), 0.0, 1.0))
    if theta < 1e-9:
        return np.stack([psi0] * len(s))
    sin_t = np.sin(theta)
    return np.stack([(np.sin((1.0 - sk) * theta) * psi0
                      + np.sin(sk * theta) * g) / sin_t
                     for sk in np.asarray(s)])


def _geodesic_state_iso(qtraj, times):
    """Geodesic initial state guess as iso-vector knot data, or None for
    trajectory types without a geodesic init (density operators fall back
    to the rollout, as the reference does).

    reference: PiccoloOptions.geodesic (options.jl:70) — the reference
    delegates the actual geodesic to its NamedTrajectories initialization;
    here it is built directly at discretization.
    """
    times = np.asarray(times)
    span = max(float(times[-1] - times[0]), 1e-30)
    s = (times - times[0]) / span
    if isinstance(qtraj, UnitaryTrajectory):
        U_goal = np.asarray(qtraj.goal, dtype=complex)
        if qtraj.subspace is not None:
            # embedded goal: zeros on the leakage complement make the
            # full-space operator singular — geodesic on the subspace
            # block, identity on the complement (a valid unitary path)
            comp = np.setdiff1d(np.arange(U_goal.shape[0]),
                                np.asarray(qtraj.subspace))
            U_goal = U_goal.copy()
            U_goal[comp, comp] = 1.0
        Us = _unitary_geodesic(U_goal, s)
        return np.stack([np.asarray(iso.operator_to_iso_vec(U)) for U in Us])
    if isinstance(qtraj, KetTrajectory):
        psis = _ket_geodesic(qtraj.initial, qtraj.goal, s)
        return np.stack([np.asarray(iso.ket_to_iso(p)) for p in psis])
    if isinstance(qtraj, MultiKetTrajectory):
        cols = []
        for i in range(qtraj.n_states):
            psis = _ket_geodesic(np.asarray(qtraj.initials)[i],
                                 np.asarray(qtraj.goals)[i], s)
            cols.append(np.stack([np.asarray(iso.ket_to_iso(p))
                                  for p in psis]))
        return np.stack(cols, axis=1)                      # [N, K, d]
    return None


def discretize(qtraj, N_or_times=None, *, dt_bounds=None, state_bound=1.0,
               drive_name=None, geodesic: bool = False):
    """Convert a quantum trajectory into a knot `Trajectory`.

    The state data is sampled from the construction-time rollout, so the
    initial NLP guess is the physics of the initial pulse (reference:
    named_trajectory_conversion.jl:306-307). With geodesic=True the state
    knots are instead initialized on the geodesic from the initial state
    to the goal (reference: PiccoloOptions.geodesic, options.jl:70) —
    the better init when the seed pulse's rollout ends far from the goal.
    """
    if isinstance(qtraj, SamplingTrajectory):
        base_traj = discretize(qtraj.base, N_or_times, dt_bounds=dt_bounds,
                               state_bound=state_bound, drive_name=drive_name,
                               geodesic=geodesic)
        return _replicate_for_sampling(qtraj, base_traj)

    pulse = qtraj.pulse
    duration = float(np.asarray(pulse.duration))
    if N_or_times is None:
        times = np.asarray(pulse.knot_times())
    elif np.isscalar(N_or_times):
        times = np.linspace(0.0, duration, int(N_or_times))
    else:
        times = np.asarray(N_or_times)
    N = len(times)
    dts = np.diff(times)
    dts = np.append(dts, dts[-1])

    dname = drive_name or pulse.drive_name
    us, dus = _control_knot_data(pulse, times)

    data = {}
    bounds = {}
    initial = {}
    final = {}
    goal = {}

    # states
    # +-1 box on state iso components by default (reference:
    # named_trajectory_conversion.jl:331-332). Besides parity, the box is
    # load-bearing for globalization: the infidelity objective is unbounded
    # below for unnormalized states, and the barrier on the box is what
    # keeps the solver's merit bounded. Components that sit exactly on the
    # bound at the solution (e.g. X-gate entries) stay strictly interior
    # through the solver's bound_relax. Pass state_bound=None to disable.
    siso = qtraj.state_iso(times)
    if geodesic:
        gs = _geodesic_state_iso(qtraj, times)
        if gs is not None:
            siso = jnp.asarray(gs)
    if isinstance(qtraj, (MultiKetTrajectory, MultiDensityTrajectory)):
        giso = qtraj.goal_iso()
        for i, sname in enumerate(qtraj.state_names()):
            data[sname] = siso[:, i]
            if state_bound is not None:
                bounds[sname] = state_bound
            initial[sname] = siso[0, i]
            goal[sname] = giso[i]
    else:
        sname = qtraj.state_name
        # Variational systems stack [base; sens_1; ...; sens_v] into ONE
        # state component (reference: integrators.jl:187-218); sensitivity
        # blocks start at zero (d/d_eps of the initial state is 0) and are
        # left unbounded (they are not unit-norm objects).
        n_vars = int(getattr(qtraj.system, "n_vars", 0) or 0)
        siso = np.asarray(siso)
        if n_vars:
            d0 = siso.shape[1]
            siso = np.concatenate(
                [siso, np.zeros((N, n_vars * d0))], axis=1)
        data[sname] = siso
        if state_bound is not None:
            if n_vars:
                b = np.empty((siso.shape[1], 2))
                b[:, 0], b[:, 1] = -np.inf, np.inf
                b[:d0, 0] = -float(state_bound)
                b[:d0, 1] = float(state_bound)
                bounds[sname] = b
            else:
                bounds[sname] = state_bound
        initial[sname] = siso[0]
        goal[sname] = qtraj.goal_iso()

    # controls
    data[dname] = us
    sys_bounds = np.asarray(qtraj.system.drive_bounds)
    bounds[dname] = sys_bounds
    iv = _boundary_or_none(pulse.initial_value) \
        if hasattr(pulse, "initial_value") else None
    fv = _boundary_or_none(pulse.final_value) \
        if hasattr(pulse, "final_value") else None
    if iv is not None:
        initial[dname] = iv
    if fv is not None:
        final[dname] = fv

    controls = (dname,)
    if dus is not None:
        data["d" + dname] = dus
        controls = controls + ("d" + dname,)

    # timesteps: free (decision variable with bounds) or frozen constant.
    # The accumulated time "t" is always stored (reference:
    # named_trajectory_conversion.jl always stores :t); it becomes a
    # decision variable tied to dt by a TimeConsistencyIntegrator only
    # when BOTH dt is free AND the system is time-dependent — otherwise
    # it is frozen data (nothing reads t for autonomous systems).
    data["dt"] = dts[:, None]
    data["t"] = times[:, None]
    frozen = ()
    time_dep = bool(getattr(qtraj.system, "time_dependent", False))
    if dt_bounds is not None:
        bounds["dt"] = np.array([[float(dt_bounds[0]), float(dt_bounds[1])]])
        controls = controls + ("dt",)
        if time_dep:
            initial["t"] = np.array([times[0]])
        else:
            frozen = ("t",)
    else:
        frozen = ("dt", "t")

    # globals from system
    global_data = dict(qtraj.system.global_params) \
        if getattr(qtraj.system, "global_params", None) else {}

    return Trajectory(data, controls=controls, timestep="dt",
                      bounds=bounds, initial=initial, final=final, goal=goal,
                      global_data=global_data, frozen=frozen)


def _replicate_for_sampling(qtraj: SamplingTrajectory, base_traj: Trajectory):
    """Replicate the state component per ensemble system: U -> U1..UK
    (reference: sampling_trajectory.jl:143,202)."""
    sname = qtraj.base.state_name
    data = dict(base_traj.data)
    bounds = dict(base_traj.bounds)
    initial = dict(base_traj.initial)
    final = dict(base_traj.final)
    goal = dict(base_traj.goal)
    sdata = data.pop(sname)
    sbound = bounds.pop(sname, None)
    sinit = initial.pop(sname, None)
    sgoal = goal.pop(sname, None)
    for i in range(qtraj.n_systems):
        nm = f"{sname}{i + 1}"
        data[nm] = sdata
        if sbound is not None:
            bounds[nm] = sbound
        if sinit is not None:
            initial[nm] = sinit
        if sgoal is not None:
            goal[nm] = sgoal
    return Trajectory(data, controls=base_traj.controls,
                      timestep=base_traj.timestep, bounds=bounds,
                      initial=initial, final=final, goal=goal,
                      global_data=base_traj.global_data,
                      global_bounds=base_traj.global_bounds,
                      frozen=base_traj.frozen)


# --------------------------------------------------------------------------- #
# Pulse extraction (reference: extract_pulse.jl:37-77)
# --------------------------------------------------------------------------- #


def extract_pulse(qtraj, traj: Trajectory):
    """Rebuild a pulse of the original parameterization from an optimized
    knot trajectory."""
    if isinstance(qtraj, SamplingTrajectory):
        return extract_pulse(qtraj.base, traj)
    pulse = qtraj.pulse
    dname = pulse.drive_name
    times = traj.get_times()
    us = traj[dname]
    iv = pulse.initial_value if hasattr(pulse, "initial_value") else None
    fv = pulse.final_value if hasattr(pulse, "final_value") else None
    if isinstance(pulse, CubicSplinePulse):
        dus = traj["d" + dname]
        return CubicSplinePulse(us, dus, times, drive_name=dname,
                                initial_value=iv, final_value=fv)
    if isinstance(pulse, LinearSplinePulse):
        return LinearSplinePulse(us, times, drive_name=dname,
                                 initial_value=iv, final_value=fv)
    return ZeroOrderPulse(us, times, drive_name=dname,
                          initial_value=iv, final_value=fv)
