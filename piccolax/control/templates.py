"""Problem templates: the user-facing entry points.

TPU-native counterparts of the reference problem templates
(reference: src/control/templates/): SmoothPulseProblem (ZOH pulses with
chained derivative variables), SplinePulseProblem (linear/cubic splines),
BangBangPulseProblem (L1 slack switching), MinimumTimeProblem (transform),
SamplingProblem (robustness transform).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..quantum.pulses import CubicSplinePulse, LinearSplinePulse, ZeroOrderPulse
from ..quantum.trajectories import (
    DensityTrajectory,
    KetTrajectory,
    MultiDensityTrajectory,
    MultiKetTrajectory,
    SamplingTrajectory,
    UnitaryTrajectory,
    discretize,
)
from . import constraints as cons
from . import integrators as intg
from . import objectives as obj
from .problem import QuantumControlProblem

__all__ = [
    "SmoothPulseProblem",
    "SplinePulseProblem",
    "BangBangPulseProblem",
    "MinimumTimeProblem",
    "SamplingProblem",
]


def _state_pieces(qtraj, drive_name, pade_order, squarings, Q,
                  system_fn=None, suffix_states=None):
    """(integrators, objectives) for the state dynamics of a qtraj type."""
    levels = qtraj.system.levels
    if isinstance(qtraj, UnitaryTrajectory):
        return (
            [intg.BilinearUnitaryIntegrator(
                suffix_states or "U", drive_name, levels,
                order=pade_order, squarings=squarings, system_fn=system_fn)],
            [obj.UnitaryInfidelityObjective(
                suffix_states or "U", Q=Q, subspace=qtraj.subspace)],
        )
    if isinstance(qtraj, KetTrajectory):
        return (
            [intg.BilinearKetIntegrator(
                (suffix_states or "psi",), drive_name, levels,
                order=pade_order, squarings=squarings, system_fn=system_fn)],
            [obj.KetInfidelityObjective(suffix_states or "psi", Q=Q)],
        )
    if isinstance(qtraj, MultiKetTrajectory):
        names = qtraj.state_names()
        return (
            [intg.BilinearKetIntegrator(
                names, drive_name, levels, order=pade_order,
                squarings=squarings, system_fn=system_fn)],
            [obj.CoherentKetInfidelityObjective(names, Q=Q)],
        )
    if isinstance(qtraj, DensityTrajectory):
        return (
            [intg.BilinearDensityIntegrator(
                (suffix_states or "rho",), drive_name, levels,
                order=pade_order, squarings=squarings, system_fn=system_fn)],
            [obj.DensityInfidelityObjective(suffix_states or "rho", Q=Q)],
        )
    if isinstance(qtraj, MultiDensityTrajectory):
        names = qtraj.state_names()
        w = np.asarray(qtraj.weights)
        return (
            [intg.BilinearDensityIntegrator(
                names, drive_name, levels, order=pade_order,
                squarings=squarings, system_fn=system_fn)],
            [obj.DensityInfidelityObjective(nm, Q=Q * float(w[i]))
             for i, nm in enumerate(names)],
        )
    raise TypeError(f"unsupported trajectory type {type(qtraj).__name__}")


def _sampling_pieces(qtraj: SamplingTrajectory, drive_name, pade_order,
                     squarings, Q):
    """Per-system integrators/objectives sharing controls
    (reference: sampling_problem.jl:130, integrators.jl:128)."""
    integrators = []
    objectives = []
    w = np.asarray(qtraj.weights)
    for i in range(qtraj.n_systems):
        def system_fn(p, i=i):
            return p["systems"][i]
        sub_int, sub_obj = _state_pieces(
            qtraj.base, drive_name, pade_order, squarings,
            Q * float(w[i]), system_fn=system_fn,
            suffix_states=f"{qtraj.base.state_name}{i + 1}")
        integrators.extend(sub_int)
        objectives.extend(sub_obj)
    return integrators, objectives


def _common_problem(qtraj, traj, drive_name, Q, R_u, R_du, R_ddu,
                    pade_order, derivative_order, dt_free,
                    timesteps_all_equal, extra_objectives, extra_constraints,
                    leakage_indices, leakage_cost, leakage_value):
    norm_bound = intg._bound_dt_G_norm(qtraj.system, traj)
    if norm_bound > 1.5:
        import warnings
        warnings.warn(
            f"dt * ||H|| may reach {norm_bound:.2f} (> 1.5): the collocation "
            "constraints are strongly nonlinear per knot and the solver may "
            "crawl. Increase the knot count N (smaller dt) or rescale units.",
            stacklevel=3)
    squarings = intg.choose_squarings(norm_bound, pade_order)

    if isinstance(qtraj, SamplingTrajectory):
        integrators, objectives = _sampling_pieces(
            qtraj, drive_name, pade_order, squarings, Q)
        params = {"systems": tuple(qtraj.systems)}
    else:
        integrators, objectives = _state_pieces(
            qtraj, drive_name, pade_order, squarings, Q)
        params = None

    # chained derivative integrators u -> du -> ddu
    d = traj.dims[drive_name]
    names = [drive_name]
    for o in range(derivative_order):
        names.append("d" + names[-1])
    for a, b in zip(names[:-1], names[1:]):
        integrators.append(intg.DerivativeIntegrator(a, b, d))

    if dt_free and timesteps_all_equal:
        integrators.append(intg.TimeStepsEqualIntegrator("dt"))

    Rs = [R_u, R_du, R_ddu]
    for i, nm in enumerate(names):
        if i < len(Rs) and Rs[i] is not None and Rs[i] != 0:
            objectives.append(obj.QuadraticRegularizer(nm, Rs[i]))

    constraints = list(extra_constraints)
    if leakage_indices is not None:
        snames = (qtraj.state_names()
                  if isinstance(qtraj, (MultiKetTrajectory,
                                        MultiDensityTrajectory))
                  else [qtraj.state_name])
        for nm in snames:
            if leakage_cost:
                objectives.append(obj.LeakageObjective(
                    nm, leakage_indices, Q=leakage_cost))
            if leakage_value is not None:
                constraints.append(cons.LeakageConstraint(
                    nm, leakage_indices, leakage_value))

    objectives.extend(extra_objectives)
    return QuantumControlProblem(qtraj, traj, objectives, integrators,
                                 constraints, params=params)


def SmoothPulseProblem(qtraj, N=None, *, Q: float = 100.0, R: float = 1e-2,
                       R_u=None, R_du=None, R_ddu=None,
                       du_bound: float = 1.0, ddu_bound: float = 1.0,
                       dt_bounds=None, timesteps_all_equal: bool = True,
                       zero_initial_and_final_derivative: bool = False,
                       state_bound=1.0, pade_order: int = 7,
                       leakage_indices=None, leakage_cost: float = 0.0,
                       leakage_value=None,
                       extra_objectives=(), extra_constraints=()):
    """Canonical ZOH-pulse collocation problem with smoothness via chained
    derivative variables du, ddu (reference: smooth_pulse_problem.jl:120-298).
    """
    traj = discretize(qtraj, N, dt_bounds=dt_bounds, state_bound=state_bound)
    dname = qtraj.drive_name
    traj = traj.add_control_derivatives(
        2, name=dname, bounds=[du_bound, ddu_bound],
        zero_initial=zero_initial_and_final_derivative,
        zero_final=zero_initial_and_final_derivative)
    R_u = R if R_u is None else R_u
    R_du = R if R_du is None else R_du
    R_ddu = R if R_ddu is None else R_ddu
    return _common_problem(
        qtraj, traj, dname, Q, R_u, R_du, R_ddu, pade_order, 2,
        dt_bounds is not None, timesteps_all_equal,
        list(extra_objectives), list(extra_constraints),
        leakage_indices, leakage_cost, leakage_value)


def SplinePulseProblem(qtraj, N=None, *, Q: float = 100.0, R: float = 1e-2,
                       R_u=None, R_du=None, du_bound: float = 1.0,
                       dt_bounds=None, timesteps_all_equal: bool = True,
                       state_bound=1.0, pade_order: int = 7,
                       leakage_indices=None, leakage_cost: float = 0.0,
                       leakage_value=None,
                       extra_objectives=(), extra_constraints=()):
    """Spline-pulse problem (reference: spline_pulse_problem.jl:128).

    Linear splines: du is slope, constrained by a DerivativeIntegrator.
    Cubic splines: du is the free Hermite tangent DOF (no derivative
    constraint; regularization defaults to 0 — reference :9-127).
    """
    pulse = qtraj.pulse
    traj = discretize(qtraj, N, dt_bounds=dt_bounds, state_bound=state_bound)
    dname = qtraj.drive_name
    is_cubic = isinstance(pulse, CubicSplinePulse)
    if not is_cubic:
        traj = traj.add_control_derivatives(1, name=dname, bounds=[du_bound])
    else:
        traj = traj.update_bound("d" + dname, du_bound)

    R_u = R if R_u is None else R_u
    if R_du is None:
        R_du = 0.0 if is_cubic else R

    squarings = intg.choose_squarings(
        intg._bound_dt_G_norm(qtraj.system, traj), pade_order)
    if isinstance(qtraj, SamplingTrajectory):
        integrators, objectives = _sampling_pieces(
            qtraj, dname, pade_order, squarings, Q)
        params = {"systems": tuple(qtraj.systems)}
    else:
        integrators, objectives = _state_pieces(
            qtraj, dname, pade_order, squarings, Q)
        params = None
    d = traj.dims[dname]
    if not is_cubic:
        integrators.append(intg.DerivativeIntegrator(dname, "d" + dname, d))
    if dt_bounds is not None and timesteps_all_equal:
        integrators.append(intg.TimeStepsEqualIntegrator("dt"))
    if R_u:
        objectives.append(obj.QuadraticRegularizer(dname, R_u))
    if R_du:
        objectives.append(obj.QuadraticRegularizer("d" + dname, R_du))
    constraints = list(extra_constraints)
    if leakage_indices is not None:
        if leakage_cost:
            objectives.append(obj.LeakageObjective(
                qtraj.state_name, leakage_indices, Q=leakage_cost))
        if leakage_value is not None:
            constraints.append(cons.LeakageConstraint(
                qtraj.state_name, leakage_indices, leakage_value))
    objectives.extend(extra_objectives)
    return QuantumControlProblem(qtraj, traj, objectives, integrators,
                                 constraints, params=params)


def BangBangPulseProblem(qtraj, N=None, *, Q: float = 100.0,
                         R: float = 1e-2, R_bang: float = 1.0,
                         du_bound: float = 1.0, dt_bounds=None,
                         state_bound=1.0, pade_order: int = 7,
                         extra_objectives=(), extra_constraints=()):
    """L1 penalty on du via exact slack reformulation to promote few-switch
    bang-bang pulses (reference: bang_bang_pulse_problem.jl:147-424)."""
    traj = discretize(qtraj, N, dt_bounds=dt_bounds, state_bound=state_bound)
    dname = qtraj.drive_name
    traj = traj.add_control_derivatives(1, name=dname, bounds=[du_bound])
    d = traj.dims[dname]
    l1 = cons.L1SlackConstraint("d" + dname, d)

    class _SlackCost(obj._ObjectiveBase):
        def stage_cost(self, k, get, g, params, N):
            return R_bang * jnp.sum(get(l1.pos_name) + get(l1.neg_name))

    extra = list(extra_objectives) + [_SlackCost()]
    return _common_problem(
        qtraj, traj, dname, Q, R, None, None, pade_order, 1,
        dt_bounds is not None, True, extra,
        list(extra_constraints) + [l1], None, 0.0, None)


def MinimumTimeProblem(qcp: QuantumControlProblem, *,
                       final_fidelity: float = 0.99, D: float = 100.0,
                       dt_bounds=None):
    """Transform a (solved) problem into a minimum-time problem: add
    D*sum(dt) to the objective and a terminal fidelity inequality
    constraint, warm-started from the current trajectory
    (reference: minimum_time_problem.jl:84-130)."""
    qtraj = qcp.qtraj
    traj = qcp.traj
    if "dt" in traj.frozen:
        raise ValueError(
            "MinimumTimeProblem requires free timesteps: build the base "
            "problem with dt_bounds=(lo, hi)")
    if dt_bounds is not None:
        traj = traj.update_bound("dt", np.array([list(dt_bounds)]))

    from ..quantum.trajectories import (MultiKetTrajectory,
                                        UnitaryTrajectory)
    if isinstance(qtraj, UnitaryTrajectory):
        fid_con = cons.FinalUnitaryFidelityConstraint(
            "U", final_fidelity, subspace=qtraj.subspace)
    elif isinstance(qtraj, MultiKetTrajectory):
        fid_con = cons.FinalCoherentKetFidelityConstraint(
            qtraj.state_names(), final_fidelity)
    elif isinstance(qtraj, KetTrajectory):
        fid_con = cons.FinalKetFidelityConstraint("psi", final_fidelity)
    elif isinstance(qtraj, DensityTrajectory):
        fid_con = cons.FinalDensityFidelityConstraint("rho", final_fidelity)
    else:
        raise TypeError(type(qtraj).__name__)

    objectives = list(qcp.objectives) + [obj.MinimumTimeObjective(D)]
    constraints = list(qcp.constraints) + [fid_con]
    return QuantumControlProblem(qtraj, traj, objectives, qcp.integrators,
                                 constraints, params=qcp.extra_params)


def SamplingProblem(qcp: QuantumControlProblem, systems, weights=None, *,
                    Q: float = 100.0, pade_order: int = 7):
    """Transform a (solved) problem into a robustness problem over an
    ensemble of systems sharing the controls
    (reference: sampling_problem.jl:130)."""
    base_qtraj = qcp.qtraj
    straj = SamplingTrajectory(base_qtraj, systems, weights)
    from ..quantum.trajectories import discretize as _disc
    times = np.asarray(qcp.traj.get_times())
    # Rebuild knot data from the solved base trajectory (warm start):
    # replicate the state columns per system, keep controls.
    base_traj = qcp.traj
    sname = base_qtraj.state_name
    data = dict(base_traj.data)
    bounds = dict(base_traj.bounds)
    initial = dict(base_traj.initial)
    final = dict(base_traj.final)
    goal = dict(base_traj.goal)
    sdata = data.pop(sname)
    sbound = bounds.pop(sname, None)
    sinit = initial.pop(sname, None)
    sgoal = goal.pop(sname, None)
    for i in range(len(list(systems))):
        nm = f"{sname}{i + 1}"
        data[nm] = sdata
        if sbound is not None:
            bounds[nm] = sbound
        if sinit is not None:
            initial[nm] = sinit
        if sgoal is not None:
            goal[nm] = sgoal
    from ..trajectory import Trajectory
    traj = Trajectory(data, controls=base_traj.controls,
                      timestep=base_traj.timestep, bounds=bounds,
                      initial=initial, final=final, goal=goal,
                      global_data=base_traj.global_data,
                      global_bounds=base_traj.global_bounds,
                      frozen=base_traj.frozen)

    squarings = intg.choose_squarings(
        intg._bound_dt_G_norm(base_qtraj.system, traj), pade_order)
    integrators, objectives = _sampling_pieces(
        straj, base_qtraj.drive_name, pade_order, squarings, Q)
    # carry over regularizers (shared controls) from the base problem
    for o in qcp.objectives:
        if isinstance(o, obj.QuadraticRegularizer):
            objectives.append(o)
    # carry over derivative integrators (they act on shared controls)
    for it in qcp.integrators:
        if isinstance(it, (intg.DerivativeIntegrator,
                           intg.TimeStepsEqualIntegrator)):
            integrators.append(it)
    params = {"systems": tuple(straj.systems)}
    del times, _disc
    return QuantumControlProblem(straj, traj, objectives, integrators,
                                 params=params)
