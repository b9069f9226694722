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
                  system_fn=None, suffix_states=None,
                  sensitivity_cost: float = 1.0):
    """(integrators, objectives) for the state dynamics of a qtraj type."""
    levels = qtraj.system.levels
    # Modulated systems sample b(t) at the interval midpoint in the
    # collocation step (reference: control/integrators.jl:34,57 —
    # TimeDependentBilinearIntegrator when modulation is present).
    tdep = bool(getattr(qtraj.system, "time_dependent", False))
    # Variational systems propagate stacked [base; sensitivities] states
    # with the block-triangular var_G generator and add a terminal
    # sensitivity-norm objective (reference: integrators.jl:187-218,
    # objectives.jl:457).
    n_vars = int(getattr(qtraj.system, "n_vars", 0) or 0)
    if n_vars and isinstance(qtraj, UnitaryTrajectory):
        return (
            [intg.VariationalUnitaryIntegrator(
                suffix_states or "U", drive_name, levels, n_vars,
                order=pade_order, squarings=squarings, system_fn=system_fn)],
            [obj.UnitaryInfidelityObjective(
                suffix_states or "U", Q=Q, subspace=qtraj.subspace,
                base_dim=2 * levels * levels),
             obj.UnitarySensitivityObjective(
                suffix_states or "U", levels, n_vars, Q=sensitivity_cost)],
        )
    if n_vars and isinstance(qtraj, KetTrajectory):
        n2 = 2 * levels
        return (
            [intg.VariationalKetIntegrator(
                suffix_states or "psi", drive_name, levels, n_vars,
                order=pade_order, squarings=squarings, system_fn=system_fn)],
            [obj.KetInfidelityObjective(
                suffix_states or "psi", Q=Q, base_dim=n2),
             obj.KetSensitivityObjective(
                suffix_states or "psi", levels, n_vars, Q=sensitivity_cost)],
        )
    if isinstance(qtraj, UnitaryTrajectory):
        return (
            [intg.BilinearUnitaryIntegrator(
                suffix_states or "U", drive_name, levels,
                order=pade_order, squarings=squarings, system_fn=system_fn,
                time_dependent=tdep)],
            [obj.UnitaryInfidelityObjective(
                suffix_states or "U", Q=Q, subspace=qtraj.subspace)],
        )
    if isinstance(qtraj, KetTrajectory):
        return (
            [intg.BilinearKetIntegrator(
                (suffix_states or "psi",), drive_name, levels,
                order=pade_order, squarings=squarings, system_fn=system_fn,
                time_dependent=tdep)],
            [obj.KetInfidelityObjective(suffix_states or "psi", Q=Q)],
        )
    if isinstance(qtraj, MultiKetTrajectory):
        names = qtraj.state_names()
        return (
            [intg.BilinearKetIntegrator(
                names, drive_name, levels, order=pade_order,
                squarings=squarings, system_fn=system_fn,
                time_dependent=tdep)],
            [obj.CoherentKetInfidelityObjective(names, Q=Q)],
        )
    if isinstance(qtraj, DensityTrajectory):
        return (
            [intg.BilinearDensityIntegrator(
                (suffix_states or "rho",), drive_name, levels,
                order=pade_order, squarings=squarings, system_fn=system_fn,
                time_dependent=tdep)],
            [obj.DensityInfidelityObjective(suffix_states or "rho", Q=Q)],
        )
    if isinstance(qtraj, MultiDensityTrajectory):
        names = qtraj.state_names()
        w = np.asarray(qtraj.weights)
        return (
            [intg.BilinearDensityIntegrator(
                names, drive_name, levels, order=pade_order,
                squarings=squarings, system_fn=system_fn,
                time_dependent=tdep)],
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


def _opt(explicit, options, field, default):
    """Three-tier resolution: explicit template kwarg > PiccoloOptions
    field > built-in default (reference: apply_piccolo_options!,
    _problem_templates.jl:135-234)."""
    if explicit is not None:
        return explicit
    if options is not None:
        return getattr(options, field)
    return default


def _options_leakage_indices(qtraj, options, leakage_indices,
                             leakage_cost, leakage_value):
    """Auto-derive leakage iso indices from an embedded goal when a
    leakage option is active but no indices were given."""
    if leakage_indices is not None:
        return leakage_indices
    if not (leakage_cost or leakage_value is not None):
        return None
    if getattr(qtraj, "subspace", None) is None:
        return None
    from ..quantum.operators import get_iso_vec_leakage_indices
    return get_iso_vec_leakage_indices(qtraj.subspace, qtraj.system.levels)


def _options_constraints(qtraj, options):
    """Extra constraints demanded by a PiccoloOptions record: the state
    L2 ball and the complex-control-norm ball."""
    if options is None:
        return []
    extra = []
    if options.bound_state_l2:
        n = qtraj.system.levels
        from ..quantum.trajectories import (DensityTrajectory,
                                            MultiDensityTrajectory,
                                            MultiKetTrajectory)
        if isinstance(qtraj, (DensityTrajectory, MultiDensityTrajectory)):
            raise ValueError("bound_state_l2 applies to ket/unitary states")
        if isinstance(qtraj, MultiKetTrajectory):
            names, dim = qtraj.state_names(), 2 * n
        elif qtraj.state_name == "psi":
            names, dim = [qtraj.state_name], 2 * n
        else:
            names, dim = [qtraj.state_name], 2 * n * n
        for nm in names:
            extra.append(cons.BoundStateL2Constraint(
                nm, cons.iso_entry_pairs(dim, n)))
    if options.complex_control_norm_constraint is not None:
        nd = qtraj.system.n_drives
        if nd % 2:
            raise ValueError(
                "complex_control_norm_constraint needs I/Q drive pairs "
                f"(even n_drives); got {nd}")
        pairs = [(2 * i, 2 * i + 1) for i in range(nd // 2)]
        extra.append(cons.ComplexModulusConstraint(
            qtraj.drive_name, pairs,
            options.complex_control_norm_constraint))
    return extra


def _maybe_display(prob, options):
    """Construction-time display tiers (reference: PiccoloOptions.display,
    options.jl:16-50): compact = one line (no NLP build), standard/
    detailed = full inspection tree. Also attaches the options' rollout
    preferences consumed by sync_trajectory."""
    if options is not None:
        if options.rollout_integrator != "auto":
            prob._rollout_method = options.rollout_integrator
        if options.rollout_n_substeps != 1:
            prob._rollout_substeps = options.rollout_n_substeps
    if options is None or options.display == "silent":
        return prob
    if options.display == "compact":
        t = prob.traj
        print(f"[piccolax] {type(prob.qtraj).__name__}: N={t.N}, "
              f"components={dict(t.dims)}, "
              f"objectives={len(prob.objectives)}, "
              f"integrators={len(prob.integrators)}, "
              f"constraints={len(prob.constraints)}")
        return prob
    from .display import show_problem
    show_problem(prob, detailed=(options.display == "detailed"))
    return prob


def _global_slice(traj, name):
    """Column slice of `name` in the global vector. Safe to bake at
    template time: constraint setup() only APPENDS globals (slacks), so
    earlier slices never shift."""
    off = 0
    for n in traj.global_names:
        d = traj.global_data[n].shape[0]
        if n == name:
            return slice(off, off + d)
        off += d
    raise KeyError(name)


def _apply_free_phase(qtraj, traj, objectives, free_phase, phase_name, Q):
    """Add free phase globals and swap the terminal infidelity objective
    for its free-phase variant (reference: setup_free_phase_globals! +
    _make_free_phase_goal, _problem_templates.jl:253,298).

    free_phase forms:
    - True: infer — per-qubit Z phases for unitary / coherent multi-ket
      goals; number-operator phases over the system's subsystem_levels
      for a single ket (reference: smooth_pulse_problem.jl:28-64).
    - int: that many per-qubit Z phases.
    - tuple/list of ints: explicit subsystem levels for number-operator
      phases (single-ket goals).
    """
    levels = None
    if isinstance(free_phase, (tuple, list)):
        levels = tuple(int(v) for v in free_phase)
        n_phase = len(levels)
    elif free_phase is True and isinstance(qtraj, KetTrajectory):
        levels = tuple(getattr(qtraj.system, "subsystem_levels", None)
                       or (qtraj.system.levels,))
        n_phase = len(levels)
    elif free_phase is True:
        if isinstance(qtraj, UnitaryTrajectory) and qtraj.subspace is not None:
            dim = len(qtraj.subspace)
        elif isinstance(qtraj, MultiKetTrajectory):
            dim = int(np.asarray(qtraj.goals).shape[-1])
        else:
            dim = qtraj.system.levels
        n_phase = max(1, int(round(np.log2(dim))))
    else:
        n_phase = int(free_phase)
    gd = dict(traj.global_data)
    gd[phase_name] = jnp.zeros(n_phase)
    traj = traj.replace(global_data=gd)
    sl = _global_slice(traj, phase_name)

    def gview(g, sl=sl):
        return g[sl]

    new_objs = []
    for o in objectives:
        if (isinstance(o, obj.UnitaryInfidelityObjective)
                and not isinstance(o, obj.UnitaryFreePhaseInfidelityObjective)):
            if levels is not None and any(v != 2 for v in levels):
                raise ValueError(
                    "subsystem-level free phases apply to ket goals; "
                    "unitary goals take per-qubit phases (free_phase=True "
                    "or an int qubit count)")
            new_objs.append(obj.UnitaryFreePhaseInfidelityObjective(
                o.state_name, phase_name, n_phase, Q=o.Q,
                subspace=qtraj.subspace
                if isinstance(qtraj, UnitaryTrajectory) else None,
                gview=gview))
        elif (isinstance(o, obj.KetInfidelityObjective)
              and not isinstance(o, (obj.KetFreePhaseInfidelityObjective,
                                     obj.CoherentKetInfidelityObjective))):
            if levels is None:
                levels = (2,) * n_phase
            new_objs.append(obj.KetFreePhaseInfidelityObjective(
                o.state_name, levels, Q=o.Q, gview=gview,
                base_dim=o.base_dim))
        elif (isinstance(o, obj.CoherentKetInfidelityObjective)
              and not isinstance(o,
                                 obj.CoherentKetFreePhaseInfidelityObjective)):
            new_objs.append(obj.CoherentKetFreePhaseInfidelityObjective(
                o.state_names, n_phase, Q=o.Q, gview=gview))
        else:
            new_objs.append(o)
    # spec: subsystem levels (ket number-operator phases) or qubit count
    spec = levels if levels is not None else n_phase
    return traj, new_objs, (phase_name, spec)


def _common_problem(qtraj, traj, drive_name, Q, R_u, R_du, R_ddu,
                    pade_order, derivative_order, dt_free,
                    timesteps_all_equal, extra_objectives, extra_constraints,
                    leakage_indices, leakage_cost, leakage_value,
                    free_phase=False, phase_name="theta",
                    global_bounds=None, calibration_targets=None,
                    sensitivity_cost: float = 1.0):
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
            qtraj, drive_name, pade_order, squarings, Q,
            sensitivity_cost=sensitivity_cost)
        params = None

    phase_info = None
    if free_phase:
        traj, objectives, phase_info = _apply_free_phase(
            qtraj, traj, objectives, free_phase, phase_name, Q)
    if global_bounds:
        for nm, b in dict(global_bounds).items():
            traj = traj.update_bound(nm, b)

    # chained derivative integrators u -> du -> ddu
    d = traj.dims[drive_name]
    names = [drive_name]
    for o in range(derivative_order):
        names.append("d" + names[-1])
    for a, b in zip(names[:-1], names[1:]):
        integrators.append(intg.DerivativeIntegrator(a, b, d))

    if dt_free and timesteps_all_equal:
        integrators.append(intg.TimeStepsEqualIntegrator("dt"))
    if dt_free and getattr(qtraj.system, "time_dependent", False):
        # "t" is a decision variable only in this case (see discretize);
        # tie it to dt (reference: smooth_pulse_problem.jl:277).
        integrators.append(intg.TimeConsistencyIntegrator("dt", "t"))

    Rs = [R_u, R_du, R_ddu]
    for i, nm in enumerate(names):
        if i < len(Rs) and Rs[i] is not None and Rs[i] != 0:
            objectives.append(obj.QuadraticRegularizer(nm, Rs[i]))

    constraints = list(extra_constraints)
    if calibration_targets:
        for nm, val in dict(calibration_targets).items():
            constraints.append(cons.GlobalPinConstraint(nm, val))
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
    prob = QuantumControlProblem(qtraj, traj, objectives, integrators,
                                 constraints, params=params)
    if phase_info is not None:
        prob._phase_global = phase_info
    return prob


def SmoothPulseProblem(qtraj, N=None, *, Q: float = 100.0, R: float = 1e-2,
                       R_u=None, R_du=None, R_ddu=None,
                       du_bound: float = 1.0, ddu_bound: float = 1.0,
                       dt_bounds=None, timesteps_all_equal=None,
                       zero_initial_and_final_derivative=None,
                       state_bound="box", pade_order="taylor",
                       leakage_indices=None, leakage_cost=None,
                       leakage_value=None,
                       free_phase=False, phase_name: str = "theta",
                       global_bounds=None, calibration_targets=None,
                       sensitivity_cost: float = 1.0,
                       geodesic=None, options=None,
                       extra_objectives=(), extra_constraints=()):
    """Canonical ZOH-pulse collocation problem with smoothness via chained
    derivative variables du, ddu (reference: smooth_pulse_problem.jl:120-298).

    free_phase: True (infer qubit count from the goal/subspace dims) or an
    int qubit count — optimize per-qubit Z phases on the goal as trajectory
    globals (reference: _problem_templates.jl:253,298).
    global_bounds: {global_name: (lo, hi)} box bounds on globals
    (reference: add_global_bounds_constraints!, :336).
    calibration_targets: {global_name: value} equality pins
    (reference: apply_calibration_targets!, :393).
    options: a PiccoloOptions record supplying the tier-2 defaults for
    the flags above (reference: options.jl:88-121); explicit kwargs win.
    """
    timesteps_all_equal = _opt(timesteps_all_equal, options,
                               "timesteps_all_equal", True)
    zero_d = _opt(zero_initial_and_final_derivative, options,
                  "zero_initial_and_final_derivative", False)
    if state_bound == "box":
        state_bound = 1.0 if options is None or options.bound_state is None \
            else options.bound_state
        if options is not None and options.bound_state_l2:
            state_bound = None          # the L2 ball replaces the box
    leakage_cost = _opt(leakage_cost, options, "leakage_cost", 0.0)
    leakage_value = _opt(leakage_value, options,
                         "leakage_constraint_value", None)
    leakage_indices = _options_leakage_indices(
        qtraj, options, leakage_indices, leakage_cost, leakage_value)
    extra_constraints = list(extra_constraints) \
        + _options_constraints(qtraj, options)

    # Geodesic init defaults OFF for free-phase problems: the geodesic
    # targets the UNPHASED goal, biasing the init against the free-phase
    # optimum (explicit geodesic= or options.geodesic still wins).
    geodesic = _opt(geodesic, options, "geodesic", not free_phase)
    traj = discretize(qtraj, N, dt_bounds=dt_bounds, state_bound=state_bound,
                      geodesic=geodesic)
    dname = qtraj.drive_name
    traj = traj.add_control_derivatives(
        2, name=dname, bounds=[du_bound, ddu_bound],
        zero_initial=zero_d, zero_final=zero_d)
    R_u = R if R_u is None else R_u
    R_du = R if R_du is None else R_du
    R_ddu = R if R_ddu is None else R_ddu
    prob = _common_problem(
        qtraj, traj, dname, Q, R_u, R_du, R_ddu, pade_order, 2,
        dt_bounds is not None, timesteps_all_equal,
        list(extra_objectives), extra_constraints,
        leakage_indices, leakage_cost, leakage_value,
        free_phase=free_phase, phase_name=phase_name,
        global_bounds=global_bounds, calibration_targets=calibration_targets,
        sensitivity_cost=sensitivity_cost)
    return _maybe_display(prob, options)


def SplinePulseProblem(qtraj, N=None, *, Q: float = 100.0, R: float = 1e-2,
                       R_u=None, R_du=None, du_bound: float = 1.0,
                       dt_bounds=None, timesteps_all_equal=None,
                       state_bound="box", pade_order="taylor",
                       leakage_indices=None, leakage_cost=None,
                       leakage_value=None,
                       free_phase=False, phase_name: str = "theta",
                       global_bounds=None, calibration_targets=None,
                       geodesic=None, options=None,
                       extra_objectives=(), extra_constraints=()):
    """Spline-pulse problem (reference: spline_pulse_problem.jl:128).

    Linear splines: du is slope, constrained by a DerivativeIntegrator.
    Cubic splines: du is the free Hermite tangent DOF (no derivative
    constraint; regularization defaults to 0 — reference :9-127).
    """
    timesteps_all_equal = _opt(timesteps_all_equal, options,
                               "timesteps_all_equal", True)
    if state_bound == "box":
        state_bound = 1.0 if options is None or options.bound_state is None \
            else options.bound_state
        if options is not None and options.bound_state_l2:
            state_bound = None
    leakage_cost = _opt(leakage_cost, options, "leakage_cost", 0.0)
    leakage_value = _opt(leakage_value, options,
                         "leakage_constraint_value", None)
    leakage_indices = _options_leakage_indices(
        qtraj, options, leakage_indices, leakage_cost, leakage_value)
    extra_constraints = tuple(extra_constraints) \
        + tuple(_options_constraints(qtraj, options))
    pulse = qtraj.pulse
    geodesic = _opt(geodesic, options, "geodesic", not free_phase)
    traj = discretize(qtraj, N, dt_bounds=dt_bounds, state_bound=state_bound,
                      geodesic=geodesic)
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
    phase_info = None
    if free_phase:
        traj, objectives, phase_info = _apply_free_phase(
            qtraj, traj, objectives, free_phase, phase_name, Q)
    if global_bounds:
        for nm, b in dict(global_bounds).items():
            traj = traj.update_bound(nm, b)
    d = traj.dims[dname]
    if not is_cubic:
        integrators.append(intg.DerivativeIntegrator(dname, "d" + dname, d))
    if dt_bounds is not None and timesteps_all_equal:
        integrators.append(intg.TimeStepsEqualIntegrator("dt"))
    if dt_bounds is not None and getattr(qtraj.system, "time_dependent",
                                         False):
        integrators.append(intg.TimeConsistencyIntegrator("dt", "t"))
    if R_u:
        objectives.append(obj.QuadraticRegularizer(dname, R_u))
    if R_du:
        objectives.append(obj.QuadraticRegularizer("d" + dname, R_du))
    constraints = list(extra_constraints)
    if calibration_targets:
        for nm, val in dict(calibration_targets).items():
            constraints.append(cons.GlobalPinConstraint(nm, val))
    if leakage_indices is not None:
        if leakage_cost:
            objectives.append(obj.LeakageObjective(
                qtraj.state_name, leakage_indices, Q=leakage_cost))
        if leakage_value is not None:
            constraints.append(cons.LeakageConstraint(
                qtraj.state_name, leakage_indices, leakage_value))
    objectives.extend(extra_objectives)
    prob = QuantumControlProblem(qtraj, traj, objectives, integrators,
                                 constraints, params=params)
    if phase_info is not None:
        prob._phase_global = phase_info
    return _maybe_display(prob, options)


def BangBangPulseProblem(qtraj, N=None, *, Q: float = 100.0,
                         R: float = 1e-2, R_bang: float = 1.0,
                         du_bound: float = 1.0, dt_bounds=None,
                         state_bound=1.0, pade_order="taylor",
                         geodesic: bool = True,
                         extra_objectives=(), extra_constraints=()):
    """L1 penalty on du via exact slack reformulation to promote few-switch
    bang-bang pulses (reference: bang_bang_pulse_problem.jl:147-424)."""
    traj = discretize(qtraj, N, dt_bounds=dt_bounds, state_bound=state_bound,
                      geodesic=geodesic)
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


def _update_goal(qtraj, new_goal):
    """Rebuild a quantum trajectory with a new goal, keeping system,
    pulse, and initial state (reference: _update_goal,
    minimum_time_problem.jl:150-162)."""
    from ..quantum.trajectories import DensityTrajectory
    if isinstance(qtraj, UnitaryTrajectory):
        return UnitaryTrajectory(qtraj.system, qtraj.pulse, new_goal,
                                 times=qtraj.times)
    if isinstance(qtraj, KetTrajectory):
        return KetTrajectory(qtraj.system, qtraj.pulse, qtraj.initial,
                             new_goal, times=qtraj.times)
    if isinstance(qtraj, DensityTrajectory):
        return DensityTrajectory(qtraj.system, qtraj.pulse, qtraj.initial,
                                 new_goal, times=qtraj.times)
    raise TypeError(
        f"goal update unsupported for {type(qtraj).__name__}")


def MinimumTimeProblem(qcp: QuantumControlProblem, *, goal=None,
                       final_fidelity: float = 0.99, D: float = 100.0,
                       dt_bounds=None):
    """Transform a (solved) problem into a minimum-time problem: add
    D*sum(dt) to the objective and a terminal fidelity inequality
    constraint, warm-started from the current trajectory
    (reference: minimum_time_problem.jl:84-130).

    goal: optionally swap the target before constraining (reference
    `goal` kwarg + `_update_goal`, minimum_time_problem.jl:86,113-118) —
    e.g. chase a nearby gate from the solved pulse."""
    qtraj = qcp.qtraj
    traj = qcp.traj
    if goal is not None:
        qtraj = _update_goal(qtraj, goal)
        gtable = dict(traj.goal or {})
        if qtraj.state_name in gtable:
            gtable[qtraj.state_name] = qtraj.goal
            traj = traj.replace(goal=gtable)
    if "dt" in traj.frozen:
        raise ValueError(
            "MinimumTimeProblem requires free timesteps: build the base "
            "problem with dt_bounds=(lo, hi)")
    if dt_bounds is not None:
        traj = traj.update_bound("dt", np.array([list(dt_bounds)]))

    from ..quantum.trajectories import (MultiKetTrajectory,
                                        UnitaryTrajectory)
    phase_info = getattr(qcp, "_phase_global", None)
    if isinstance(qtraj, SamplingTrajectory):
        # Per-sample fidelity constraints, one per sampled system
        # (reference: minimum_time_problem.jl:466 — "fidelity
        # constraints for each sample"). State names follow the
        # _sampling_pieces suffixing: U1, U2, ... / psi1, psi2, ...
        base = qtraj.base
        names = [f"{base.state_name}{i + 1}"
                 for i in range(qtraj.n_systems)]
        if isinstance(base, UnitaryTrajectory):
            fid_cons = [cons.FinalUnitaryFidelityConstraint(
                nm, final_fidelity, subspace=base.subspace)
                for nm in names]
        elif isinstance(base, KetTrajectory):
            fid_cons = [cons.FinalKetFidelityConstraint(nm, final_fidelity)
                        for nm in names]
        elif isinstance(base, DensityTrajectory):
            fid_cons = [cons.FinalDensityFidelityConstraint(
                nm, final_fidelity) for nm in names]
        else:
            raise TypeError(
                f"MinimumTimeProblem: unsupported sampling base "
                f"{type(base).__name__}")
        objectives = list(qcp.objectives) + [obj.MinimumTimeObjective(D)]
        constraints = list(qcp.constraints) + fid_cons
        out = QuantumControlProblem(qtraj, traj, objectives,
                                    qcp.integrators, constraints,
                                    params=qcp.extra_params)
        if phase_info is not None:
            out._phase_global = phase_info
        return out
    if isinstance(qtraj, UnitaryTrajectory):
        if phase_info is not None:
            fid_con = cons.FinalUnitaryFreePhaseFidelityConstraint(
                "U", final_fidelity, phase_info[0], phase_info[1],
                subspace=qtraj.subspace)
        else:
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
    out = QuantumControlProblem(qtraj, traj, objectives, qcp.integrators,
                                constraints, params=qcp.extra_params)
    if getattr(qcp, "_phase_global", None) is not None:
        out._phase_global = qcp._phase_global
    return out


def SamplingProblem(qcp: QuantumControlProblem, systems, weights=None, *,
                    Q: float = 100.0, pade_order="taylor"):
    """Transform a (solved) problem into a robustness problem over an
    ensemble of systems sharing the controls
    (reference: sampling_problem.jl:130)."""
    base_qtraj = qcp.qtraj
    straj = SamplingTrajectory(base_qtraj, systems, weights)
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
                           intg.TimeStepsEqualIntegrator,
                           intg.TimeConsistencyIntegrator)):
            integrators.append(it)
    params = {"systems": tuple(straj.systems)}
    return QuantumControlProblem(straj, traj, objectives, integrators,
                                 params=params)
