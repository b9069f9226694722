"""Problem display & inspection.

TPU-native counterpart of the reference observability layer
(reference: src/control/display/inspect.jl:63,122 and show.jl:59-313):
a structured `ProblemInspection` snapshot (live objective-term values,
constraint violations, timestep range) and a tree-style renderer.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..solver.nlp import nlp_constraint_residuals

__all__ = ["ProblemInspection", "inspect", "show_problem",
           "pulse_sparkline"]


@dataclasses.dataclass
class ProblemInspection:
    N: int
    components: dict                 # name -> dim
    globals: dict                    # name -> value array
    objective_terms: list            # (label, current value)
    constraint_violation: float
    dt_range: tuple
    duration: float
    fidelity: float | None

    def render(self) -> str:
        lines = [f"QuantumControlProblem (N={self.N} knots, "
                 f"T={self.duration:.4g})"]
        lines.append("├─ components")
        for nm, d in self.components.items():
            lines.append(f"│   ├─ {nm}: dim {d}")
        if self.globals:
            lines.append("├─ globals")
            for nm, v in self.globals.items():
                lines.append(f"│   ├─ {nm} = {np.asarray(v)}")
        lines.append("├─ objective terms")
        for label, val in self.objective_terms:
            lines.append(f"│   ├─ {label}: {val:.6g}")
        lines.append(f"├─ max constraint violation: "
                     f"{self.constraint_violation:.3e}")
        lines.append(f"├─ dt range: [{self.dt_range[0]:.4g}, "
                     f"{self.dt_range[1]:.4g}]")
        if self.fidelity is not None:
            lines.append(f"└─ fidelity: {self.fidelity:.8f}")
        return "\n".join(lines)


def inspect(problem) -> ProblemInspection:
    """Structured snapshot with live objective values and violations."""
    traj = problem.traj
    nlp, params, Z0, g0, layout = problem.build()
    terms = []
    N = traj.N
    ks = jnp.arange(N)
    import jax

    def make_get(k, z):
        def get(name):
            if name in layout.slices:
                return z[layout.slices[name]]
            return params["frozen"][name][k]
        return get

    for obj in problem.objectives:
        def term_cost(k, z, obj=obj):
            return obj.stage_cost(k, make_get(k, z), g0, params, N)
        vals = jax.vmap(term_cost)(ks, Z0)
        terms.append((type(obj).__name__, float(jnp.sum(vals))))

    c = nlp_constraint_residuals(nlp, Z0, g0, params)
    viol = float(jnp.max(jnp.abs(c))) if c.size else 0.0
    dts = np.asarray(traj.get_timesteps())
    try:
        F = float(problem.fidelity())
    except Exception:
        F = None
    return ProblemInspection(
        N=N,
        components=dict(traj.dims),
        globals={k: np.asarray(v) for k, v in traj.global_data.items()},
        objective_terms=terms,
        constraint_violation=viol,
        dt_range=(float(dts.min()), float(dts.max())),
        duration=float(np.asarray(traj.get_times())[-1]),
        fidelity=F,
    )


_SPARK = "▁▂▃▄▅▆▇█"


def pulse_sparkline(us, width: int = 64, labels=None) -> str:
    """In-terminal pulse plot: one unicode sparkline strip per drive
    (the reference's UnicodePlots tier, display/plot.jl:2-12). us is
    [N, n_drives]; resampled to `width` columns, normalized per drive."""
    us = np.asarray(us, dtype=float)
    if us.ndim == 1:
        us = us[:, None]
    N, nd = us.shape
    cols = np.linspace(0, N - 1, min(width, N)).round().astype(int)
    lines = []
    for d in range(nd):
        u = us[cols, d]
        lo, hi = u.min(), u.max()
        span = hi - lo if hi > lo else 1.0
        idx = ((u - lo) / span * (len(_SPARK) - 1)).round().astype(int)
        strip = "".join(_SPARK[i] for i in idx)
        label = labels[d] if labels else f"u{d + 1}"
        lines.append(f"  {label:>4s} [{lo:+.3f}, {hi:+.3f}] {strip}")
    return "\n".join(lines)


def _render_standard(problem) -> str:
    """Standard tier: structure only — no NLP build, no live values
    (reference: show.jl:59 header + component tree)."""
    traj = problem.traj
    dts = np.asarray(traj.get_timesteps())
    lines = [f"QuantumControlProblem (N={traj.N} knots, "
             f"T={float(np.asarray(traj.get_times())[-1]):.4g})"]
    lines.append("├─ components")
    for nm, d in traj.dims.items():
        lines.append(f"│   ├─ {nm}: dim {d}")
    if traj.global_data:
        lines.append("├─ globals")
        for nm, v in traj.global_data.items():
            lines.append(f"│   ├─ {nm}: dim {np.asarray(v).size}")
    lines.append(f"├─ objectives: "
                 + ", ".join(type(o).__name__ for o in problem.objectives))
    lines.append(f"├─ integrators: "
                 + ", ".join(type(i).__name__ for i in problem.integrators))
    if problem.constraints:
        lines.append(f"├─ constraints: "
                     + ", ".join(type(c).__name__
                                 for c in problem.constraints))
    lines.append(f"└─ dt range: [{dts.min():.4g}, {dts.max():.4g}]")
    return "\n".join(lines)


def show_problem(problem, detailed: bool = False) -> None:
    """Tree view of the problem (reference: display/show.jl:59).

    detailed=False (the "standard" tier): structure only — cheap, no
    NLP build. detailed=True: full inspection with live objective-term
    values, constraint violation, fidelity, and an in-terminal pulse
    sparkline (the reference's UnicodePlots tier)."""
    if not detailed:
        print(_render_standard(problem))
        return
    print(inspect(problem).render())
    dname = getattr(problem.qtraj, "drive_name", None)
    if dname and dname in problem.traj.data:
        print("└─ pulse")
        print(pulse_sparkline(problem.traj.data[dname]))
