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

__all__ = ["ProblemInspection", "inspect", "show_problem"]


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


def show_problem(problem) -> None:
    """Rich tree view of the problem (reference: display/show.jl:59)."""
    print(inspect(problem).render())
