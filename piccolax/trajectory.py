"""Knot-point trajectory container — the NamedTrajectories.jl replacement.

TPU-native design (SURVEY.md section 7): instead of a symbol-indexed flat
vector, a pytree of named ``[N, dim]`` arrays with static metadata for the
concepts the reference container carries (bounds, initial/final equality,
goal, controls-vs-states split, globals, free timesteps). The solver views
a trajectory through `KnotLayout` (the TrajectoryIndexingUtils analogue):
a static name -> column-slice map over a dense ``[N, z_dim]`` knot matrix
plus a ``[g_dim]`` global vector.

Interface surface mirrors the reference use sites
(reference: src/quantum/trajectories/named_trajectory_conversion.jl:339-351,
src/control/templates/smooth_pulse_problem.jl:196-201).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils.pytree import pytree_dataclass, static_field

__all__ = ["Trajectory", "KnotLayout"]


def _freeze_bound(b, dim: int):
    """Normalize a bound spec to a [dim, 2] (lo, hi) array."""
    if b is None:
        lo = np.full(dim, -np.inf)
        hi = np.full(dim, np.inf)
        return jnp.stack([jnp.asarray(lo), jnp.asarray(hi)], axis=-1)
    if np.isscalar(b):
        return jnp.stack([jnp.full(dim, -float(b)), jnp.full(dim, float(b))],
                         axis=-1)
    b = jnp.asarray(b, dtype=jnp.result_type(float))
    if b.ndim == 1 and b.shape[0] == dim:          # symmetric per-component
        return jnp.stack([-b, b], axis=-1)
    if b.ndim == 1 and b.shape[0] == 2:            # shared (lo, hi)
        return jnp.broadcast_to(b[None, :], (dim, 2))
    assert b.shape == (dim, 2), f"bad bound shape {b.shape} for dim {dim}"
    return b


@pytree_dataclass
class Trajectory:
    """Named knot-point data over N knots.

    data: name -> [N, dim] real arrays (states as iso vectors, controls,
          timesteps). global_data: name -> [dim] time-invariant variables.
    bounds/initial/final/goal are metadata constraints consumed by the
    control layer when assembling the NLP.
    """

    data: dict                                   # name -> [N, dim]
    global_data: dict                            # name -> [dim]
    bounds: dict                                 # name -> [dim, 2]
    global_bounds: dict                          # name -> [dim, 2]
    initial: dict                                # name -> [dim] equality at k=0
    final: dict                                  # name -> [dim] equality at k=N-1
    goal: dict                                   # name -> [dim] soft target at N-1
    controls: tuple = static_field(default=())   # control component names
    timestep: object = static_field(default=None)  # name of dt component or float
    frozen: tuple = static_field(default=())     # components excluded from NLP vars

    def __init__(self, data, *, controls=(), timestep=None, bounds=None,
                 initial=None, final=None, goal=None, global_data=None,
                 global_bounds=None, frozen=()):
        data = {k: jnp.asarray(v, dtype=jnp.result_type(float))
                for k, v in data.items()}
        Ns = {v.shape[0] for v in data.values()}
        assert len(Ns) == 1, f"inconsistent knot counts: {Ns}"
        for k, v in data.items():
            assert v.ndim == 2, f"component {k} must be [N, dim]"
        bounds = {k: _freeze_bound(b, data[k].shape[1])
                  for k, b in (bounds or {}).items()}
        global_data = {k: jnp.atleast_1d(jnp.asarray(v, jnp.result_type(float)))
                       for k, v in (global_data or {}).items()}
        global_bounds = {k: _freeze_bound(b, global_data[k].shape[0])
                         for k, b in (global_bounds or {}).items()}
        clean = lambda d: {k: jnp.asarray(v, jnp.result_type(float))  # noqa: E731
                           for k, v in (d or {}).items() if v is not None}
        object.__setattr__(self, "data", data)
        object.__setattr__(self, "global_data", global_data)
        object.__setattr__(self, "bounds", bounds)
        object.__setattr__(self, "global_bounds", global_bounds)
        object.__setattr__(self, "initial", clean(initial))
        object.__setattr__(self, "final", clean(final))
        object.__setattr__(self, "goal", clean(goal))
        object.__setattr__(self, "controls", tuple(controls))
        object.__setattr__(self, "timestep", timestep)
        object.__setattr__(self, "frozen", tuple(frozen))

    # -- shape & naming ------------------------------------------------------

    @property
    def N(self) -> int:
        return next(iter(self.data.values())).shape[0]

    @property
    def names(self) -> tuple:
        return tuple(self.data.keys())

    @property
    def dims(self) -> dict:
        return {k: v.shape[1] for k, v in self.data.items()}

    @property
    def state_names(self) -> tuple:
        skip = set(self.controls)
        if isinstance(self.timestep, str):
            skip.add(self.timestep)
        return tuple(k for k in self.data if k not in skip)

    @property
    def global_names(self) -> tuple:
        return tuple(self.global_data.keys())

    @property
    def global_dim(self) -> int:
        return sum(v.shape[0] for v in self.global_data.values())

    def __getitem__(self, name: str):
        if name in self.data:
            return self.data[name]
        return self.global_data[name]

    # -- time ----------------------------------------------------------------

    def get_timesteps(self):
        """Per-knot dt array [N] (last entry pads the final knot)."""
        if isinstance(self.timestep, str):
            return self.data[self.timestep][:, 0]
        return jnp.full(self.N, float(self.timestep))

    def get_times(self):
        """Accumulated knot times [N], t_0 = 0."""
        dts = self.get_timesteps()
        return jnp.concatenate([jnp.zeros(1, dts.dtype),
                                jnp.cumsum(dts[:-1])])

    @property
    def duration(self):
        return self.get_times()[-1]

    # -- functional updates --------------------------------------------------

    def with_data(self, **updates) -> "Trajectory":
        new = dict(self.data)
        for k, v in updates.items():
            assert k in new, f"unknown component {k}"
            new[k] = jnp.asarray(v)
        return self.replace(data=new)

    def with_global_data(self, **updates) -> "Trajectory":
        new = dict(self.global_data)
        for k, v in updates.items():
            new[k] = jnp.atleast_1d(jnp.asarray(v))
        return self.replace(global_data=new)

    def add_component(self, name: str, values, *, control: bool = False,
                      bound=None, initial=None, final=None) -> "Trajectory":
        values = jnp.asarray(values, dtype=jnp.result_type(float))
        assert values.shape[0] == self.N
        data = dict(self.data)
        data[name] = values
        bounds = dict(self.bounds)
        if bound is not None:
            bounds[name] = _freeze_bound(bound, values.shape[1])
        init_d = dict(self.initial)
        if initial is not None:
            init_d[name] = jnp.asarray(initial)
        fin_d = dict(self.final)
        if final is not None:
            fin_d[name] = jnp.asarray(final)
        controls = self.controls + (name,) if control else self.controls
        return self.replace(data=data, bounds=bounds, initial=init_d,
                            final=fin_d, controls=controls)

    def update_bound(self, name: str, bound) -> "Trajectory":
        """reference: NamedTrajectories.update_bound! use site
        (src/control/templates/_problem_templates.jl:106-110)."""
        if name in self.data:
            bounds = dict(self.bounds)
            bounds[name] = _freeze_bound(bound, self.data[name].shape[1])
            return self.replace(bounds=bounds)
        gbounds = dict(self.global_bounds)
        gbounds[name] = _freeze_bound(bound, self.global_data[name].shape[0])
        return self.replace(global_bounds=gbounds)

    def add_control_derivatives(self, order: int, name: str | None = None,
                                bounds=None,
                                zero_initial: bool = False,
                                zero_final: bool = False) -> "Trajectory":
        """Append finite-difference derivative components (u -> du -> ddu).

        reference: NamedTrajectories.add_control_derivatives use site
        (src/control/templates/smooth_pulse_problem.jl:196-201). The new
        components become controls named `d<base>`, `dd<base>`, ...
        """
        base = name or self.controls[0]
        traj = self
        dts = self.get_timesteps()
        src = self.data[base]
        prefix = "d"
        for o in range(order):
            dname = prefix * (o + 1) + base
            dv = (src[1:] - src[:-1]) / dts[:-1, None]
            dv = jnp.concatenate([dv, dv[-1:]], axis=0)
            bound = None
            if bounds is not None and o < len(bounds) and bounds[o] is not None:
                bound = bounds[o]
            zero = jnp.zeros(src.shape[1])
            traj = traj.add_component(
                dname, dv, control=True, bound=bound,
                initial=zero if (zero_initial and o == 0) else None,
                final=zero if (zero_final and o == 0) else None)
            src = dv
        return traj

    # -- layout / flat views -------------------------------------------------

    def layout(self) -> "KnotLayout":
        return KnotLayout(
            names=self.names,
            dims=tuple(self.dims[k] for k in self.names),
            global_names=self.global_names,
            global_dims=tuple(self.global_data[k].shape[0]
                              for k in self.global_names),
        )

    def knot_matrix(self):
        """Dense [N, z_dim] view of all components (solver decision matrix)."""
        return jnp.concatenate([self.data[k] for k in self.names], axis=1)

    def global_vector(self):
        if not self.global_data:
            return jnp.zeros(0)
        return jnp.concatenate([self.global_data[k] for k in self.global_names])

    def with_knot_matrix(self, Z, g=None) -> "Trajectory":
        """Inverse of knot_matrix/global_vector."""
        layout = self.layout()
        data = {k: Z[:, sl] for k, sl in layout.slices.items()}
        out = self.replace(data=data)
        if g is not None and self.global_data:
            gd = {k: g[sl] for k, sl in layout.global_slices.items()}
            out = out.replace(global_data=gd)
        return out

    def save(self, path: str) -> None:
        """Serialize to .npz (reference uses JLD2)."""
        arrays = {}
        for k, v in self.data.items():
            arrays[f"data.{k}"] = np.asarray(v)
        for k, v in self.global_data.items():
            arrays[f"global.{k}"] = np.asarray(v)
        for group, d in (("bounds", self.bounds), ("gbounds", self.global_bounds),
                         ("initial", self.initial), ("final", self.final),
                         ("goal", self.goal)):
            for k, v in d.items():
                arrays[f"{group}.{k}"] = np.asarray(v)
        arrays["__controls__"] = np.array(list(self.controls))
        arrays["__timestep__"] = np.array(
            [self.timestep if isinstance(self.timestep, str)
             else repr(float(self.timestep))])
        np.savez(path, **arrays)

    @staticmethod
    def load(path: str) -> "Trajectory":
        raw = np.load(path, allow_pickle=False)
        groups: dict[str, dict] = {g: {} for g in
                                   ("data", "global", "bounds", "gbounds",
                                    "initial", "final", "goal")}
        for key in raw.files:
            if key.startswith("__"):
                continue
            g, name = key.split(".", 1)
            groups[g][name] = raw[key]
        controls = tuple(str(c) for c in raw["__controls__"])
        ts_raw = str(raw["__timestep__"][0])
        try:
            timestep: object = float(ts_raw)
        except ValueError:
            timestep = ts_raw
        return Trajectory(groups["data"], controls=controls, timestep=timestep,
                          bounds=groups["bounds"], initial=groups["initial"],
                          final=groups["final"], goal=groups["goal"],
                          global_data=groups["global"],
                          global_bounds=groups["gbounds"])


class KnotLayout:
    """Static (name -> column slice) map over the dense knot matrix.

    The TrajectoryIndexingUtils.jl analogue (reference use:
    src/control/_control.jl:14) — but mapping to [N, z_dim] matrix columns
    instead of flat NLP vector offsets.
    """

    def __init__(self, names, dims, global_names=(), global_dims=()):
        self.names = tuple(names)
        self.dims = tuple(dims)
        self.slices = {}
        off = 0
        for n, d in zip(self.names, self.dims):
            self.slices[n] = slice(off, off + d)
            off += d
        self.z_dim = off
        self.global_names = tuple(global_names)
        self.global_slices = {}
        goff = 0
        for n, d in zip(self.global_names, global_dims):
            self.global_slices[n] = slice(goff, goff + d)
            goff += d
        self.g_dim = goff

    def view(self, Z, name: str):
        """Columns of component `name` from a [..., N, z_dim] matrix."""
        return Z[..., self.slices[name]]

    def gview(self, g, name: str):
        return g[..., self.global_slices[name]]

    def __repr__(self):
        parts = ", ".join(f"{n}:{self.slices[n].start}-{self.slices[n].stop}"
                          for n in self.names)
        return f"KnotLayout({parts}; g_dim={self.g_dim})"
