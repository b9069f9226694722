"""Control-pulse parameterizations as JAX pytrees.

TPU-native counterpart of the reference pulse hierarchy
(reference: src/quantum/primitives/pulses.jl:18-27,158,281,370,657,755,862,986).

Every pulse is callable ``pulse(t) -> u`` where `t` is a scalar (or any
batched shape) and `u` has a trailing drive axis; pulses know their
`duration`, `n_drives`, `drive_name`, support `sample(times)` and
`derivative(t)`, and carry boundary values with NaN = "free" sentinel
(reference stores `initial_value`/`final_value` the same way).

Knot data (`times`, `values`, `tangents`) are traced array leaves so that
pulses can be vmapped/scanned over (e.g. batched ensembles with different
knot values); names are static metadata.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field

__all__ = [
    "ZeroOrderPulse",
    "LinearSplinePulse",
    "CubicSplinePulse",
    "GaussianPulse",
    "ErfPulse",
    "CompositePulse",
    "FunctionPulse",
    "SPLINE_PULSE_TYPES",
    "save_pulse",
    "load_pulse",
]

_SNAP_TOL = 1e-9


def _segment_index(times, t, last_ok: bool):
    """Index k with times[k] <= t < times[k+1]; clipped to valid segments."""
    K = times.shape[0]
    hi = K - 1 if last_ok else K - 2
    idx = jnp.searchsorted(times, t + _SNAP_TOL, side="right") - 1
    return jnp.clip(idx, 0, hi)


class _PulseBase:
    """Shared pulse interface (mixin)."""

    drive_name: str = "u"

    @property
    def duration(self):
        raise NotImplementedError

    @property
    def n_drives(self) -> int:
        raise NotImplementedError

    def __call__(self, t):
        raise NotImplementedError

    def sample(self, times):
        """Evaluate at an array of times -> [len(times), n_drives]."""
        times = jnp.asarray(times)
        return jax.vmap(self.__call__)(times)

    def derivative(self, t):
        """du/dt at time t (autodiff fallback; splines override analytically)."""
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        return jax.jacfwd(lambda s: self.__call__(s))(t)

    # Knot accessors — parametric pulses have no knots; spline types override.
    def knot_times(self):
        raise TypeError(f"{type(self).__name__} has no knots")

    def knot_count(self) -> int:
        raise TypeError(f"{type(self).__name__} has no knots")

    def knot_values(self):
        raise TypeError(f"{type(self).__name__} has no knots")

    def knot_derivatives(self):
        raise TypeError(f"{type(self).__name__} has no knots")


def _boundary(value, n_drives: int):
    """Normalize a boundary condition: None -> zeros (bound at 0); "free" -> NaN."""
    if value is None:
        return jnp.zeros(n_drives)
    if isinstance(value, str):
        assert value == "free", f"unknown boundary spec {value!r}"
        return jnp.full(n_drives, jnp.nan)
    return jnp.asarray(value, dtype=jnp.result_type(float))


@pytree_dataclass
class ZeroOrderPulse(_PulseBase):
    """Zero-order-hold pulse: u(t) = values[k] for t in [times[k], times[k+1]).

    reference: src/quantum/primitives/pulses.jl:158 (left-continuous constant
    interpolation with knot snapping).
    """

    times: jnp.ndarray                       # [K]
    values: jnp.ndarray                      # [K, d]
    initial_value: jnp.ndarray               # [d], NaN = free
    final_value: jnp.ndarray                 # [d], NaN = free
    drive_name: str = static_field(default="u")

    def __init__(self, values, times, drive_name="u",
                 initial_value=None, final_value=None):
        values = jnp.asarray(values, dtype=jnp.result_type(float))
        times = jnp.asarray(times, dtype=jnp.result_type(float))
        assert values.ndim == 2 and values.shape[0] == times.shape[0], (
            "values must be [K, n_drives] matching times [K]")
        d = values.shape[1]
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "values", values)
        object.__setattr__(self, "initial_value", _boundary(initial_value, d))
        object.__setattr__(self, "final_value", _boundary(final_value, d))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return self.times[-1]

    @property
    def n_drives(self) -> int:
        return self.values.shape[-1]

    def __call__(self, t):
        k = _segment_index(self.times, t, last_ok=True)
        return self.values[k]

    def derivative(self, t):
        return jnp.zeros(self.n_drives)

    def knot_times(self):
        return self.times

    def knot_count(self) -> int:
        return self.times.shape[0]

    def knot_values(self):
        return self.values

    def knot_derivatives(self):
        return jnp.zeros_like(self.values)


@pytree_dataclass
class LinearSplinePulse(_PulseBase):
    """Piecewise-linear pulse (reference: src/quantum/primitives/pulses.jl:281)."""

    times: jnp.ndarray
    values: jnp.ndarray
    initial_value: jnp.ndarray
    final_value: jnp.ndarray
    drive_name: str = static_field(default="u")

    def __init__(self, values, times, drive_name="u",
                 initial_value=None, final_value=None):
        values = jnp.asarray(values, dtype=jnp.result_type(float))
        times = jnp.asarray(times, dtype=jnp.result_type(float))
        assert values.ndim == 2 and values.shape[0] == times.shape[0]
        d = values.shape[1]
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "values", values)
        object.__setattr__(self, "initial_value", _boundary(initial_value, d))
        object.__setattr__(self, "final_value", _boundary(final_value, d))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return self.times[-1]

    @property
    def n_drives(self) -> int:
        return self.values.shape[-1]

    def _seg(self, t):
        k = _segment_index(self.times, t, last_ok=False)
        t0, t1 = self.times[k], self.times[k + 1]
        s = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        return k, t0, t1, s

    def __call__(self, t):
        k, _, _, s = self._seg(t)
        return (1 - s) * self.values[k] + s * self.values[k + 1]

    def derivative(self, t):
        k, t0, t1, _ = self._seg(t)
        return (self.values[k + 1] - self.values[k]) / (t1 - t0)

    def knot_times(self):
        return self.times

    def knot_count(self) -> int:
        return self.times.shape[0]

    def knot_values(self):
        return self.values

    def knot_derivatives(self):
        """Slopes at knots (forward differences; last = backward)."""
        dv = (self.values[1:] - self.values[:-1]) / (
            self.times[1:, None] - self.times[:-1, None])
        return jnp.concatenate([dv, dv[-1:]], axis=0)


@pytree_dataclass
class CubicSplinePulse(_PulseBase):
    """Cubic Hermite spline pulse: values AND tangents are true DOFs.

    reference: src/quantum/primitives/pulses.jl:370 (CubicHermiteSpline).
    """

    times: jnp.ndarray
    values: jnp.ndarray                      # [K, d]
    tangents: jnp.ndarray                    # [K, d] (du/dt at knots)
    initial_value: jnp.ndarray
    final_value: jnp.ndarray
    drive_name: str = static_field(default="u")

    def __init__(self, values, tangents, times, drive_name="u",
                 initial_value=None, final_value=None):
        values = jnp.asarray(values, dtype=jnp.result_type(float))
        tangents = jnp.asarray(tangents, dtype=jnp.result_type(float))
        times = jnp.asarray(times, dtype=jnp.result_type(float))
        assert values.shape == tangents.shape
        assert values.ndim == 2 and values.shape[0] == times.shape[0]
        d = values.shape[1]
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "values", values)
        object.__setattr__(self, "tangents", tangents)
        object.__setattr__(self, "initial_value", _boundary(initial_value, d))
        object.__setattr__(self, "final_value", _boundary(final_value, d))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return self.times[-1]

    @property
    def n_drives(self) -> int:
        return self.values.shape[-1]

    def _seg(self, t):
        k = _segment_index(self.times, t, last_ok=False)
        t0, t1 = self.times[k], self.times[k + 1]
        h = t1 - t0
        s = jnp.clip((t - t0) / h, 0.0, 1.0)
        return k, h, s

    def __call__(self, t):
        k, h, s = self._seg(t)
        p0, p1 = self.values[k], self.values[k + 1]
        m0, m1 = self.tangents[k] * h, self.tangents[k + 1] * h
        h00 = (1 + 2 * s) * (1 - s) ** 2
        h10 = s * (1 - s) ** 2
        h01 = s ** 2 * (3 - 2 * s)
        h11 = s ** 2 * (s - 1)
        return h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1

    def derivative(self, t):
        k, h, s = self._seg(t)
        p0, p1 = self.values[k], self.values[k + 1]
        m0, m1 = self.tangents[k] * h, self.tangents[k + 1] * h
        dh00 = 6 * s * (s - 1)
        dh10 = (1 - s) * (1 - 3 * s)
        dh01 = -6 * s * (s - 1)
        dh11 = s * (3 * s - 2)
        return (dh00 * p0 + dh10 * m0 + dh01 * p1 + dh11 * m1) / h

    def knot_times(self):
        return self.times

    def knot_count(self) -> int:
        return self.times.shape[0]

    def knot_values(self):
        return self.values

    def knot_derivatives(self):
        return self.tangents


@pytree_dataclass
class GaussianPulse(_PulseBase):
    """Gaussian envelope per drive: u_i(t) = A_i exp(-(t - c_i)^2 / (2 s_i^2)).

    reference: src/quantum/primitives/pulses.jl:657.
    """

    amplitudes: jnp.ndarray
    sigmas: jnp.ndarray
    centers: jnp.ndarray
    _duration: jnp.ndarray
    drive_name: str = static_field(default="u")

    def __init__(self, amplitudes, sigmas, duration, centers=None, drive_name="u"):
        amplitudes = jnp.atleast_1d(jnp.asarray(amplitudes, dtype=jnp.result_type(float)))
        n = amplitudes.shape[0]
        sigmas = jnp.broadcast_to(
            jnp.asarray(sigmas, dtype=jnp.result_type(float)), (n,))
        if centers is None:
            centers = jnp.full((n,), duration / 2.0)
        centers = jnp.broadcast_to(
            jnp.asarray(centers, dtype=jnp.result_type(float)), (n,))
        object.__setattr__(self, "amplitudes", amplitudes)
        object.__setattr__(self, "sigmas", sigmas)
        object.__setattr__(self, "centers", centers)
        object.__setattr__(self, "_duration",
                           jnp.asarray(duration, dtype=jnp.result_type(float)))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return self._duration

    @property
    def n_drives(self) -> int:
        return self.amplitudes.shape[0]

    def __call__(self, t):
        z = (t - self.centers) / self.sigmas
        return self.amplitudes * jnp.exp(-0.5 * z ** 2)

    @property
    def initial_value(self):
        return self.__call__(jnp.zeros(()))

    @property
    def final_value(self):
        return self.__call__(self._duration)


@pytree_dataclass
class ErfPulse(_PulseBase):
    """Error-function ramp per drive: u_i(t) = A_i erf(sqrt(2) (t - c_i) / s_i).

    reference: src/quantum/primitives/pulses.jl:755.
    """

    amplitudes: jnp.ndarray
    sigmas: jnp.ndarray
    centers: jnp.ndarray
    _duration: jnp.ndarray
    drive_name: str = static_field(default="u")

    def __init__(self, amplitudes, sigmas, duration, centers=None, drive_name="u"):
        amplitudes = jnp.atleast_1d(jnp.asarray(amplitudes, dtype=jnp.result_type(float)))
        n = amplitudes.shape[0]
        sigmas = jnp.broadcast_to(
            jnp.asarray(sigmas, dtype=jnp.result_type(float)), (n,))
        if centers is None:
            centers = jnp.full((n,), duration / 2.0)
        centers = jnp.broadcast_to(
            jnp.asarray(centers, dtype=jnp.result_type(float)), (n,))
        object.__setattr__(self, "amplitudes", amplitudes)
        object.__setattr__(self, "sigmas", sigmas)
        object.__setattr__(self, "centers", centers)
        object.__setattr__(self, "_duration",
                           jnp.asarray(duration, dtype=jnp.result_type(float)))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return self._duration

    @property
    def n_drives(self) -> int:
        return self.amplitudes.shape[0]

    def __call__(self, t):
        z = jnp.sqrt(2.0) * (t - self.centers) / self.sigmas
        return self.amplitudes * jax.scipy.special.erf(z)

    @property
    def initial_value(self):
        return self.__call__(jnp.zeros(()))

    @property
    def final_value(self):
        return self.__call__(self._duration)


@pytree_dataclass
class CompositePulse(_PulseBase):
    """Concatenate several pulses along the drive axis (shared time axis).

    reference: src/quantum/primitives/pulses.jl:862.
    """

    pulses: tuple
    drive_name: str = static_field(default="u")

    def __init__(self, pulses, drive_name="u"):
        object.__setattr__(self, "pulses", tuple(pulses))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return jnp.max(jnp.stack([jnp.asarray(p.duration) for p in self.pulses]))

    @property
    def n_drives(self) -> int:
        return sum(p.n_drives for p in self.pulses)

    def __call__(self, t):
        return jnp.concatenate([p(t) for p in self.pulses], axis=-1)

    def derivative(self, t):
        return jnp.concatenate([p.derivative(t) for p in self.pulses], axis=-1)

    @property
    def initial_value(self):
        return jnp.concatenate([jnp.asarray(p.initial_value) for p in self.pulses])

    @property
    def final_value(self):
        return jnp.concatenate([jnp.asarray(p.final_value) for p in self.pulses])


@pytree_dataclass
class FunctionPulse(_PulseBase):
    """Wrap an arbitrary jittable function t -> u vector.

    reference: src/quantum/primitives/pulses.jl:986.
    """

    params: jnp.ndarray
    f: object = static_field(default=None)          # f(t) or f(t, params)
    _n_drives: int = static_field(default=1)
    _duration_static: float = static_field(default=1.0)
    drive_name: str = static_field(default="u")

    def __init__(self, f, duration, n_drives=None, params=None, drive_name="u"):
        params = jnp.zeros(0) if params is None else jnp.asarray(params)
        if n_drives is None:
            probe = f(0.0) if params.size == 0 else f(0.0, params)
            n_drives = int(np.atleast_1d(np.asarray(probe)).shape[-1])
        object.__setattr__(self, "params", params)
        object.__setattr__(self, "f", f)
        object.__setattr__(self, "_n_drives", int(n_drives))
        object.__setattr__(self, "_duration_static", float(duration))
        object.__setattr__(self, "drive_name", drive_name)

    @property
    def duration(self):
        return jnp.asarray(self._duration_static)

    @property
    def n_drives(self) -> int:
        return self._n_drives

    def __call__(self, t):
        out = self.f(t) if self.params.size == 0 else self.f(t, self.params)
        return jnp.atleast_1d(jnp.asarray(out))

    @property
    def initial_value(self):
        return self.__call__(0.0)

    @property
    def final_value(self):
        return self.__call__(self._duration_static)


SPLINE_PULSE_TYPES = (ZeroOrderPulse, LinearSplinePulse, CubicSplinePulse)


# --------------------------------------------------------------------------- #
# Serialization (reference: pulses.jl:1024-1035 uses JLD2; here npz)
# --------------------------------------------------------------------------- #

_SAVEABLE = {
    "ZeroOrderPulse": ZeroOrderPulse,
    "LinearSplinePulse": LinearSplinePulse,
    "CubicSplinePulse": CubicSplinePulse,
    "GaussianPulse": GaussianPulse,
    "ErfPulse": ErfPulse,
}


def save_pulse(path: str, pulse) -> None:
    """Serialize a knot-based or parametric pulse to .npz."""
    kind = type(pulse).__name__
    if kind not in _SAVEABLE:
        raise TypeError(f"cannot serialize pulse type {kind}")
    arrays = {"__kind__": np.array(kind), "drive_name": np.array(pulse.drive_name)}
    if kind in ("ZeroOrderPulse", "LinearSplinePulse", "CubicSplinePulse"):
        arrays["times"] = np.asarray(pulse.times)
        arrays["values"] = np.asarray(pulse.values)
        arrays["initial_value"] = np.asarray(pulse.initial_value)
        arrays["final_value"] = np.asarray(pulse.final_value)
        if kind == "CubicSplinePulse":
            arrays["tangents"] = np.asarray(pulse.tangents)
    else:
        arrays["amplitudes"] = np.asarray(pulse.amplitudes)
        arrays["sigmas"] = np.asarray(pulse.sigmas)
        arrays["centers"] = np.asarray(pulse.centers)
        arrays["duration"] = np.asarray(pulse._duration)
    np.savez(path, **arrays)


def load_pulse(path: str):
    """Load a pulse saved by `save_pulse`."""
    data = np.load(path, allow_pickle=False)
    kind = str(data["__kind__"])
    drive_name = str(data["drive_name"])
    if kind == "CubicSplinePulse":
        return CubicSplinePulse(data["values"], data["tangents"], data["times"],
                                drive_name=drive_name,
                                initial_value=data["initial_value"],
                                final_value=data["final_value"])
    if kind in ("ZeroOrderPulse", "LinearSplinePulse"):
        cls = _SAVEABLE[kind]
        return cls(data["values"], data["times"], drive_name=drive_name,
                   initial_value=data["initial_value"],
                   final_value=data["final_value"])
    cls = _SAVEABLE[kind]
    return cls(data["amplitudes"], data["sigmas"], float(data["duration"]),
               centers=data["centers"], drive_name=drive_name)
