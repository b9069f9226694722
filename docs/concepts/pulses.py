# # Pulses
#
# The seven pulse parameterizations and their shared interface
# (reference: docs/literate/concepts/pulses.jl).
#
# Every pulse maps t -> u(t) in R^d, exposes `__call__(t)`,
# `derivative(t)`, knot accessors, and serializes with
# `save_pulse` / `load_pulse`.
#
# Run it:  python docs/concepts/pulses.py   (CPU, < 1 min)

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

N, T = 11, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
vals = rng.standard_normal((N, 2))

# ## ZeroOrderPulse — piecewise constant (C^-1)
#
# u(t) = values[k] for t in [times[k], times[k+1]). The collocation
# dynamics for ZOH pulses are EXACT, which is why the main templates
# start here.

zoh = px.ZeroOrderPulse(vals, times)
t_mid = 0.5 * (times[3] + times[4])
np.testing.assert_allclose(np.asarray(zoh(t_mid)), vals[3])
np.testing.assert_allclose(np.asarray(zoh.derivative(t_mid)), 0.0)

# ## LinearSplinePulse — continuous (C^0)

lin = px.LinearSplinePulse(vals, times)
np.testing.assert_allclose(np.asarray(lin(times[4])), vals[4], atol=1e-12)
np.testing.assert_allclose(np.asarray(lin(t_mid)),
                           0.5 * (vals[3] + vals[4]), atol=1e-12)

# ## CubicSplinePulse — continuously differentiable (C^1)
#
# Hermite form: knot values + knot tangents.

tangents = rng.standard_normal((N, 2))
cub = px.CubicSplinePulse(vals, tangents, times)
np.testing.assert_allclose(np.asarray(cub(times[4])), vals[4], atol=1e-12)
np.testing.assert_allclose(np.asarray(cub.derivative(times[4])),
                           tangents[4], atol=1e-10)

# ## Analytic shapes: Gaussian and Erf
#
# Parameterized by amplitudes/sigmas (centered at T/2 by default) —
# useful as fixed shapes or seeds, not as decision variables:

gauss = px.GaussianPulse(amplitudes=[0.5], sigmas=[1.0], duration=T)
peak = float(np.asarray(gauss(T / 2))[0])
tail = float(np.asarray(gauss(0.0))[0])
assert abs(peak - 0.5) < 1e-9 and tail < 0.01, (peak, tail)

erf = px.ErfPulse(amplitudes=[1.0], sigmas=[1.0], duration=T)
assert float(np.asarray(erf(T))[0]) > 0.99       # settled high
assert float(np.asarray(erf(0.0))[0]) < -0.99    # starts low

# ## CompositePulse — concatenation along the DRIVE axis
#
# Stack pulses with different parameterizations into one multi-drive
# pulse sharing the time axis:

comp = px.CompositePulse([px.ZeroOrderPulse(np.full((3, 1), 0.1),
                                            np.linspace(0, T, 3)),
                          gauss])
assert comp.n_drives == 2
u_mid = np.asarray(comp(T / 2))
np.testing.assert_allclose(u_mid, [0.1, 0.5], atol=1e-9)

# ## FunctionPulse — arbitrary jax-traceable waveform


def waveform(t):
    return np.pi * 0.1 * jax.numpy.stack([jax.numpy.sin(t),
                                          jax.numpy.cos(t)])


fn_pulse = px.FunctionPulse(waveform, duration=T, n_drives=2)
np.testing.assert_allclose(np.asarray(fn_pulse(1.0)),
                           np.pi * 0.1 * np.array([np.sin(1.0),
                                                   np.cos(1.0)]),
                           atol=1e-12)

# ## Serialization round trip

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "pulse.npz")
    px.save_pulse(path, cub)
    loaded = px.load_pulse(path)
    assert isinstance(loaded, px.CubicSplinePulse)
    np.testing.assert_allclose(np.asarray(loaded.values), vals)
    np.testing.assert_allclose(np.asarray(loaded.tangents), tangents)

print("pulses complete.")
