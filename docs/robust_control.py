# # Robust Control
#
# Design pulses robust to parameter uncertainty with `SamplingProblem`
# (reference: docs/literate/robust_control.jl). Real devices drift: a
# pulse optimized at the nominal qubit frequency may perform poorly a
# few MHz away. `SamplingProblem` optimizes ONE pulse against SEVERAL
# sampled systems simultaneously.
#
# Run it:  python docs/robust_control.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402


# ## Setup: a qubit with an uncertain detuning


def make_system(detuning):
    return px.QuantumSystem(0.5 * detuning * px.PAULIS["Z"],
                            [px.PAULIS["X"], px.PAULIS["Y"]],
                            drive_bounds=1.0)


T, N = 10.0, 50
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
goal = px.GATES["X"]

# ## Step 1: optimize for the nominal system only

sys_nom = make_system(0.0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qcp_nom = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_nom, pulse, goal), N, Q=100.0, R=1e-2)
qcp_nom.solve(max_iter=100, tol=1e-7, verbose=False)
assert float(qcp_nom.fidelity()) > 0.999


# ## Step 2: test robustness of the nominal pulse
#
# Sweep the detuning and re-roll the SAME pulse on perturbed systems:


def sweep(pulse, detunings):
    from piccolax.quantum import dynamics as dyn
    import jax.numpy as jnp
    tt = np.asarray(pulse.times)
    return np.array([
        float(dyn.unitary_rollout_fidelity(
            make_system(d), pulse.values, tt, jnp.asarray(goal),
            interpolation="constant"))
        for d in detunings])


detunings = np.linspace(-0.1, 0.1, 9)
F_nom = sweep(qcp_nom.pulse, detunings)
print("nominal-only pulse over detuning sweep:")
print("  worst F =", F_nom.min().round(6))

# ## Step 3: robust optimization
#
# `SamplingProblem` transforms an existing problem: the single pulse is
# shared, the state dynamics are replicated per sampled system, and the
# objective averages the per-system infidelities.

samples = [make_system(d) for d in (-0.05, 0.0, 0.05)]
qcp_rob = px.SamplingProblem(qcp_nom, samples)
qcp_rob.solve(max_iter=300, tol=1e-8, verbose=False)

F_rob = sweep(qcp_rob.pulse, detunings)
print("robust pulse over detuning sweep:")
print("  worst F =", F_rob.min().round(6))

# The robust pulse must beat the nominal pulse at the sweep edges, and
# stay high across the sampled range (|detuning| <= 0.05):

assert F_rob.min() > F_nom.min(), (F_rob.min(), F_nom.min())
in_range = F_rob[np.abs(detunings) <= 0.05 + 1e-12]
assert in_range.min() > 0.98, in_range.min()
print("robust_control complete.")
