# # SamplingProblem
#
# Robustness through sampled-system averaging (reference:
# docs/literate/problem-templates/sampling.jl). See also
# docs/robust_control.py for the full motivating tutorial.
#
# ## Key design: composition
#
#     qcp = SmoothPulseProblem(qtraj, N)           # nominal problem
#     systems = [perturbed_system(e) for e in eps] # sampled variants
#     qcp_rob = SamplingProblem(qcp, systems)      # ONE pulse, many
#     qcp_rob.solve(...)                           # replicated states
#
# The transform keeps a single shared control `u` and replicates the
# state dynamics once per sampled system; the objective averages the
# per-system infidelities (optionally weighted).
#
# Run it:  python docs/problem_templates/sampling.py     (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402


def make_system(detuning):
    return px.QuantumSystem(0.5 * detuning * px.PAULIS["Z"],
                            [px.PAULIS["X"], px.PAULIS["Y"]],
                            drive_bounds=1.0)


T, N = 10.0, 40
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)
qtraj = px.UnitaryTrajectory(make_system(0.0), pulse, px.GATES["X"])
qcp = px.SmoothPulseProblem(qtraj, N, Q=100.0, R=1e-2)
qcp.solve(max_iter=100, tol=1e-7, verbose=False)

# ## Robust to frequency drift

samples = [make_system(d) for d in (-0.05, 0.0, 0.05)]
qcp_rob = px.SamplingProblem(qcp, samples)
qcp_rob.solve(max_iter=250, tol=1e-8, verbose=False)
F_avg = float(qcp_rob.fidelity())
print(f"uniform weights: mean F over samples = {F_avg:.6f}")
assert F_avg > 0.98, F_avg

# ## Weighted sampling
#
# Weights skew the average toward the samples you care most about
# (e.g. the nominal system):

qcp_w = px.SamplingProblem(qcp, samples, weights=[0.2, 0.6, 0.2])
qcp_w.solve(max_iter=250, tol=1e-8, verbose=False)
print(f"weighted:        mean F over samples = "
      f"{float(qcp_w.fidelity()):.6f}")

# The nominal-system fidelity should be at least as good under the
# nominal-heavy weighting:

from piccolax.quantum import dynamics as dyn   # noqa: E402
import jax.numpy as jnp                        # noqa: E402


def nominal_F(qcp_x):
    return float(dyn.unitary_rollout_fidelity(
        make_system(0.0), qcp_x.pulse.values,
        np.asarray(qcp_x.pulse.times), jnp.asarray(px.GATES["X"]),
        interpolation="constant"))


print(f"nominal-system F: uniform {nominal_F(qcp_rob):.6f}, "
      f"weighted {nominal_F(qcp_w):.6f}")

# ## Composition with other transforms
#
# SamplingProblem composes with MinimumTimeProblem — robust AND fast
# (see docs/problem_templates/composition.py for the full pipeline).
print("sampling complete.")
