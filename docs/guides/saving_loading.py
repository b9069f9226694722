# # Saving and Loading
#
# Persisting pulses, trajectories, and solver state (reference:
# docs/literate/guides/saving_loading.jl).
#
# ## Why save?
#
# * Hand an optimized waveform to the experiment / AWG.
# * Warm-start tomorrow's optimization from today's solution.
# * Cache expensive solves (content-addressed, like the reference's
#   `cached_solve!`).
#
# Run it:  python docs/guides/saving_loading.py   (CPU, ~1 min)

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

sys_q = px.QuantumSystem(0.5 * px.PAULIS["Z"],
                         [px.PAULIS["X"], px.PAULIS["Y"]], 1.0)
N, T = 40, 10.0
times = np.linspace(0.0, T, N)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)

workdir = tempfile.mkdtemp()

# ## Step 1: solve and save (one script)

qcp = px.SmoothPulseProblem(
    px.UnitaryTrajectory(sys_q, pulse, px.GATES["X"]), N,
    Q=100.0, R=1e-2, dt_bounds=(0.1, 0.4))
qcp.solve(max_iter=100, tol=1e-7, verbose=False)
assert float(qcp.fidelity()) > 0.999

pulse_path = os.path.join(workdir, "x_gate.npz")
px.save_pulse(pulse_path, qcp.pulse)

# Trajectories serialize too (all knot data + bounds + goals):

traj_path = os.path.join(workdir, "x_gate_traj.npz")
qcp.traj.save(traj_path)

# ## Step 2: load and continue (another script / another day)
#
# The loaded pulse reconstructs its exact type and reproduces the
# fidelity through a fresh rollout:

loaded = px.load_pulse(pulse_path)
assert isinstance(loaded, px.ZeroOrderPulse)
qtraj2 = px.UnitaryTrajectory(sys_q, loaded, px.GATES["X"])
F_loaded = float(qtraj2.fidelity())
assert abs(F_loaded - float(qcp.fidelity())) < 1e-9
print(f"reloaded pulse reproduces F = {F_loaded:.6f}")

# Warm-starting minimum-time from the saved pulse:

qcp2 = px.SmoothPulseProblem(qtraj2, None, Q=100.0, R=1e-2,
                             dt_bounds=(0.05, 0.4))
qcp2.solve(max_iter=50, tol=1e-7, verbose=False)
qcp_mt = px.MinimumTimeProblem(qcp2, final_fidelity=0.99, D=10.0)
qcp_mt.solve(max_iter=150, tol=1e-6, verbose=False)
T_new = float(np.sum(np.asarray(qcp_mt.traj.get_timesteps())[:-1]))
print(f"warm-started min-time: T = {T_new:.2f}, "
      f"F = {float(qcp_mt.fidelity()):.4f}")

# Trajectory round trip:

traj2 = px.Trajectory.load(traj_path)
np.testing.assert_allclose(np.asarray(traj2["u"]),
                           np.asarray(qcp.traj["u"]), atol=1e-12)

# ## Cached solves
#
# `cached_solve` hashes the problem structure + data; the second call
# with an identical problem loads the result instead of solving
# (the analogue of the reference's `cached_solve!`):

from piccolax.utils.cache import cached_solve   # noqa: E402
import time                                     # noqa: E402

cache_dir = os.path.join(workdir, "cache")
pulse3 = px.ZeroOrderPulse(0.05 * rng.standard_normal((N, 2)), times)


def build():
    return px.SmoothPulseProblem(
        px.UnitaryTrajectory(sys_q, pulse3, px.GATES["H"]), N,
        Q=100.0, R=1e-2)


t0 = time.time()
p1 = cached_solve(build(), cache_dir, "h_gate", max_iter=100, tol=1e-7,
                  verbose=False)
t_solve = time.time() - t0
t0 = time.time()
p2 = cached_solve(build(), cache_dir, "h_gate", max_iter=100, tol=1e-7,
                  verbose=False)
t_cached = time.time() - t0
print(f"solve {t_solve:.1f}s -> cached {t_cached:.2f}s")
assert t_cached < t_solve / 5
np.testing.assert_allclose(np.asarray(p1.traj["u"]),
                           np.asarray(p2.traj["u"]), atol=1e-12)

# ## Tips
#
# * Save immediately after a successful solve — compute time is money.
# * Name caches by physics (gate, system, N), not by date.
# * .npz files are plain numpy archives — inspect with np.load.
print("saving_loading complete.")
