# # Rydberg Atoms
#
# Neutral-atom chains with van-der-Waals blockade (reference:
# docs/literate/systems/rydberg_atoms.jl).
#
# ## The model
#
#     H = sum_i [ (Omega_i/2)(cos phi_i X_i - sin phi_i Y_i)
#                 - Delta_i n_i ]  +  sum_{i<j} C / r_ij^6  n_i n_j
#
# with n = |r><r| the Rydberg projector. The C/r^6 interaction
# blockades simultaneous excitation of nearby atoms — the mechanism
# behind neutral-atom entangling gates.
#
# Run it:  python docs/systems/rydberg_atoms.py   (CPU, ~2 min)

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402
from piccolax import viz         # noqa: E402

# ## Building chains

sys_r = px.quantum.RydbergChainSystem(N=3, distance=8.7,
                                      cutoff_order=1)
assert sys_r.levels == 8
print(f"3-atom chain: {sys_r.n_drives} global drives")

# `local_detune=True` adds per-atom detuning controls;
# `all2all=True` keeps interactions beyond nearest neighbors:

sys_local = px.quantum.RydbergChainSystem(N=3, local_detune=True)
assert sys_local.n_drives > sys_r.n_drives

# ## Chain geometry visualization
#
# Interaction strength falls as 1/r^6 — edge thickness shows it;
# colors show per-atom Rydberg population:

outdir = tempfile.mkdtemp()
fig = viz.plot_rydberg_chain(3, 8.7, populations=[0.0, 1.0, 0.3])
fig.savefig(os.path.join(outdir, "chain.png"), dpi=80)

# ## GHZ-adjacent state preparation on 2 atoms
#
# Drive |00> toward the symmetric single-excitation state — under
# strong blockade the doubly-excited |rr> stays dark:

sys2 = px.quantum.RydbergChainSystem(N=2, distance=8.7)
N_k, T = 70, 6.0
times = np.linspace(0, T, N_k)
rng = np.random.default_rng(0)
pulse = px.ZeroOrderPulse(0.2 * rng.standard_normal((N_k, sys2.n_drives)),
                          times)

psi0 = np.zeros(4, complex)
psi0[0] = 1.0                      # |00>
psi_goal = np.zeros(4, complex)
psi_goal[1] = psi_goal[2] = 1 / np.sqrt(2)   # (|0r> + |r0>)/sqrt(2)

qtraj = px.KetTrajectory(sys2, pulse, psi0, psi_goal)
qcp = px.SmoothPulseProblem(qtraj, N_k, Q=200.0, R=1e-3)
qcp.solve(max_iter=250, tol=1e-7, verbose=False)
F = float(qcp.fidelity())
print(f"blockaded W-state prep: F = {F:.6f}")
assert F > 0.99, F

# Check the blockade did its job — |rr> population stays small along
# the path:

qt = qcp.qtraj.rollout(qcp.pulse, n_substeps=4)
p_rr = float((np.abs(np.asarray(qt.psis)[:, 3]) ** 2).max())
print(f"max |rr> population: {p_rr:.3e}")
assert p_rr < 0.05

# ## Animating the chain populations

p = os.path.join(outdir, "chain_anim.gif")
viz.animate_rydberg_chain(qt, 2, 8.7, p, fps=5, stride=4)
assert os.path.getsize(p) > 1000
print("rydberg_atoms complete.")
