# # Cat Qubits
#
# Dissipatively-stabilized bosonic cat qubits (reference:
# docs/literate/systems/cat_qubits.jl). See
# docs/guides/wigner_bosonic_qubits.py for the phase-space pictures.
#
# ## The architecture
#
# A cat qubit stores |0/1> in coherent states |+-alpha> of a storage
# mode a, stabilized by TWO-photon exchange g2 a'^2 b + h.c. with a
# lossy buffer b: single-photon (bit-flip) errors are exponentially
# suppressed in |alpha|^2. The CatSystem template is an
# `OpenQuantumSystem` — dissipation IS the mechanism, not a nuisance.
#
# Run it:  python docs/systems/cat_qubits.py   (CPU, ~2 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## The template

cat_sys = px.quantum.CatSystem(cat_levels=8, buffer_levels=2)
assert cat_sys.levels == 16
assert cat_sys.n_drives == 2       # buffer displacement + Kerr correction
assert len(cat_sys.dissipators) == 2
print("CatSystem:", cat_sys.levels, "levels,",
      len(cat_sys.dissipators), "dissipators")

# Parameters live on the system as global params (g2, chis, kappas):

assert "g2" in cat_sys.global_params

# ## Cat states and steady-state controls

alpha = 1.5
psi_cat = px.quantum.coherent_ket(alpha, 8) \
    + px.quantum.coherent_ket(-alpha, 8)
psi_cat /= np.linalg.norm(psi_cat)

# even cats carry only even Fock components:

assert np.allclose(psi_cat[1::2], 0.0, atol=1e-12)

u_ss = px.quantum.get_cat_controls(cat_sys, alpha=alpha, N=20)
print(f"steady-state drives: buffer {u_ss[0, 0]:.3f}, "
      f"Kerr corr {u_ss[0, 1]:.3f}")

# ## Stabilization vs free decay
#
# The point of the architecture: with the two-photon stabilization
# drives on, the cat mode holds photons; undriven, it decays toward
# vacuum. Roll the Lindblad dynamics both ways:

T, N = 2.0, 20
times = np.linspace(0, T, N)
psi0 = np.kron(px.quantum.coherent_ket(alpha, 8), [1.0, 0.0])
rho0 = np.outer(psi0, psi0.conj())
n_op = np.diag(np.arange(8.0))


def final_photons(u):
    rhos = px.density_rollout(cat_sys, px.ZeroOrderPulse(u, times),
                              times, rho0)
    rho_cat = np.asarray(rhos[-1]).reshape(8, 2, 8, 2) \
        .trace(axis1=1, axis2=3)
    return float(np.real(np.trace(rho_cat @ n_op)))


n_stab = final_photons(u_ss)
n_free = final_photons(np.zeros_like(u_ss))
print(f"cat-mode <n> after T={T}: stabilized {n_stab:.3f} "
      f"vs free {n_free:.3f}")
assert n_stab > n_free

# ## Trace preservation through the compact-iso Lindblad engine

rhos = px.density_rollout(cat_sys, px.ZeroOrderPulse(u_ss, times),
                          times, rho0)
traces = np.real(np.trace(np.asarray(rhos), axis1=1, axis2=2))
np.testing.assert_allclose(traces, 1.0, atol=1e-8)

# ## Scaling note
#
# Pulse OPTIMIZATION on the cat manifold (gates between |+-alpha>)
# uses the same DensityTrajectory + SmoothPulseProblem machinery as
# docs/guides/open_systems.py; cat gates need larger cat_levels and
# long horizons, so run those on TPU (see bench.py --all, config 5,
# for the Lindblad solver throughput) rather than in a CPU tutorial.
print("cat_qubits complete.")
