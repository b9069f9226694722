# # System Templates
#
# A tour of the built-in physical-system constructors (reference:
# docs/literate/guides/system_templates.jl). Each returns a plain
# `QuantumSystem` / `OpenQuantumSystem` — templates are conveniences,
# not special types.
#
# Run it:  python docs/guides/system_templates.py   (CPU, < 1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## Transmons

t1 = px.quantum.TransmonSystem(omega=4.0, delta=0.2, levels=3,
                               drive_bounds=0.2)
assert t1.levels == 3 and t1.n_drives == 2

# Lab frame (Duffing / quartic / cosine expansions):

t_lab = px.quantum.TransmonSystem(levels=3, lab_frame=True,
                                  lab_frame_type="duffing")
assert np.abs(np.asarray(t_lab.get_drift())).max() > 0

# Coupled pair + cavity:

gs = np.array([[0.0, 0.1], [0.1, 0.0]])
t2 = px.quantum.MultiTransmonSystem([4.0, 4.1], [0.2, 0.2], gs,
                                    levels_per_transmon=2,
                                    drive_bounds=0.1)
assert t2.levels == 4 and t2.n_drives == 4

tc = px.quantum.TransmonCavitySystem(qubit_levels=3, cavity_levels=5)
assert tc.levels == 15

# ## Trapped ions

ion = px.quantum.IonChainSystem(N_ions=2, mode_levels=4)
assert ion.n_drives == 4            # X/Y per ion

ms = px.quantum.RadialMSGateSystem(N_ions=2, mode_levels=3)
assert ms.n_drives == 2             # shared amp pair

msp = px.quantum.RadialMSGateSystemWithPhase(N_ions=2, mode_levels=3)
assert msp.n_drives == 4            # amplitude + phase per ion

# ## Rydberg atoms

ryd = px.quantum.RydbergChainSystem(N=3)
assert ryd.levels == 8

# Local detuning adds per-atom Z drives:

ryd_local = px.quantum.RydbergChainSystem(N=3, local_detune=True)
assert ryd_local.n_drives > ryd.n_drives

# ## Bosonic cat qubits (open system)

cat = px.quantum.CatSystem(cat_levels=6, buffer_levels=2)
assert cat.levels == 12
assert len(cat.dissipators) == 2

alpha = 1.5
psi_cat = px.quantum.coherent_ket(alpha, 6)
assert abs(np.linalg.norm(psi_cat) - 1.0) < 1e-12

u_ss = px.quantum.get_cat_controls(cat, alpha=alpha, N=10)
assert u_ss.shape == (10, 2)

# ## Controllability sanity
#
# Templates pair naturally with `is_reachable` before you burn compute:

assert px.quantum.is_reachable(
    px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=3).operator, t1)
print("system_templates complete.")
