# # Wigner Functions and Bosonic Qubits
#
# Phase-space pictures of bosonic states, and the CatSystem template
# (reference: docs/literate/guides/wigner_bosonic_qubits.jl).
#
# ## Mathematical background
#
# The Wigner function W(x, p) is a quasi-probability over phase space:
#
#     W(alpha) = (2/pi) Tr[ rho D(alpha) P D(alpha)^dag ]
#
# with displacement D and photon-parity P. Negative regions are a
# witness of non-classicality — the lobes-plus-fringes pattern of a
# cat state is the canonical example.
#
# Run it:  python docs/guides/wigner_bosonic_qubits.py   (CPU, ~2 min)

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
from piccolax.viz.plots import _wigner_grid   # noqa: E402

outdir = tempfile.mkdtemp()
levels = 12
xs = np.linspace(-4, 4, 41)


def rho_of(psi):
    return np.outer(psi, psi.conj())


# ## Coherent states
#
# A coherent state |alpha> is a displaced vacuum — an everywhere-
# positive Gaussian blob centered at sqrt(2) Re(alpha), sqrt(2)
# Im(alpha):

alpha = 1.5
psi_coh = px.quantum.coherent_ket(alpha, levels)
W_coh = _wigner_grid(rho_of(psi_coh), xs)
assert W_coh.min() > -1e-3          # classical: no real negativity
i, j = np.unravel_index(np.argmax(W_coh), W_coh.shape)
assert abs(xs[j] - np.sqrt(2) * alpha) < 0.3   # blob at sqrt(2) alpha

# ## Fock states
#
# The n=1 Fock state is maximally non-classical at the origin:

psi_fock1 = np.zeros(levels, complex)
psi_fock1[1] = 1.0
W_fock = _wigner_grid(rho_of(psi_fock1), xs)
center = W_fock[len(xs) // 2, len(xs) // 2]
assert center < -0.5 / np.pi        # deep negativity at the origin

# ## Cat states
#
# |cat+-> = (|alpha> +- |-alpha>)/norm — two blobs plus interference
# fringes whose sign distinguishes the even and odd cat:

psi_even = px.quantum.coherent_ket(alpha, levels) \
    + px.quantum.coherent_ket(-alpha, levels)
psi_even /= np.linalg.norm(psi_even)
W_cat = _wigner_grid(rho_of(psi_even), xs)
assert W_cat.min() < -0.05          # fringes go negative

fig = viz.plot_wigner(rho_of(psi_even), n_grid=41)
fig.savefig(os.path.join(outdir, "cat_even.png"), dpi=80)
print("even cat Wigner saved; min W =", f"{W_cat.min():.3f}")

# ## Animation: a rotating cat
#
# Free evolution under n rotates phase space; animate a few frames:

n_op = np.diag(np.arange(levels).astype(float))
frames = []
for t in np.linspace(0, np.pi / 2, 4):
    U = np.diag(np.exp(-1j * t * np.arange(levels)))
    frames.append(rho_of(U @ psi_even))
p = os.path.join(outdir, "cat_rotation.gif")
viz.animate_wigner(frames, p, fps=2, n_grid=31)
assert os.path.getsize(p) > 1000
print("wrote cat_rotation.gif")

# ## The CatSystem template
#
# Two-photon-stabilized Kerr cat coupled to a lossy buffer — the
# dissipative cat-qubit architecture. The steady-state controls that
# hold a cat of amplitude alpha come from `get_cat_controls`:

cat_sys = px.quantum.CatSystem(cat_levels=8, buffer_levels=2)
u_ss = px.quantum.get_cat_controls(cat_sys, alpha=1.5, N=20)
print(f"steady-state controls: buffer drive {u_ss[0, 0]:.3f}, "
      f"Kerr correction {u_ss[0, 1]:.3f}")

# Roll the controls out through the Lindblad dynamics and compare
# against FREE decay — the two-photon stabilization drive holds more
# photons in the cat mode than letting it decay:

T, N = 2.0, 20
times = np.linspace(0, T, N)
psi0 = np.kron(px.quantum.coherent_ket(1.5, 8), [1.0, 0.0])
rho0 = np.outer(psi0, psi0.conj())


def cat_photons(u):
    rhos = px.density_rollout(cat_sys, px.ZeroOrderPulse(u, times),
                              times, rho0)
    rho_T = np.asarray(rhos[-1])
    rho_cat = rho_T.reshape(8, 2, 8, 2).trace(axis1=1, axis2=3)
    return rho_cat, float(np.real(
        np.trace(rho_cat @ np.diag(np.arange(8.0)))))


rho_stab, n_stab = cat_photons(u_ss)
_, n_free = cat_photons(np.zeros_like(u_ss))
print(f"cat-mode <n>: stabilized {n_stab:.3f} vs free decay {n_free:.3f}")
assert n_stab > n_free

fig = viz.plot_wigner(rho_stab, n_grid=41)
fig.savefig(os.path.join(outdir, "cat_mode_final.png"), dpi=80)
print("wigner_bosonic_qubits complete.")
