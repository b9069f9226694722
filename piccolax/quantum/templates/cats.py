"""Kerr-cat qubit template.

TPU-native counterpart of the reference cat system
(reference: src/quantum/templates/cats/cat_system.jl:54).
"""

from __future__ import annotations

import numpy as np

from ..operators import annihilate, lift_operator
from ..systems import LinearDissipator, OpenQuantumSystem

__all__ = ["CatSystem", "coherent_ket", "get_cat_controls"]


def CatSystem(*, g2: float = 0.36, chi_aa: float = -7e-3,
              chi_bb: float = -32.0, chi_ab: float = 0.79,
              kappa_a: float = 53e-3, kappa_b: float = 13.0,
              cat_levels: int = 13, buffer_levels: int = 3,
              prefactor: float = 1.0,
              drive_bounds=None) -> OpenQuantumSystem:
    """Two-photon-stabilized Kerr cat (x) buffer with decay
    (reference: cat_system.jl:54). Drives: buffer displacement b+b' and
    Kerr-correction a'a."""
    g2 = prefactor * g2
    chi_aa = prefactor * chi_aa
    chi_bb = prefactor * chi_bb
    chi_ab = prefactor * chi_ab
    kappa_a = prefactor * kappa_a
    kappa_b = prefactor * kappa_b

    levels = [cat_levels, buffer_levels]
    a = lift_operator(annihilate(cat_levels), 0, levels)
    b = lift_operator(annihilate(buffer_levels), 1, levels)
    ad, bd = a.conj().T, b.conj().T

    H_drift = (-chi_aa / 2 * ad @ ad @ a @ a
               - chi_bb / 2 * bd @ bd @ b @ b
               - chi_ab * ad @ a @ bd @ b
               + g2 * ad @ ad @ b
               + np.conj(g2) * a @ a @ bd)
    H_drives = [b + bd, ad @ a]
    Ls = [np.sqrt(kappa_a) * a, np.sqrt(kappa_b) * b]

    H_drift = 2 * np.pi * H_drift
    H_drives = [2 * np.pi * H for H in H_drives]
    Ls = [np.sqrt(2 * np.pi) * L for L in Ls]

    if drive_bounds is None:
        drive_bounds = 1.0
    return OpenQuantumSystem(
        H_drift, H_drives, drive_bounds,
        dissipators=[LinearDissipator(L, 1.0) for L in Ls],
        global_params={
            "g2": np.array(g2), "chi_aa": np.array(chi_aa),
            "chi_bb": np.array(chi_bb), "chi_ab": np.array(chi_ab),
            "kappa_a": np.array(kappa_a), "kappa_b": np.array(kappa_b),
        })


def coherent_ket(alpha: complex, levels: int) -> np.ndarray:
    """Truncated coherent state |alpha> (reference: cat_system.jl:coherent_ket)."""
    n = np.arange(levels)
    from scipy.special import gammaln

    log_coeff = n * np.log(np.abs(alpha) + 1e-300) - 0.5 * gammaln(n + 1)
    coeff = np.exp(log_coeff - 0.5 * np.abs(alpha) ** 2)
    phase = np.exp(1j * n * np.angle(alpha))
    psi = coeff * phase
    return psi / np.linalg.norm(psi)


def get_cat_controls(system: OpenQuantumSystem, alpha: float, N: int):
    """Steady-state controls maintaining a cat of amplitude alpha for N
    knots: buffer drive eps_b = alpha^2 g2 / ... and Kerr correction
    (reference: cat_system.jl get_cat_controls)."""
    g2 = float(system.global_params["g2"])
    chi_aa = float(system.global_params["chi_aa"])
    buffer_drive = float(np.real(g2 * alpha ** 2))
    kerr_correction = float(chi_aa * (np.abs(alpha) ** 2 + 0.5))
    return np.tile(np.array([[buffer_drive, kerr_correction]]), (N, 1))
