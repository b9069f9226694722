"""Transmon system templates.

TPU-native counterpart of the reference transmon templates
(reference: src/quantum/templates/transmons/transmon_system.jl:34,98,199,424).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from ..operators import annihilate, lift_operator
from ..systems import CompositeQuantumSystem, QuantumSystem

__all__ = [
    "TransmonSystem",
    "TransmonDipoleCoupling",
    "MultiTransmonSystem",
    "TransmonCavitySystem",
]


def TransmonSystem(*, omega: float = 4.0, delta: float = 0.2, levels: int = 3,
                   lab_frame: bool = False, frame_omega: float | None = None,
                   multiply_by_2pi: bool = True,
                   lab_frame_type: str = "duffing", drives: bool = True,
                   drive_bounds=None) -> QuantumSystem:
    """Anharmonic-oscillator transmon: H = w a'a - d/2 a'a'aa (rotating frame)
    with X/Y drives a+a', i(a-a')
    (reference: transmon_system.jl:34)."""
    assert lab_frame_type in ("duffing", "quartic", "cosine")
    if frame_omega is None:
        frame_omega = 0.0 if lab_frame else omega
    if lab_frame:
        frame_omega = 0.0
    if abs(frame_omega) > 1e-12:
        lab_frame = False

    a = annihilate(levels)
    ad = a.conj().T
    if lab_frame:
        if lab_frame_type == "duffing":
            H_drift = omega * ad @ a - delta / 2 * ad @ ad @ a @ a
        elif lab_frame_type == "quartic":
            w0 = omega + delta
            x = a + ad
            H_drift = w0 * ad @ a - delta / 12 * np.linalg.matrix_power(x, 4)
        else:  # cosine
            w0 = omega + delta
            E_C = delta
            E_J = w0 ** 2 / (8 * E_C)
            n_hat = 1j / 2 * (E_J / (2 * E_C)) ** 0.25 * (a - ad)
            phi_hat = (2 * E_C / E_J) ** 0.25 * (a + ad)
            H_drift = 4 * E_C * n_hat @ n_hat - E_J * sla.cosm(phi_hat)
    else:
        H_drift = (omega - frame_omega) * ad @ a - delta / 2 * ad @ ad @ a @ a

    H_drives = [a + ad, 1j * (a - ad)] if drives else []
    if multiply_by_2pi:
        H_drift = 2 * np.pi * H_drift
        H_drives = [2 * np.pi * H for H in H_drives]
    if drive_bounds is None:
        drive_bounds = 1.0 if H_drives else None
    return QuantumSystem(H_drift, H_drives, drive_bounds)


def TransmonDipoleCoupling(g_ij: float, pair, subsystem_levels, *,
                           lab_frame: bool = False,
                           multiply_by_2pi: bool = True) -> np.ndarray:
    """Dipole coupling operator in the full composite space:
    g (a_i a_j' + a_i' a_j) (rotating frame) or g (a_i + a_i')(a_j + a_j')
    (lab frame) (reference: transmon_system.jl:98-173)."""
    if hasattr(subsystem_levels[0], "levels"):
        subsystem_levels = [s.levels for s in subsystem_levels]
    i, j = pair
    a_i = lift_operator(annihilate(subsystem_levels[i]), i, subsystem_levels)
    a_j = lift_operator(annihilate(subsystem_levels[j]), j, subsystem_levels)
    if lab_frame:
        op = g_ij * (a_i + a_i.conj().T) @ (a_j + a_j.conj().T)
    else:
        op = g_ij * (a_i @ a_j.conj().T + a_i.conj().T @ a_j)
    if multiply_by_2pi:
        op = 2 * np.pi * op
    return op


def MultiTransmonSystem(omegas, deltas, gs, *, drive_bounds=1.0,
                        levels_per_transmon: int = 3,
                        subsystem_levels=None, lab_frame: bool = False,
                        subsystems=None, subsystem_drive_indices=None
                        ) -> CompositeQuantumSystem:
    """N transmons + pairwise dipole couplings -> CompositeQuantumSystem
    (reference: transmon_system.jl:199)."""
    n = len(omegas)
    assert len(deltas) == n
    gs = np.asarray(gs)
    assert gs.shape == (n, n)
    if subsystem_levels is None:
        subsystem_levels = [levels_per_transmon] * n
    subsystems = list(range(n)) if subsystems is None else list(subsystems)
    if subsystem_drive_indices is None:
        subsystem_drive_indices = list(range(n))

    systems = []
    kept = []
    for i in range(n):
        if i in subsystems:
            systems.append(TransmonSystem(
                omega=omegas[i], delta=deltas[i],
                levels=subsystem_levels[i], lab_frame=lab_frame,
                drives=i in subsystem_drive_indices,
                drive_bounds=drive_bounds))
            kept.append(i)

    kept_levels = [subsystem_levels[i] for i in kept]
    H_coupling = np.zeros((int(np.prod(kept_levels)),) * 2, dtype=complex)
    for li in range(len(kept)):
        for lj in range(li + 1, len(kept)):
            gij = gs[kept[li], kept[lj]]
            if abs(gij) > 0:
                H_coupling += TransmonDipoleCoupling(
                    gij, (li, lj), kept_levels, lab_frame=lab_frame)
    return CompositeQuantumSystem(systems, H_drift=H_coupling)


def TransmonCavitySystem(*, qubit_levels: int = 4, cavity_levels: int = 12,
                         chi: float = 2 * np.pi * 32.8e-6,
                         chi_prime: float = 2 * np.pi * 1.5e-9,
                         K_c: float = 2 * np.pi * 1e-9 / 2,
                         K_q: float = 2 * np.pi * 193e-3 / 2,
                         drive_bounds=None,
                         multiply_by_2pi: bool = False) -> QuantumSystem:
    """Dispersive transmon (x) cavity with cross-Kerr chi
    (reference: transmon_system.jl:424)."""
    levels = [qubit_levels, cavity_levels]
    a = lift_operator(annihilate(qubit_levels), 0, levels)
    b = lift_operator(annihilate(cavity_levels), 1, levels)
    ad, bd = a.conj().T, b.conj().T
    delta_tilde = chi / 2
    H_drift = (delta_tilde * bd @ b
               - chi * ad @ a @ bd @ b
               - chi_prime * bd @ bd @ b @ b @ ad @ a
               - K_q * ad @ ad @ a @ a
               - K_c * bd @ bd @ b @ b)
    H_drives = [a + ad, 1j * (ad - a), b + bd, 1j * (bd - b)]
    if multiply_by_2pi:
        H_drift = 2 * np.pi * H_drift
        H_drives = [2 * np.pi * H for H in H_drives]
    if drive_bounds is None:
        drive_bounds = 1.0
    return QuantumSystem(H_drift, H_drives, drive_bounds)
