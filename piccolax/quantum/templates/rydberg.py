"""Rydberg atom array template.

TPU-native counterpart of the reference Rydberg chain
(reference: src/quantum/templates/atoms/rydberg_chain.jl:66):

    H = 0.5 Omega_x(t) sum_i sx_i - 0.5 Omega_y(t) sum_i sy_i
        - Delta(t) sum_i n_i + sum_{i<j} C/(d |i-j|)^6 n_i n_j
"""

from __future__ import annotations

import numpy as np

from ..gates import PAULIS
from ..operators import lift_operator
from ..systems import QuantumSystem

__all__ = ["RydbergChainSystem"]

_N_OP = np.array([[0, 0], [0, 1]], dtype=complex)


def RydbergChainSystem(*, N: int = 3, C: float = 862690 * 2 * np.pi,
                       distance: float = 8.7, cutoff_order: int = 1,
                       local_detune: bool = False, all2all: bool = True,
                       ignore_Y_drive: bool = False,
                       drive_bounds=None) -> QuantumSystem:
    """Rydberg chain in the spin basis |g>=|0>, |r>=|1> with global
    Rabi X/Y drives and a (global or local) detuning drive."""
    levels = [2] * N
    dim = 2 ** N

    # blockade interactions
    H_drift = np.zeros((dim, dim), dtype=complex)
    max_gap = (N - 1) if all2all else cutoff_order
    for gap in range(1, max_gap + 1):
        for i in range(N - gap):
            ni = lift_operator(_N_OP, i, levels)
            nj = lift_operator(_N_OP, i + gap, levels)
            H_drift += C / (gap * distance) ** 6 * (ni @ nj)

    # global drives
    Sx = sum(lift_operator(PAULIS["X"], i, levels) for i in range(N))
    Sy = sum(lift_operator(PAULIS["Y"], i, levels) for i in range(N))
    Sn = sum(lift_operator(_N_OP, i, levels) for i in range(N))

    H_drives = [0.5 * Sx]
    if not ignore_Y_drive:
        H_drives.append(-0.5 * Sy)
    H_drives.append(-Sn)
    if local_detune:
        # one local detuning pattern: site-weighted n_i (staggered)
        H_local = sum((-1.0) ** i * lift_operator(_N_OP, i, levels)
                      for i in range(N))
        H_drives.append(-H_local)

    if drive_bounds is None:
        drive_bounds = 1.0
    return QuantumSystem(H_drift, H_drives, drive_bounds)
