"""Logical encodings: dual-rail qubits.

TPU-native counterpart of the reference dual-rail encoding
(reference: src/quantum/encodings/dual_rail.jl:67,171,251,272).
All indices 0-based.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np

from .gates import GATES
from .operators import EmbeddedOperator

__all__ = [
    "DualRailEncoding",
    "subspace_transform",
    "reduce_to_subspace",
    "logical_basis_states",
    "logical_state_indices",
    "target_states",
    "embedded_gate",
]


@dataclass(frozen=True)
class DualRailEncoding:
    """n_qubits logical qubits on 2*n_qubits rails; logical qubit q lives on
    rails (2q, 2q+1) with |0>_q = |m,0>, |1>_q = |0,m> (m = N/n_qubits).

    conservation: "exact_N" keeps the sector sum(n_i) == N (closed systems);
    "upto_N" keeps sum(n_i) <= N (open/lossy systems).
    """

    n_qubits: int
    levels_per_rail: int = 2
    conservation: str = "exact_N"
    N: int | None = None

    def __post_init__(self):
        N = self.n_qubits if self.N is None else self.N
        object.__setattr__(self, "N", N)
        assert self.n_qubits >= 1
        assert self.levels_per_rail >= 2
        assert self.conservation in ("exact_N", "upto_N")
        assert N % self.n_qubits == 0
        m = N // self.n_qubits
        assert 1 <= m <= self.levels_per_rail - 1

    @property
    def n_rails(self) -> int:
        return 2 * self.n_qubits

    @property
    def subsystem_levels(self):
        return [self.levels_per_rail] * self.n_rails

    @property
    def m(self) -> int:
        return self.N // self.n_qubits


def _occ_to_index(occ, levels) -> int:
    idx = 0
    for n, l in zip(occ, levels):
        idx = idx * l + n
    return idx


def _subspace_indices(enc: DualRailEncoding):
    levels = enc.subsystem_levels
    out = []
    for i, occ in enumerate(itertools.product(*[range(l) for l in levels])):
        s = sum(occ)
        if (enc.conservation == "exact_N" and s == enc.N) or \
                (enc.conservation == "upto_N" and s <= enc.N):
            out.append(i)
    return out


def subspace_transform(enc: DualRailEncoding):
    """(T, idxs): 0/1 selection isometry |psi_full> = T |psi_sub> and the
    ascending full-space indices of the excitation sector."""
    idxs = _subspace_indices(enc)
    d_full = int(np.prod(enc.subsystem_levels))
    T = np.zeros((d_full, len(idxs)), dtype=complex)
    for col, row in enumerate(idxs):
        T[row, col] = 1.0
    return T, idxs


def reduce_to_subspace(O, enc: DualRailEncoding):
    """Operator (or state) restricted to the encoded sector: O[idxs, idxs]."""
    idxs = _subspace_indices(enc)
    O = np.asarray(O)
    if O.ndim == 1:
        return O[idxs]
    return O[np.ix_(idxs, idxs)]


def _logical_state_index(bits, enc: DualRailEncoding) -> int:
    m = enc.m
    occ = [0] * enc.n_rails
    for q, b in enumerate(bits):
        occ[2 * q] = m if b == 0 else 0
        occ[2 * q + 1] = 0 if b == 0 else m
    return _occ_to_index(occ, enc.subsystem_levels)


def logical_state_indices(enc: DualRailEncoding):
    """Full-space indices of the 2^n logical basis states (qubit 0 most
    significant)."""
    n = enc.n_qubits
    return [_logical_state_index([(l >> (n - 1 - q)) & 1 for q in range(n)],
                                 enc)
            for l in range(2 ** n)]


def logical_basis_states(enc: DualRailEncoding):
    d_full = int(np.prod(enc.subsystem_levels))
    states = []
    for idx in logical_state_indices(enc):
        psi = np.zeros(d_full, dtype=complex)
        psi[idx] = 1.0
        states.append(psi)
    return states


def target_states(gate, enc: DualRailEncoding):
    """Physical output kets of the logical unitary applied to each logical
    basis input (the MultiKetTrajectory goal set)."""
    U = GATES[gate] if isinstance(gate, str) else np.asarray(gate)
    d = 2 ** enc.n_qubits
    assert U.shape == (d, d)
    psis = logical_basis_states(enc)
    return [sum(U[j, l] * psis[j] for j in range(d)) for l in range(d)]


def embedded_gate(gate, enc: DualRailEncoding) -> EmbeddedOperator:
    """Encoding-aware EmbeddedOperator goal: the logical gate embedded at
    the logical-state indices of the full rail space
    (reference: EmbeddedOperator(gate, enc) constructors)."""
    U = GATES[gate] if isinstance(gate, str) else np.asarray(gate)
    idxs = logical_state_indices(enc)
    return EmbeddedOperator(U, idxs, enc.subsystem_levels)
