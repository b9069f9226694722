"""Operator utilities: embedded operators, lifting, direct sums, state builders.

TPU-native counterpart of the reference operator layer
(reference: src/quantum/operators/embedded_operators.jl,
lifted_operators.jl, direct_sums.jl; src/quantum/object_utils.jl).
All indices are 0-based (the reference is 1-based Julia).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np

from .gates import PAULIS

__all__ = [
    "embed",
    "unembed",
    "EmbeddedOperator",
    "basis_labels",
    "get_subspace_indices",
    "get_enr_subspace_indices",
    "get_leakage_indices",
    "get_iso_vec_subspace_indices",
    "get_iso_vec_leakage_indices",
    "lift_operator",
    "direct_sum",
    "operator_from_string",
    "ket_from_string",
    "ket_from_bitstring",
    "haar_random",
    "haar_identity",
    "create",
    "annihilate",
    "number_op",
    "quad_op",
]


# --------------------------------------------------------------------------- #
# Embedding
# --------------------------------------------------------------------------- #


def embed(operator: np.ndarray, subspace, levels: int) -> np.ndarray:
    """Embed `operator` into a `levels`-dim space at the given subspace indices."""
    subspace = np.asarray(subspace)
    out = np.zeros((levels, levels), dtype=np.complex128)
    out[np.ix_(subspace, subspace)] = operator
    return out


def unembed(matrix: np.ndarray, subspace) -> np.ndarray:
    """Extract the subspace block of `matrix`."""
    subspace = np.asarray(subspace)
    return np.asarray(matrix)[np.ix_(subspace, subspace)]


def basis_labels(subsystem_levels) -> list[tuple[int, ...]]:
    """All composite basis labels (tuples of per-subsystem level indices, 0-based)."""
    return list(itertools.product(*[range(l) for l in subsystem_levels]))


def get_subspace_indices(subspaces, subsystem_levels=None):
    """Indices of the composite subspace spanned by per-subsystem subspaces.

    - get_subspace_indices(subspace, levels:int): identity check, returns subspace
    - get_subspace_indices(list_of_subspaces, subsystem_levels): composite indices
    - get_subspace_indices(subsystem_levels, subspace=range(2)): all-qubit subspace
    """
    if isinstance(subsystem_levels, int):
        levels = subsystem_levels
        subspace = list(subspaces)
        assert all(0 <= s < levels for s in subspace)
        return subspace
    subspaces = [list(s) for s in subspaces]
    assert len(subspaces) == len(subsystem_levels)
    labels = basis_labels(subsystem_levels)
    return [
        i for i, lbl in enumerate(labels)
        if all(l in subspaces[j] for j, l in enumerate(lbl))
    ]


def get_enr_subspace_indices(excitation_restriction: int, subsystem_levels):
    """Indices with total excitation number <= restriction."""
    labels = basis_labels(subsystem_levels)
    return [i for i, lbl in enumerate(labels) if sum(lbl) <= excitation_restriction]


def get_leakage_indices(subspace, levels: int):
    """Complement of the subspace."""
    sub = set(subspace)
    return [i for i in range(levels) if i not in sub]


def get_iso_vec_subspace_indices(subspace, levels: int):
    """Subspace indices in the 2*levels^2 operator iso-vec layout.

    Layout per column j: [Re(col j); Im(col j)] (see isomorphisms.py).
    """
    idx = []
    for sj in subspace:
        for si in subspace:
            idx.append(2 * levels * sj + si)
        for si in subspace:
            idx.append(2 * levels * sj + si + levels)
    return idx


def get_iso_vec_leakage_indices(subspace, levels: int):
    """Iso-vec indices of leakage entries in subspace *columns* (population that
    leaks out of the subspace under evolution of subspace initial states)."""
    leakage = get_leakage_indices(subspace, levels)
    idx = []
    for sj in subspace:
        for li in leakage:
            idx.append(2 * levels * sj + li)
        for li in leakage:
            idx.append(2 * levels * sj + li + levels)
    return idx


@dataclass(frozen=True)
class EmbeddedOperator:
    """An operator embedded in a subspace of a larger system.

    Fields mirror the reference (src/quantum/operators/embedded_operators.jl:70):
    `operator` is the full-space embedded matrix, `subspace` the embedding
    indices (0-based), `subsystem_levels` the per-subsystem dimensions.
    """

    operator: np.ndarray
    subspace: tuple[int, ...]
    subsystem_levels: tuple[int, ...]

    def __init__(self, subspace_operator, subspace=None, subsystem_levels=None,
                 *, levels: int | None = None):
        subspace_operator = np.asarray(subspace_operator, dtype=np.complex128)
        if levels is not None and subsystem_levels is None:
            subsystem_levels = [levels]
        if subsystem_levels is None:
            raise ValueError("subsystem_levels or levels required")
        if isinstance(subsystem_levels, int):
            subsystem_levels = [subsystem_levels]
        total = int(np.prod(subsystem_levels))
        if subspace is None:
            if len(subsystem_levels) > 1:
                # Composite default: the operator is a qubit-level gate
                # acting on every subsystem, each contributing a (0, 1)
                # qubit subspace (reference:
                # embedded_operators.jl:142-152).
                n = len(subsystem_levels)
                assert subspace_operator.shape[0] == 2 ** n, (
                    f"cannot infer subspace: operator dim "
                    f"{subspace_operator.shape[0]} != 2^{n}; pass "
                    f"subspace= explicitly")
                subspace = get_subspace_indices([[0, 1]] * n,
                                                subsystem_levels)
            else:
                subspace = range(subspace_operator.shape[0])
        subspace = tuple(int(s) for s in subspace)
        object.__setattr__(self, "operator",
                           embed(subspace_operator, subspace, total))
        object.__setattr__(self, "subspace", subspace)
        object.__setattr__(self, "subsystem_levels", tuple(int(l) for l in subsystem_levels))

    @property
    def levels(self) -> int:
        return self.operator.shape[0]

    def unembed(self) -> np.ndarray:
        return unembed(self.operator, self.subspace)

    def leakage_indices(self):
        return get_leakage_indices(self.subspace, self.levels)

    def iso_vec_subspace_indices(self):
        return get_iso_vec_subspace_indices(self.subspace, self.levels)

    def iso_vec_leakage_indices(self):
        return get_iso_vec_leakage_indices(self.subspace, self.levels)

    def __matmul__(self, other: "EmbeddedOperator") -> "EmbeddedOperator":
        assert self.subspace == other.subspace
        assert self.subsystem_levels == other.subsystem_levels
        return EmbeddedOperator(
            unembed(self.operator @ other.operator, self.subspace),
            self.subspace, self.subsystem_levels)


# --------------------------------------------------------------------------- #
# Lifting & direct sums
# --------------------------------------------------------------------------- #


def lift_operator(op: np.ndarray, index: int, subsystem_levels) -> np.ndarray:
    """Lift `op` acting on subsystem `index` to the full tensor-product space.

    reference: src/quantum/operators/lifted_operators.jl:3.
    """
    mats = [np.eye(l, dtype=np.complex128) for l in subsystem_levels]
    mats[index] = np.asarray(op, dtype=np.complex128)
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def direct_sum(*ops) -> np.ndarray:
    """Block-diagonal direct sum of operators."""
    if len(ops) == 1 and isinstance(ops[0], (list, tuple)):
        ops = tuple(ops[0])
    ops = [np.asarray(o) for o in ops]
    n = sum(o.shape[0] for o in ops)
    out = np.zeros((n, n), dtype=np.result_type(*[o.dtype for o in ops], np.complex128))
    i = 0
    for o in ops:
        k = o.shape[0]
        out[i:i + k, i:i + k] = o
        i += k
    return out


# --------------------------------------------------------------------------- #
# State / operator builders
# --------------------------------------------------------------------------- #


def operator_from_string(operator: str, lookup=None) -> np.ndarray:
    """Kron-reduce a string of single-character operator names (e.g. "XZ")."""
    lookup = PAULIS if lookup is None else lookup
    mats = [lookup[c] for c in operator]
    out = mats[-1]
    for m in reversed(mats[:-1]):
        out = np.kron(m, out)
    return out


_LEVEL_DICT = {"g": 0, "e": 1, "f": 2, "h": 3, "i": 4, "j": 5, "k": 6, "l": 7}


def ket_from_string(ket: str, levels, level_dict=None) -> np.ndarray:
    """Construct a ket from a string like "ge" or "(g+e)g" with per-subsystem levels."""
    level_dict = _LEVEL_DICT if level_dict is None else level_dict
    tokens: list[str] = []
    buf = ket
    for part in buf.replace(")", "(").split("("):
        if part == "":
            continue
        if "+" in part:
            tokens.append(part)
        else:
            tokens.extend(list(part))
    assert len(tokens) == len(levels), f"ket {ket!r} does not match levels {levels}"
    states = []
    for tok, l in zip(tokens, levels):
        if "+" in tok:
            comps = tok.split("+")
            vec = np.zeros(l, dtype=np.complex128)
            for c in comps:
                s = level_dict[c]
                assert s < l
                vec[s] += 1.0
            vec /= np.linalg.norm(vec)
        else:
            s = level_dict[tok]
            assert s < l
            vec = np.zeros(l, dtype=np.complex128)
            vec[s] = 1.0
        states.append(vec)
    out = np.array([1.0 + 0j])
    for s in states:
        out = np.kron(out, s)
    return out


def ket_from_bitstring(ket: str) -> np.ndarray:
    """State vector for a qubit system from a 0/1 bitstring."""
    assert all(c in "01" for c in ket)
    out = np.array([1.0 + 0j])
    for c in ket:
        out = np.kron(out, np.array([1, 0] if c == "0" else [0, 1], dtype=np.complex128))
    return out


def _as_rng(rng) -> np.random.Generator:
    return rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)


def haar_random(n: int, rng=None) -> np.ndarray:
    """Haar-random unitary via QR of a Ginibre matrix."""
    rng = _as_rng(rng)
    Z = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))) / np.sqrt(2)
    Q, R = np.linalg.qr(Z)
    lam = np.diag(R) / np.abs(np.diag(R))
    return Q * lam[None, :]


def haar_identity(n: int, radius: float, rng=None) -> np.ndarray:
    """Unitary near the identity: expm of a small random anti-Hermitian generator."""
    rng = _as_rng(rng)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Hm = (A + A.conj().T) / 2
    import scipy.linalg as sla

    return sla.expm(-1j * radius * Hm / np.linalg.norm(Hm))


def annihilate(levels: int) -> np.ndarray:
    """Bosonic annihilation operator truncated to `levels`."""
    return np.diag(np.sqrt(np.arange(1, levels, dtype=np.float64)), 1).astype(np.complex128)


def create(levels: int) -> np.ndarray:
    """Bosonic creation operator truncated to `levels`."""
    return annihilate(levels).conj().T


def number_op(levels: int) -> np.ndarray:
    """Number operator a† a."""
    return np.diag(np.arange(levels, dtype=np.float64)).astype(np.complex128)


def quad_op(levels: int) -> np.ndarray:
    """Quartic anharmonicity operator a† a† a a = n(n-1)."""
    n = np.arange(levels, dtype=np.float64)
    return np.diag(n * (n - 1)).astype(np.complex128)
