"""Complex <-> real isomorphisms for quantum states/operators.

The collocation NLP is real-valued; states are stored as real "iso"
vectors at the solver boundary while dynamics kernels compute with
native complex arrays (MXU-friendly). Conventions match the reference
exactly (reference: src/quantum/primitives/isomorphisms.jl):

- ket iso:        ``psi_tilde = [Re(psi); Im(psi)]``                    (2n,)
- operator iso-vec: column-major, per column ``[Re(col); Im(col)]``     (2n^2,)
- density iso-vec:  ``[Re(vec(rho)); Im(vec(rho))]``                    (2n^2,)
- compact density iso: Re upper triangle (col-major, j<=k) then
  Im strict upper triangle (col-major, j<k)                             (n^2,)
- iso(H) = [[Re H, -Im H], [Im H, Re H]];  G(H) = iso(-iH)

All functions are jnp-traceable and vmap over leading batch axes where
noted. Index maps / lift matrices are static numpy (trace-time constants).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "mat",
    "ket_to_iso",
    "iso_to_ket",
    "operator_to_iso_vec",
    "iso_vec_to_operator",
    "iso_vec_to_iso_operator",
    "iso_operator_to_iso_vec",
    "operator_to_iso_operator",
    "iso_operator_to_operator",
    "density_to_iso_vec",
    "iso_vec_to_density",
    "density_to_compact_iso",
    "compact_iso_to_density",
    "density_lift_matrix",
    "density_projection_matrix",
    "iso",
    "G",
    "H_from_G",
    "ad_vec",
    "iso_D",
    "var_G",
    "ket_to_bloch",
    "bloch_to_ket",
    "iso_inner",
    "iso_vec_inner",
    "operator_subspace_iso_indices",
    "apply_row_phase_iso",
]


def mat(x):
    """Reshape a (column-major) vectorized square matrix back to a matrix."""
    n = int(round(np.sqrt(x.shape[-1])))
    return jnp.swapaxes(x.reshape(*x.shape[:-1], n, n), -1, -2)


# --------------------------------------------------------------------------- #
# Kets
# --------------------------------------------------------------------------- #


def ket_to_iso(psi):
    """psi (…, n) complex -> (…, 2n) real: [Re; Im]."""
    return jnp.concatenate([jnp.real(psi), jnp.imag(psi)], axis=-1)


def iso_to_ket(psi_iso):
    """(…, 2n) real -> (…, n) complex."""
    n = psi_iso.shape[-1] // 2
    return psi_iso[..., :n] + 1j * psi_iso[..., n:]


# --------------------------------------------------------------------------- #
# Operators (unitaries)
# --------------------------------------------------------------------------- #


def operator_to_iso_vec(U):
    """U (…, n, n) complex -> (…, 2n^2) real, column-major [Re(col); Im(col)]."""
    cols = jnp.swapaxes(U, -1, -2)  # (…, n, n): cols[..., i, :] = U[..., :, i]
    blocks = jnp.concatenate([jnp.real(cols), jnp.imag(cols)], axis=-1)  # (…, n, 2n)
    return blocks.reshape(*U.shape[:-2], -1)


def iso_vec_to_operator(u_iso):
    """(…, 2n^2) real -> (…, n, n) complex."""
    n = int(round(np.sqrt(u_iso.shape[-1] // 2)))
    blocks = u_iso.reshape(*u_iso.shape[:-1], n, 2 * n)
    cols = blocks[..., :n] + 1j * blocks[..., n:]
    return jnp.swapaxes(cols, -1, -2)


def iso(Hm):
    """iso(H) = [[Re H, -Im H], [Im H, Re H]]  (…, n, n) -> (…, 2n, 2n)."""
    re, im = jnp.real(Hm), jnp.imag(Hm)
    top = jnp.concatenate([re, -im], axis=-1)
    bot = jnp.concatenate([im, re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def G(Hm):
    """Iso generator of -iH: G(H) = iso(-iH) (real 2n x 2n)."""
    return iso(-1j * Hm)


def H_from_G(Gm):
    """Inverse of G: recover complex H from the real iso generator."""
    n = Gm.shape[-1] // 2
    H_imag = Gm[..., :n, :n]
    H_real = -Gm[..., n:, :n]
    return H_real + 1j * H_imag


def iso_vec_to_iso_operator(u_iso):
    return iso(iso_vec_to_operator(u_iso))


def iso_operator_to_iso_vec(U_iso):
    return operator_to_iso_vec(iso_operator_to_operator(U_iso))


def operator_to_iso_operator(U):
    return iso(U)


def iso_operator_to_operator(U_iso):
    n = U_iso.shape[-1] // 2
    return U_iso[..., :n, :n] + 1j * U_iso[..., n:, :n]


# --------------------------------------------------------------------------- #
# Density matrices
# --------------------------------------------------------------------------- #


def density_to_iso_vec(rho):
    """rho (…, n, n) -> (…, 2n^2): [Re(vec(rho)); Im(vec(rho))] (col-major vec)."""
    v = jnp.swapaxes(rho, -1, -2).reshape(*rho.shape[:-2], -1)  # column-major vec
    return ket_to_iso(v)


def iso_vec_to_density(rho_iso):
    return mat(iso_to_ket(rho_iso))


@lru_cache(maxsize=None)
def _compact_indices(n: int):
    """Static index maps for the compact Hermitian iso (column-major)."""
    re_j, re_k = [], []
    for k in range(n):
        for j in range(k + 1):
            re_j.append(j)
            re_k.append(k)
    im_j, im_k = [], []
    for k in range(1, n):
        for j in range(k):
            im_j.append(j)
            im_k.append(k)
    return (
        np.array(re_j), np.array(re_k), np.array(im_j), np.array(im_k),
    )


def density_to_compact_iso(rho):
    """Hermitian rho (…, n, n) -> (…, n^2) compact real vector."""
    n = rho.shape[-1]
    re_j, re_k, im_j, im_k = _compact_indices(n)
    re_part = jnp.real(rho[..., re_j, re_k])
    im_part = jnp.imag(rho[..., im_j, im_k])
    return jnp.concatenate([re_part, im_part], axis=-1)


def compact_iso_to_density(x):
    """(…, n^2) compact real vector -> Hermitian (…, n, n) complex."""
    n = int(round(np.sqrt(x.shape[-1])))
    re_j, re_k, im_j, im_k = _compact_indices(n)
    n_re = len(re_j)
    re_vals = x[..., :n_re]
    im_vals = x[..., n_re:]
    rho = jnp.zeros((*x.shape[:-1], n, n), dtype=jnp.complex128
                    if x.dtype == jnp.float64 else jnp.complex64)
    rho = rho.at[..., re_j, re_k].add(re_vals)
    off = re_j != re_k
    rho = rho.at[..., re_k[off], re_j[off]].add(re_vals[..., off])
    rho = rho.at[..., im_j, im_k].add(1j * im_vals)
    rho = rho.at[..., im_k, im_j].add(-1j * im_vals)
    return rho


@lru_cache(maxsize=None)
def _density_lift_np(n: int) -> np.ndarray:
    """Lift L (2n^2, n^2): compact iso -> full density iso-vec, static."""
    n2 = n * n
    L = np.zeros((2 * n2, n2))
    re_j, re_k, im_j, im_k = _compact_indices(n)
    col = 0
    for j, k in zip(re_j, re_k):
        L[k * n + j, col] = 1.0          # Re(rho[j,k]) at vec pos k*n+j
        if j != k:
            L[j * n + k, col] = 1.0      # Re(rho[k,j]) symmetric
        col += 1
    for j, k in zip(im_j, im_k):
        L[n2 + k * n + j, col] = 1.0     # Im(rho[j,k])
        L[n2 + j * n + k, col] = -1.0    # Im(rho[k,j]) = -Im(rho[j,k])
        col += 1
    return L


@lru_cache(maxsize=None)
def _density_projection_np(n: int) -> np.ndarray:
    """Projection P (n^2, 2n^2): full density iso-vec -> compact iso; P @ L = I."""
    n2 = n * n
    P = np.zeros((n2, 2 * n2))
    re_j, re_k, im_j, im_k = _compact_indices(n)
    row = 0
    for j, k in zip(re_j, re_k):
        if j == k:
            P[row, k * n + j] = 1.0
        else:
            P[row, k * n + j] = 0.5
            P[row, j * n + k] = 0.5
        row += 1
    for j, k in zip(im_j, im_k):
        P[row, n2 + k * n + j] = 0.5
        P[row, n2 + j * n + k] = -0.5
        row += 1
    return P


def density_lift_matrix(n: int):
    return jnp.asarray(_density_lift_np(n))


def density_projection_matrix(n: int):
    return jnp.asarray(_density_projection_np(n))


# --------------------------------------------------------------------------- #
# Superoperators
# --------------------------------------------------------------------------- #


def ad_vec(Hm, anti: bool = False):
    """Vectorized adjoint action: I (x) H -+ H^T (x) I (commutator for anti=False)."""
    n = Hm.shape[-1]
    Id = jnp.eye(n, dtype=Hm.dtype)
    sign = 1.0 if anti else -1.0
    return jnp.kron(Id, Hm) + sign * jnp.kron(jnp.swapaxes(Hm, -1, -2), Id)


def iso_D(L):
    """Real iso of the Lindblad dissipator superoperator for jump operator L."""
    LdL = jnp.conj(L).T @ L
    return iso(jnp.kron(jnp.conj(L), L) - 0.5 * ad_vec(LdL, anti=True))


def var_G(Gm, G_vars):
    """Block-lower-triangular variational generator.

    var_G(G, [Ga, Gb]) = [[G, 0, 0], [Ga, G, 0], [Gb, 0, G]]
    (reference: src/quantum/primitives/isomorphisms.jl:410).
    """
    v = len(G_vars)
    n, m = Gm.shape[-2], Gm.shape[-1]
    out = jnp.kron(jnp.eye(v + 1, dtype=Gm.dtype), Gm)
    for i, Gv in enumerate(G_vars):
        out = out.at[..., (i + 1) * n:(i + 2) * n, :m].add(Gv)
    return out


# --------------------------------------------------------------------------- #
# Real-arithmetic iso kernels (TPU production path)
# --------------------------------------------------------------------------- #
# The collocation NLP must stay complex-free on TPU: the f64 x64 rewriter
# has no f64<->c128 conversions, and real f64 matmuls cost half their
# emulated-c128 equivalents. These helpers compute complex inner products
# / fidelities / phase rotations directly on iso vectors.


def iso_inner(x, y):
    """Complex inner product <x|y> = x^dag y of two ket isos.

    x, y (..., 2n) real -> (re, im) with batching over leading axes.
    """
    n = x.shape[-1] // 2
    xR, xI = x[..., :n], x[..., n:]
    yR, yI = y[..., :n], y[..., n:]
    re = jnp.sum(xR * yR + xI * yI, axis=-1)
    im = jnp.sum(xR * yI - xI * yR, axis=-1)
    return re, im


def iso_vec_inner(x, y):
    """tr(X^dag Y) = sum_j <col_j(X)|col_j(Y)> for operator iso-vecs.

    x, y (..., 2n^2) real -> (re, im).
    """
    n = int(round(np.sqrt(x.shape[-1] // 2)))
    xc = x.reshape(*x.shape[:-1], n, 2 * n)
    yc = y.reshape(*y.shape[:-1], n, 2 * n)
    re, im = iso_inner(xc, yc)
    return jnp.sum(re, axis=-1), jnp.sum(im, axis=-1)


@lru_cache(maxsize=None)
def _operator_subspace_iso_indices(n: int, subspace: tuple) -> np.ndarray:
    s = np.asarray(subspace)
    m = len(s)
    idx = np.empty(2 * m * m, dtype=np.int64)
    for jj, col in enumerate(s):
        for ii, row in enumerate(s):
            idx[2 * m * jj + ii] = 2 * n * col + row            # Re
            idx[2 * m * jj + m + ii] = 2 * n * col + n + row    # Im
    return idx


def operator_subspace_iso_indices(n: int, subspace) -> np.ndarray:
    """iso-vec indices such that x[idx] is the iso-vec of U[s, s]
    (an operator iso-vec of dimension len(s))."""
    return _operator_subspace_iso_indices(n, tuple(int(i) for i in subspace))


def apply_row_phase_iso(x, cos_t, sin_t):
    """Multiply row r of the underlying complex operator/ket by
    e^{i theta_r}, entirely in iso coordinates.

    Operator iso-vec x (2n^2,) with cos_t/sin_t (n,): equivalent to
    operator_to_iso_vec(diag(e^{i theta})[:, None] * U). Ket iso (2n,):
    equivalent to ket_to_iso(e^{i theta} * psi).
    """
    d = x.shape[-1]
    n = cos_t.shape[-1]
    ncols = d // (2 * n)
    b = x.reshape(*x.shape[:-1], ncols, 2, n)    # [col, (Re, Im), row]
    re = b[..., 0, :] * cos_t - b[..., 1, :] * sin_t
    im = b[..., 0, :] * sin_t + b[..., 1, :] * cos_t
    return jnp.stack([re, im], axis=-2).reshape(*x.shape[:-1], d)


# --------------------------------------------------------------------------- #
# Bloch sphere
# --------------------------------------------------------------------------- #


def ket_to_bloch(psi):
    """2-level ket -> unit Bloch vector."""
    rho = jnp.outer(psi, jnp.conj(psi))
    from .gates import PAULIS

    b = jnp.stack([
        jnp.real(jnp.trace(rho @ jnp.asarray(PAULIS[p]))) for p in ("X", "Y", "Z")
    ])
    return b / jnp.linalg.norm(b)


def bloch_to_ket(bloch):
    """Bloch vector -> ket (up to global phase)."""
    x, y, z = bloch[0], bloch[1], bloch[2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    return jnp.stack([
        jnp.cos(theta / 2) + 0j,
        jnp.exp(1j * phi) * jnp.sin(theta / 2),
    ])
