"""Block-tridiagonal KKT solves.

The per-iteration IPM KKT system is block-tridiagonal over the knot axis
(constraints touch adjacent knots only) — the structured replacement for
Ipopt's general sparse LDL^T (reference hot loop: SURVEY.md section 3.2).
Production backends:

- `condensed_factor`/`condensed_solve`: condensed dual Schur complement
  solved by block cyclic reduction (`cr_factor`/`cr_solve`) — O(log2 N)
  sequential depth, all batched matmuls (the TPU default).
- `qd_factor`/`qd_solve`: sequential quasidefinite block-tridiagonal
  recursion (O(N) scan; the reference implementation).

Conventions: diag [N, m, m], upper [N-1, m, m] with
S[k, k+1] = upper[k]; S[k+1, k] = upper[k]^T; rhs [N, m] or [N, m, r].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cr_factor",
    "cr_solve",
    "tri_lower_inv",
    "spd_inv",
    "psd_clamp",
    "qd_factor",
    "qd_solve",
    "condensed_factor",
    "condensed_solve",
]


# --------------------------------------------------------------------------- #
# Quasidefinite block-tridiagonal factorization (the TPU production path)
# --------------------------------------------------------------------------- #
#
# The inertia-regularized IPM KKT blocks are symmetric QUASIDEFINITE
# (Vanderbei): Dt_k = [[P_k, C_k^T], [C_k, -R_k]] with P_k > 0 (primal
# Hessian + barrier Sigma + inertia shift) and R_k > 0 (constraint-row
# regularization). Quasidefinite matrices factor stably WITHOUT pivoting,
# and the block-tridiagonal Schur recursion preserves the structure: the
# coupling U_k = [[0, 0], [Cnext_k, 0]] only corrects the primal block by
# Cnext^T (-(Dt^{-1})_{ll}) Cnext, and the (l, l) block of a quasidefinite
# inverse is negative definite, so the correction is PSD and P stays PD.
#
# Each block therefore factors with TWO CHOLESKYS (P_eff and the dual
# Schur complement S = R + C P_eff^{-1} C^T) instead of a pivoted dense
# LDL — replacing Ipopt's MUMPS/HSL pivoting (SURVEY.md section 3.2).
# Triangular factors are explicitly inverted with matmul-only nilpotent
# doubling so every solve is a batched matmul: this is both the
# MXU-friendly formulation and the only one that compiles in emulated
# float64 on TPU (LU / triangular_solve / eigh are f32-only there).


def tri_lower_inv(L):
    """Inverse of lower-triangular L [..., m, m] via nilpotent doubling.

    L = D(I + N) with N strictly lower (nilpotent, N^m = 0), so
    (I + N)^{-1} = prod_j (I + (-N)^(2^j)) — ceil(log2 m) matmuls,
    no triangular_solve / LU (unsupported in f64 on TPU).
    """
    import math

    m = L.shape[-1]
    eye = jnp.eye(m, dtype=L.dtype)
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    N = L / d[..., :, None] - eye              # strictly lower
    X = -N
    acc = eye + X
    p = X
    for _ in range(max(0, math.ceil(math.log2(max(m, 2))) - 1)):
        p = p @ p
        acc = acc + acc @ p
    return acc / d[..., None, :]               # (I+N)^{-1} D^{-1}


def _blocked_chol_inv(A):
    """Xi = L^{-1} for SPD A = L L^T via recursive 2x2 blocking.

    XLA lowers `jnp.linalg.cholesky` on small batched blocks to a
    sequential column loop (~20x the cost of a same-shape matmul on TPU
    — PROFILE.md). This recursion is matmul-only: closed forms at
    m <= 2, then

        Xi11 = chol_inv(A11);     T = A21 Xi11^T   (= L21)
        Xi22 = chol_inv(A22 - T T^T)
        Xi21 = -Xi22 (T Xi11)

    Depth ceil(log2 m); every level is a few batched matmuls. sqrt of a
    negative pivot yields NaN, preserving the PD-test contract.
    """
    m = A.shape[-1]
    if m == 0:
        return A
    if m == 1:
        return 1.0 / jnp.sqrt(A)
    if m == 2:
        a = A[..., 0, 0]
        b = A[..., 1, 0]
        c = A[..., 1, 1]
        l11 = jnp.sqrt(a)
        l21 = b / l11
        l22 = jnp.sqrt(c - l21 * l21)
        i11 = 1.0 / l11
        i22 = 1.0 / l22
        i21 = -l21 * i11 * i22
        z = jnp.zeros_like(a)
        return jnp.stack([
            jnp.stack([i11, z], axis=-1),
            jnp.stack([i21, i22], axis=-1),
        ], axis=-2)
    p = m // 2
    X1 = _blocked_chol_inv(A[..., :p, :p])
    T = A[..., p:, :p] @ jnp.swapaxes(X1, -1, -2)
    S = A[..., p:, p:] - T @ jnp.swapaxes(T, -1, -2)
    X2 = _blocked_chol_inv(S)
    X21 = -X2 @ (T @ X1)
    top = jnp.concatenate(
        [X1, jnp.zeros((*X1.shape[:-2], p, m - p), A.dtype)], axis=-1)
    bot = jnp.concatenate([X21, X2], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_inv_factor(A):
    """Xi with A^{-1} = Xi^T @ Xi for SPD A [..., m, m].

    Jacobi-equilibrated (unit diagonal) before the factorization so it
    stays accurate in float32 even when barrier terms give the diagonal
    a huge dynamic range (Sigma ~ mu/gap^2 near active bounds). Returns
    NaNs if A is not numerically PD (negative pivot -> sqrt -> NaN) —
    callers use this as the PD test. Matmul-only (recursive-block
    Cholesky inverse, `_blocked_chol_inv`): no linalg.cholesky /
    triangular_solve anywhere.
    """
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-300))
    As = A / d[..., :, None] / d[..., None, :]
    Li = _blocked_chol_inv(As)
    return Li / d[..., None, :]


def spd_inv(A):
    """Explicit inverse of SPD A via `chol_inv_factor` (NaN if not PD)."""
    Xi = chol_inv_factor(A)
    return jnp.swapaxes(Xi, -1, -2) @ Xi


def psd_clamp(W, floor_rel, iters: int = 32, mode: str = "pos"):
    """Matmul-only PSD convexification of symmetric W [..., n, n].

    mode="pos": approximately U max(lam, 0) U^T + floor*I — drops
    negative curvature (negative-curvature directions become ~flat, so
    steps along them are limited only by the floor).
    mode="abs": saddle-free |W| = U |lam| U^T + floor*I (Dauphin et al.
    2014) — negative curvature becomes positive stiffness of the SAME
    magnitude, so the Newton system is damped per-knot and per-direction
    exactly where the Lagrangian is concave, and is EXACT wherever the
    Hessian is PSD. Round-5 diagnostics: "pos" makes the dual residual
    creep on strongly nonconvex fidelity landscapes (the flat model
    keeps re-exciting negative directions), and a uniform inertia shift
    must damp every knot to fix the worst one; |W| fixes both.

    Both via the Newton-Schulz matrix-sign iteration S <- 1.5 S - 0.5 S^3
    (sign(W) = U sign(lam) U^T, |W| = sign(W) W): the TPU-native
    replacement for an eigendecomposition — no eigh anywhere, ~2*iters
    batched matmuls.

    Eigenvalues below ~1.5^-iters of the spectral bound s are only
    partially resolved by the sign iteration (small x grows as 1.5^k);
    their clamped value can remain as negative as ~ -|lam|/2 <
    0.5 * 1.5^-iters * s, so the effective floor is
    max(floor_rel, 0.5 * 1.5^-iters) * max(1, s) — PD by construction.
    """
    n = W.shape[-1]
    s = jnp.max(jnp.sum(jnp.abs(W), axis=-1), axis=-1)   # inf-norm >= rho(W)
    s = jnp.maximum(s, 1e-30)
    Y = W / s[..., None, None]

    def step(S, _):
        return 1.5 * S - 0.5 * S @ S @ S, None

    S, _ = jax.lax.scan(step, Y, None, length=iters)
    absW = S @ Y                                         # |W| / s
    Wpd = absW if mode == "abs" else 0.5 * (Y + absW)
    Wpd = 0.5 * (Wpd + jnp.swapaxes(Wpd, -1, -2)) * s[..., None, None]
    floor = jnp.maximum(floor_rel, 0.5 * 1.5 ** (-iters)) \
        * jnp.maximum(1.0, s)
    eye = jnp.eye(n, dtype=W.dtype)
    return Wpd + floor[..., None, None] * eye


def qd_factor(P, C, Rdiag, Cnext):
    """Factor the quasidefinite block-tridiagonal KKT.

    Blocks: Dt_k = [[P_k, C_k^T], [C_k, -diag(Rdiag_k)]], coupling
    S[k, k+1] = [[0, 0], [Cnext_k, 0]] (constraint rows of knot k touch
    z_{k+1}).

    P [N, dz, dz], C [N, m, dz], Rdiag [N, m], Cnext [N-1, m, dz].
    Returns (Pinv [N, dz, dz], Sinv [N, m, m]) with P effective
    (Schur-updated along the knot recursion). NaNs signal a non-PD P_eff
    (exact-Hessian direction rejected by the caller).
    """
    N, m, dz = C.shape

    def block(P_eff, C_k, R_k):
        # Gram-structured Schur complement: S = Y Y^T + diag(R) with
        # Y = C L^{-T} is numerically PSD by construction (a floating-
        # point Gram product's error is bounded relative to its own
        # diagonal), unlike C Pinv C^T via the explicit inverse, whose
        # rounding (~eps * ||C||^2 * ||Pinv||) pushes tiny eigenvalues
        # negative and NaNs the Cholesky when P is ill-conditioned.
        Xi = chol_inv_factor(P_eff)                   # Pinv = Xi^T Xi
        Pinv = jnp.swapaxes(Xi, -1, -2) @ Xi
        Y = C_k @ jnp.swapaxes(Xi, -1, -2)
        S = Y @ jnp.swapaxes(Y, -1, -2)
        S = S.at[jnp.arange(m), jnp.arange(m)].add(R_k)
        Zi = chol_inv_factor(0.5 * (S + jnp.swapaxes(S, -1, -2)))
        Sinv = jnp.swapaxes(Zi, -1, -2) @ Zi
        return Pinv, Sinv, Zi

    Pinv0, Sinv0, Zi0 = block(P[0], C[0], Rdiag[0])
    if N == 1:
        return Pinv0[None], Sinv0[None]

    def step(carry, inputs):
        Zi_prev = carry
        P_k, C_k, R_k, Cn_prev = inputs
        # P_eff = P + Cn^T Sinv Cn as a Gram product (same PSD argument)
        W = Zi_prev @ Cn_prev
        P_eff = P_k + jnp.swapaxes(W, -1, -2) @ W
        Pinv, Sinv, Zi = block(P_eff, C_k, R_k)
        return Zi, (Pinv, Sinv)

    _, (Pinvs, Sinvs) = jax.lax.scan(
        step, Zi0, (P[1:], C[1:], Rdiag[1:], Cnext))
    return (jnp.concatenate([Pinv0[None], Pinvs], axis=0),
            jnp.concatenate([Sinv0[None], Sinvs], axis=0))


def _qd_block_apply(Pinv, Sinv, C, a, b):
    """Apply Dt^{-1} to (a [dz(,r)], b [m(,r)]) for one knot:
    x = Pinv(a - C^T y), y = Sinv(C Pinv a - b)."""
    t = Pinv @ a
    y = Sinv @ (C @ t - b)
    x = t - Pinv @ (jnp.swapaxes(C, -1, -2) @ y)
    return x, y


def qd_solve(factors, C, Cnext, rhs, dz):
    """Solve the quasidefinite block-tridiagonal system.

    factors from `qd_factor`; rhs [N, mb] or [N, mb, r] ordered (z, lam)
    per knot. All operations are batched matmuls.
    """
    Pinv, Sinv = factors
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    N = rhs.shape[0]

    # forward sweep: y_k = r_k - U_{k-1}^T Dt_{k-1}^{-1} y_{k-1}
    # (U^T w)_z = Cnext^T w_lam, zero on lam rows.
    def fwd(y_prev, inputs):
        r_k, Pinv_p, Sinv_p, C_p, Cn_p = inputs
        _, w_lam = _qd_block_apply(Pinv_p, Sinv_p, C_p,
                                   y_prev[:dz], y_prev[dz:])
        y_k = r_k.at[:dz].add(-jnp.swapaxes(Cn_p, -1, -2) @ w_lam)
        return y_k, y_k

    if N == 1:
        ys = rhs
    else:
        _, rest = jax.lax.scan(
            fwd, rhs[0],
            (rhs[1:], Pinv[:-1], Sinv[:-1], C[:-1], Cnext))
        ys = jnp.concatenate([rhs[0][None], rest], axis=0)

    # backward sweep: x_k = Dt_k^{-1} (y_k - U_k x_{k+1});
    # (U x)_lam = Cnext_k x_{z, k+1}.
    xz_l, xl_l = _qd_block_apply(Pinv[-1], Sinv[-1], C[-1],
                                 ys[-1][:dz], ys[-1][dz:])
    x_last = jnp.concatenate([xz_l, xl_l], axis=0)

    def bwd(x_next, inputs):
        y_k, Pinv_k, Sinv_k, C_k, Cn_k = inputs
        b_corr = y_k[dz:] - Cn_k @ x_next[:dz]
        xz, xl = _qd_block_apply(Pinv_k, Sinv_k, C_k, y_k[:dz], b_corr)
        x_k = jnp.concatenate([xz, xl], axis=0)
        return x_k, x_k

    if N == 1:
        xs = x_last[None]
    else:
        _, rest = jax.lax.scan(
            bwd, x_last, (ys[:-1], Pinv[:-1], Sinv[:-1], C[:-1], Cnext),
            reverse=True)
        xs = jnp.concatenate([rest, x_last[None]], axis=0)
    return xs[..., 0] if squeeze else xs


# --------------------------------------------------------------------------- #
# Cyclic-reduction factorization (the TPU production KKT path)
# --------------------------------------------------------------------------- #
#
# The IPM hot loop is LATENCY-bound on TPU, not FLOP-bound: the per-knot
# blocks are tiny (m ~ 24) and a sequential Thomas scan issues O(N) tiny
# kernels back to back. Cyclic reduction re-orders the same elimination
# into O(log2 N) levels, each level a fully batched matmul over all knots
# at once — ~6 sequential steps instead of ~50 for N = 50, and the level
# structure maps 1:1 onto a knot-sharded multi-chip solve (each level's
# neighbor exchange is a ppermute; SURVEY.md section 5.7).
#
# `cr_factor` stores, per level, the Cholesky-inverse factors of the odd
# diagonal blocks plus the left/right couplings, so repeated solves
# (Newton + SOC + iterative refinement) reuse the factorization — the
# analogue of Ipopt re-using its sparse LDL^T across rhs.


def _pow2_pad(N: int) -> int:
    import math
    return 1 << max(0, math.ceil(math.log2(max(N, 1))))


def cr_factor(D, U):
    """Cyclic-reduction factorization of an SPD block-tridiagonal matrix.

    D [N, m, m] diagonal blocks, U [N-1, m, m] with S[k, k+1] = U[k],
    S[k+1, k] = U[k]^T. Returns an opaque factor object for `cr_solve`.
    NaNs propagate if a reduced diagonal block is not numerically PD —
    callers use this to reject a direction (same contract as qd_factor).

    Algebra per level (n rows, padded to a power of two with identity
    blocks): odd rows 2j+1 are eliminated. With Dinv_j = inverse of the
    odd diagonal D[2j+1], Ul[j] = U[2j] (S[2j, 2j+1]) and Ur[j] = U[2j+1]
    (S[2j+1, 2j+2]; zero at the last slot), the even rows reduce to

        D'[j] = D[2j] - Ur[j-1]^T Dinv_{j-1} Ur[j-1] - Ul[j] Dinv_j Ul[j]^T
        U'[j] = -Ul[j] Dinv_j Ur[j]

    All corrections are Gram products through the Cholesky-inverse
    factor Xi (Dinv = Xi^T Xi), so the reduced system stays numerically
    SPD (same argument as qd_factor).
    """
    N, m, _ = D.shape
    Np = _pow2_pad(N)
    dt = D.dtype
    if Np > N:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=dt), (Np - N, m, m))
        D = jnp.concatenate([D, eye], axis=0)
    # pad U to length Np with zeros; convention U[n-1] = 0 at every level
    U = jnp.concatenate(
        [U, jnp.zeros((Np - U.shape[0], m, m), dt)], axis=0)

    levels = []
    n = Np
    while n > 1:
        Xi = chol_inv_factor(D[1::2])               # [n/2] odd-block inverses
        Ul = U[0::2]                                # Ul[j] = U[2j]
        Ur = U[1::2]                                # Ur[j] = U[2j+1] (last = 0)
        Gl = Xi @ jnp.swapaxes(Ul, -1, -2)          # Gl^T Gl = Ul Dinv Ul^T
        Gr = Xi @ Ur                                # Gr^T Gr = Ur^T Dinv Ur
        Gr_s = jnp.concatenate(
            [jnp.zeros((1, m, m), dt), Gr[:-1]], axis=0)
        D = D[0::2] - jnp.swapaxes(Gr_s, -1, -2) @ Gr_s \
            - jnp.swapaxes(Gl, -1, -2) @ Gl
        # U'[j] = -Ul[j] Dinv_j Ur[j]; the last slot is zero automatically
        # because Ur[last] = 0, preserving the padding convention.
        U = -jnp.swapaxes(Gl, -1, -2) @ Gr
        levels.append((Xi, Ul, Ur))
        n //= 2
    Xi_root = chol_inv_factor(D[0])
    # all-array pytree (no static metadata) so factor objects can pass
    # through vmap/scan/jnp.where selection; cr_solve infers N from the
    # rhs and the padded size from the level count.
    return (levels, Xi_root)


def cr_solve(factors, rhs):
    """Solve S x = rhs with factors from `cr_factor`.

    rhs [N, m] or [N, m, r]; returns the same shape. Pure batched
    matmuls, O(log2 N) sequential levels.
    """
    levels, Xi_root = factors
    N = rhs.shape[0]
    Np = 1 << len(levels)
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    m, r = rhs.shape[-2], rhs.shape[-1]
    dt = rhs.dtype
    if Np > N:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Np - N, m, r), dt)], axis=0)

    # reduce: fold odd rows into even rows, level by level.
    # Even row 2j collects -Ur[j-1]^T Dinv_{j-1} r_odd[j-1] (left odd
    # neighbor) and -Ul[j] Dinv_j r_odd[j] (right odd neighbor).
    reduced = []                        # per-level odd rhs (for backsub)
    for (Xi, Ul, Ur) in levels:
        r_odd = rhs[1::2]
        reduced.append(r_odd)
        t = jnp.swapaxes(Xi, -1, -2) @ (Xi @ r_odd)   # Dinv r_odd
        Ur_s = jnp.concatenate(
            [jnp.zeros((1, m, m), dt), Ur[:-1]], axis=0)
        t_s = jnp.concatenate(
            [jnp.zeros((1, m, r), dt), t[:-1]], axis=0)
        rhs = rhs[0::2] - jnp.swapaxes(Ur_s, -1, -2) @ t_s - Ul @ t

    x = jnp.swapaxes(Xi_root, -1, -2) @ (Xi_root @ rhs[0])
    x = x[None]                                       # [1, m, r]

    # back-substitute: x_odd[j] = Dinv_j (r_odd - Ul^T x_{2j} - Ur x_{2j+2})
    for (Xi, Ul, Ur), r_odd in zip(reversed(levels), reversed(reduced)):
        n2 = r_odd.shape[0]                           # odd count at level
        x_right = jnp.concatenate(
            [x[1:], jnp.zeros((1, m, r), dt)], axis=0)
        b = r_odd - jnp.swapaxes(Ul, -1, -2) @ x - Ur @ x_right
        x_odd = jnp.swapaxes(Xi, -1, -2) @ (Xi @ b)
        x = jnp.stack([x, x_odd], axis=1).reshape(2 * n2, m, r)
    x = x[:N]
    return x[..., 0] if squeeze else x


# --------------------------------------------------------------------------- #
# Condensed (dual Schur complement) KKT via cyclic reduction
# --------------------------------------------------------------------------- #
#
# The per-iteration IPM KKT with per-knot blocks [[P_k, C_k^T],
# [C_k, -diag(R_k)]] and coupling Cnext (constraint rows of knot k touch
# z_{k+1}) condenses, when every P_k is PD, onto the SPD block-tridiag
# DUAL system
#     S[k,k]   = C_k Pinv_k C_k^T + Cn_k Pinv_{k+1} Cn_k^T + diag(R_k)
#     S[k,k+1] = Cn_k Pinv_{k+1} C_{k+1}^T
# which cyclic reduction solves in O(log N) batched steps. All P_k
# inversions are ONE batched Cholesky (no knot recursion at all), so the
# whole factorization has sequential depth ~log2 N instead of ~2N.
# P_k PD is exactly the Ipopt inertia condition the IPM enforces with its
# adaptive delta_w shift; a NaN Cholesky rejects the direction.


def condensed_factor(P, C, Rdiag, Cnext):
    """Factor the condensed KKT. P [N, dz, dz] (must be PD), C [N, m, dz],
    Rdiag [N, m] (> 0), Cnext [N-1, m, dz]."""
    N, m, dz = C.shape
    dt = P.dtype
    Xi = chol_inv_factor(P)                         # [N, dz, dz]
    XiT = jnp.swapaxes(Xi, -1, -2)
    Y = C @ XiT                                     # [N, m, dz]
    Yn = Cnext @ XiT[1:] if N > 1 else jnp.zeros((0, m, dz), dt)
    D = Y @ jnp.swapaxes(Y, -1, -2)
    if N > 1:
        D = D.at[:-1].add(Yn @ jnp.swapaxes(Yn, -1, -2))
    D = D.at[:, jnp.arange(m), jnp.arange(m)].add(Rdiag)
    U = Yn @ jnp.swapaxes(Y[1:], -1, -2) if N > 1 \
        else jnp.zeros((0, m, m), dt)
    cr = cr_factor(D, U)
    return (Xi, cr)


def condensed_solve(factors, C, Cnext, rhs, dz):
    """Solve the full KKT system given `condensed_factor` output.

    rhs [N, mb(, r)] ordered (z, lam) per knot, mb = dz + m.
    Returns the same shape.
    """
    Xi, cr = factors
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    N = rhs.shape[0]
    rz, rc = rhs[:, :dz], rhs[:, dz:]
    XiT = jnp.swapaxes(Xi, -1, -2)
    t = XiT @ (Xi @ rz)                             # Pinv rz  [N, dz, r]
    b = C @ t - rc
    if N > 1:
        b = b.at[:-1].add(Cnext @ t[1:])
    lam = cr_solve(cr, b)                           # [N, m, r]
    w = rz - jnp.swapaxes(C, -1, -2) @ lam
    if N > 1:
        w = w.at[1:].add(-jnp.swapaxes(Cnext, -1, -2) @ lam[:-1])
    z = XiT @ (Xi @ w)
    out = jnp.concatenate([z, lam], axis=1)
    return out[..., 0] if squeeze else out
