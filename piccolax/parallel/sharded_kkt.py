"""Knot-sharded block-tridiagonal KKT solves (sequence parallelism).

The reference handles long horizons with sparse factorizations inside a
single Ipopt process (SURVEY.md section 5.7); the TPU-native equivalent
shards the KNOT axis of the block-tridiagonal KKT system across devices
and solves with ICI collectives. Two design options exist:

1. distributed cyclic reduction — log2(N) ppermute rounds (one neighbor
   exchange per level);
2. Schur-interface partitioning (SPIKE / partitioned Thomas) — each
   device eliminates its INTERIOR rows locally (using the in-device
   cyclic reduction `solver/kkt.py:cr_factor`), then ONE `all_gather`
   assembles the tiny interface system (2 blocks per device), which every
   device solves redundantly before back-substituting locally.

We ship (2): on TPU the per-level blocks are tiny (m ~ 8-32) so a
collective ROUND costs far more than the redundant interface math —
one all_gather of 2*n_dev m x m blocks beats log2(N) ppermute rounds of
the same data. The interface system is itself block-tridiagonal and is
solved with the same `cr_factor`/`cr_solve`.

Partition math (device d owns L = N/n_dev contiguous rows
[f, i_1..i_{L-2}, l]; T = the SPD interior block):

    reduced D_f  = D_f - U_f (T^{-1})_{1,1}   U_f^T
    reduced D_l  = D_l - U_l^T (T^{-1})_{k,k} U_l
    reduced U_fl = -U_f (T^{-1})_{1,k} U_l          (f-l coupling, k=L-2)
    cross-device coupling S[l_d, f_{d+1}] = the original boundary upper
    reduced r_f  = r_f - U_f   (T^{-1} r_int)_1
    reduced r_l  = r_l - U_l^T (T^{-1} r_int)_k
    back-substitution: x_int = T^{-1}(r_int - U_f^T x_f e_1 - U_l x_l e_k)

All local solves are batched matmuls through `cr_factor` products, so the
whole path stays MXU-friendly; the only communication is one all_gather
(and the final result already lives sharded).

Requires N divisible by n_dev and N/n_dev >= 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.kkt import chol_inv_factor, cr_factor, cr_solve

__all__ = [
    "sharded_spd_tridiag_solve",
    "batched_sharded_spd_tridiag_solve",
    "spd_tridiag_solve_ref",
    "knot_condensed_factor",
    "knot_condensed_solve",
]


def spd_tridiag_solve_ref(diag, upper, rhs):
    """Single-device reference: S x = rhs via in-device cyclic reduction."""
    return cr_solve(cr_factor(diag, upper), rhs)


def _local_partition_solve(diag, upper, rhs, axis_name: str):
    """shard_map body: diag [L, m, m], upper [L, m, m] (entry L-1 is the
    coupling to the NEXT device's first row; zero on the last device),
    rhs [L, m, r]. Returns x [L, m, r]."""
    L, m, _ = diag.shape
    r = rhs.shape[-1]
    dt = diag.dtype
    n_dev = jax.lax.psum(1, axis_name)

    # interior rows 1..L-2 form an SPD block-tridiagonal system T
    T_diag = diag[1:L - 1]
    T_upper = upper[1:L - 2]
    fT = cr_factor(T_diag, T_upper)

    U_f = upper[0]            # S[f, i_1]
    U_l = upper[L - 2]        # S[i_k, l]
    U_x = upper[L - 1]        # S[l, f_next] (zero on the last device)

    # T^{-1} applied to the two boundary coupling columns + interior rhs
    k = L - 2                 # number of interior rows
    cols = jnp.zeros((k, m, 2 * m + r), dt)
    cols = cols.at[0, :, :m].set(U_f.T)          # e_1 (x) U_f^T
    cols = cols.at[k - 1, :, m:2 * m].set(U_l)   # e_k (x) U_l
    cols = cols.at[:, :, 2 * m:].set(rhs[1:L - 1])
    sol = cr_solve(fT, cols)                     # [k, m, 2m + r]
    Tinv_Uf = sol[:, :, :m]                      # (T^{-1} e_1 U_f^T)
    Tinv_Ul = sol[:, :, m:2 * m]
    Tinv_r = sol[:, :, 2 * m:]

    # reduced 2x2-per-device interface blocks
    Df = diag[0] - U_f @ Tinv_Uf[0]
    Dl = diag[L - 1] - U_l.T @ Tinv_Ul[k - 1]
    Ufl = -U_f @ Tinv_Ul[0]                      # S_red[f, l]
    rf = rhs[0] - U_f @ Tinv_r[0]
    rl = rhs[L - 1] - U_l.T @ Tinv_r[k - 1]

    # assemble the global interface system (2 rows per device):
    # diag: [Df, Dl] per device; upper couplings alternate [Ufl, U_x]
    d_loc = jnp.stack([Df, Dl])                  # [2, m, m]
    u_loc = jnp.stack([Ufl, U_x])                # [2, m, m]
    r_loc = jnp.stack([rf, rl])                  # [2, m, r]
    d_all = jax.lax.all_gather(d_loc, axis_name).reshape(2 * n_dev, m, m)
    u_all = jax.lax.all_gather(u_loc, axis_name).reshape(2 * n_dev, m, m)
    r_all = jax.lax.all_gather(r_loc, axis_name).reshape(2 * n_dev, m, r)
    # redundant tiny solve on every device (2*n_dev blocks)
    x_if = cr_solve(cr_factor(d_all, u_all[:-1]), r_all)

    idx = jax.lax.axis_index(axis_name)
    x_f = jax.lax.dynamic_index_in_dim(x_if, 2 * idx, keepdims=False)
    x_l = jax.lax.dynamic_index_in_dim(x_if, 2 * idx + 1, keepdims=False)
    # the LAST device's l row also needs its right neighbor... it has
    # none; interior back-substitution needs x of the PREVIOUS row only
    # within the chunk, both of which are local (f and l).
    b_int = rhs[1:L - 1]
    b_int = b_int.at[0].add(-U_f.T @ x_f)
    b_int = b_int.at[k - 1].add(-U_l @ x_l)
    x_int = cr_solve(fT, b_int)
    return jnp.concatenate([x_f[None], x_int, x_l[None]], axis=0)


# --------------------------------------------------------------------------- #
# Knot-sharded condensed KKT (factor once, solve many) — the IPM's
# kkt_backend="knot". Same algebra as solver/kkt.py:condensed_factor/
# condensed_solve, with the knot axis sharded over a device mesh:
# neighbor data (the k+1 Cholesky factor / solution halo) moves with ONE
# non-wrapping ppermute per sweep, and the tiny interface system (2 rows
# per device) is assembled with ONE all_gather and solved redundantly.
# --------------------------------------------------------------------------- #


def _swap(a):
    return jnp.swapaxes(a, -1, -2)


def _perm_up(n_dev):
    """Send my first row to my LEFT neighbor (devices d -> d-1); the last
    device receives zeros (matches the zero-padded Cnext convention)."""
    return [(d, d - 1) for d in range(1, n_dev)]


def _perm_down(n_dev):
    """Send my last row to my RIGHT neighbor; device 0 receives zeros."""
    return [(d, d + 1) for d in range(n_dev - 1)]


def _knot_factor_body(Pm, C, R, Cn, axis_name):
    """shard_map body. Local chunk: Pm [L, dz, dz], C [L, m, dz],
    R [L, m], Cn [L, m, dz] (entry L-1 couples to the NEXT device's first
    knot; zero on the last device). Returns (sharded, replicated) factor
    pytrees."""
    L, m, dz = C.shape
    dt = Pm.dtype
    n_dev = jax.lax.psum(1, axis_name)
    Xi = chol_inv_factor(Pm)                       # [L, dz, dz]
    XiT = _swap(Xi)
    # halo: XiT and Y of the NEXT device's first knot
    XiT_halo = jax.lax.ppermute(XiT[:1], axis_name, _perm_up(n_dev))
    XiT_next = jnp.concatenate([XiT[1:], XiT_halo], axis=0)
    Y = C @ XiT                                    # [L, m, dz]
    Y_halo = jax.lax.ppermute(Y[:1], axis_name, _perm_up(n_dev))
    Y_next = jnp.concatenate([Y[1:], Y_halo], axis=0)
    Yn = Cn @ XiT_next                             # zero at the global end
    D = Y @ _swap(Y) + Yn @ _swap(Yn)
    D = D.at[:, jnp.arange(m), jnp.arange(m)].add(R)
    U = Yn @ _swap(Y_next)                         # [L, m, m]; U[-1]=0 at end

    # SPIKE partition: interior rows 1..L-2 factored locally
    k = L - 2
    fT = cr_factor(D[1:L - 1], U[1:L - 2])
    U_f, U_l, U_x = U[0], U[L - 2], U[L - 1]
    cols = jnp.zeros((k, m, 2 * m), dt)
    cols = cols.at[0, :, :m].set(U_f.T)
    cols = cols.at[k - 1, :, m:].set(U_l)
    sol = cr_solve(fT, cols)
    Tinv_Uf, Tinv_Ul = sol[:, :, :m], sol[:, :, m:]
    Df = D[0] - U_f @ Tinv_Uf[0]
    Dl = D[L - 1] - U_l.T @ Tinv_Ul[k - 1]
    Ufl = -U_f @ Tinv_Ul[0]
    d_all = jax.lax.all_gather(
        jnp.stack([Df, Dl]), axis_name).reshape(2 * n_dev, m, m)
    u_all = jax.lax.all_gather(
        jnp.stack([Ufl, U_x]), axis_name).reshape(2 * n_dev, m, m)
    f_if = cr_factor(d_all, u_all[:-1])            # redundant on every device

    sharded = dict(Xi=Xi, C=C, Cn=Cn, fT=fT,
                   Tinv_Uf=Tinv_Uf, Tinv_Ul=Tinv_Ul,
                   U_f=U_f[None], U_l=U_l[None])
    return sharded, dict(f_if=f_if)


def _knot_solve_body(sharded, replicated, rhs, axis_name, dz):
    """shard_map body: rhs [L, dz+m, r] local chunk -> x same shape."""
    Xi, C, Cn = sharded["Xi"], sharded["C"], sharded["Cn"]
    fT = sharded["fT"]
    Tinv_Uf, Tinv_Ul = sharded["Tinv_Uf"], sharded["Tinv_Ul"]
    U_f, U_l = sharded["U_f"][0], sharded["U_l"][0]
    f_if = replicated["f_if"]
    L, m, _ = C.shape
    k = L - 2
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    XiT = _swap(Xi)

    rz, rc = rhs[:, :dz], rhs[:, dz:]
    t = XiT @ (Xi @ rz)                            # Pinv rz  [L, dz, r]
    t_halo = jax.lax.ppermute(t[:1], axis_name, _perm_up(n_dev))
    t_next = jnp.concatenate([t[1:], t_halo], axis=0)
    b = C @ t - rc + Cn @ t_next                   # dual rhs [L, m, r]

    # partitioned tridiagonal solve
    r_sol = cr_solve(fT, b[1:L - 1])
    rf = b[0] - U_f @ r_sol[0]
    rl = b[L - 1] - U_l.T @ r_sol[k - 1]
    r_all = jax.lax.all_gather(
        jnp.stack([rf, rl]), axis_name).reshape(2 * n_dev, m, -1)
    x_if = cr_solve(f_if, r_all)
    x_f = jax.lax.dynamic_index_in_dim(x_if, 2 * idx, keepdims=False)
    x_l = jax.lax.dynamic_index_in_dim(x_if, 2 * idx + 1, keepdims=False)
    x_int = r_sol - Tinv_Uf @ x_f - Tinv_Ul @ x_l
    lam = jnp.concatenate([x_f[None], x_int, x_l[None]], axis=0)

    # back-substitute the primal block: w = rz - C^T lam - Cnext^T lam_prev
    w = rz - _swap(C) @ lam
    lam_halo = jax.lax.ppermute(lam[-1:], axis_name, _perm_down(n_dev))
    Cn_halo = jax.lax.ppermute(Cn[-1:], axis_name, _perm_down(n_dev))
    lam_prev = jnp.concatenate([lam_halo, lam[:-1]], axis=0)
    Cn_prev = jnp.concatenate([Cn_halo, Cn[:-1]], axis=0)
    w = w - _swap(Cn_prev) @ lam_prev
    z = XiT @ (Xi @ w)
    return jnp.concatenate([z, lam], axis=1)


def knot_condensed_factor(Pm, C, Rdiag, Cnext, mesh: Mesh,
                          axis_name: str = "knot"):
    """Knot-sharded `condensed_factor`: factor the condensed KKT with the
    knot axis sharded over `mesh`'s `axis_name`. Pm [N, dz, dz] (must be
    PD), C [N, m, dz], Rdiag [N, m], Cnext [N-1, m, dz]. N divisible by
    n_dev, N/n_dev >= 3. Returns an opaque (sharded, replicated) factor
    pair for `knot_condensed_solve` — reusable across right-hand sides
    exactly like `condensed_factor`."""
    N, m, dz = C.shape
    n_dev = mesh.shape[axis_name]
    if N % n_dev or N // n_dev < 3:
        raise ValueError(
            f"N={N} must be divisible by n_dev={n_dev} with chunks >= 3")
    Cn_p = jnp.concatenate(
        [Cnext, jnp.zeros((1, m, dz), Cnext.dtype)], axis=0)
    body = functools.partial(_knot_factor_body, axis_name=axis_name)
    spec = P(axis_name)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec, spec),
                       out_specs=(P(axis_name), P()),
                       check_vma=False)
    return fn(Pm, C, Rdiag, Cn_p)


def knot_condensed_solve(factors, rhs, mesh: Mesh, axis_name: str = "knot",
                         dz: int = None):
    """Solve the full condensed KKT given `knot_condensed_factor` output.
    rhs [N, dz+m(, r)] ordered (z, lam) per knot; returns the same shape,
    sharded over the knot axis."""
    sharded, replicated = factors
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    body = functools.partial(_knot_solve_body, axis_name=axis_name, dz=dz)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(), P(axis_name)),
        out_specs=P(axis_name), check_vma=False)
    x = fn(sharded, replicated, rhs)
    return x[..., 0] if squeeze else x


def batched_sharded_spd_tridiag_solve(diag, upper, rhs, mesh: Mesh,
                                      batch_axis: str = "batch",
                                      knot_axis: str = "knot"):
    """2D (batch x knot) composition of the SPIKE-partitioned solve.

    Many long-horizon KKT systems solved at once on a 2D device mesh:
    the BATCH axis is embarrassingly parallel (each batch shard holds
    B/nb systems), and within each batch shard the KNOT axis runs the
    same SPIKE partition as `sharded_spd_tridiag_solve` — the body is
    simply vmapped over the local batch, so the knot collectives
    (all_gather + 2 ppermutes) batch across systems into single larger
    messages. This is the BASELINE's batch x long-horizon composition
    (SURVEY.md section 5.7) at the KKT layer, where all communication
    lives.

    diag [B, N, m, m], upper [B, N-1, m, m], rhs [B, N, m(, r)].
    B divisible by mesh's batch_axis size; N divisible by knot_axis
    size with N/n_knot >= 3.
    """
    squeeze = rhs.ndim == 3
    if squeeze:
        rhs = rhs[..., None]
    B, N, m, _ = diag.shape
    nb = mesh.shape[batch_axis]
    nk = mesh.shape[knot_axis]
    if B % nb:
        raise ValueError(f"B={B} must divide over n_batch={nb}")
    if N % nk or N // nk < 3:
        raise ValueError(
            f"N={N} must be divisible by n_knot={nk} with chunks >= 3")
    upper_p = jnp.concatenate(
        [upper, jnp.zeros((B, 1, m, m), upper.dtype)], axis=1)

    body = functools.partial(_local_partition_solve, axis_name=knot_axis)
    spec = P(batch_axis, knot_axis)
    fn = jax.shard_map(lambda d, u, r: jax.vmap(body)(d, u, r),
                       mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    x = fn(diag, upper_p, rhs)
    return x[..., 0] if squeeze else x


def sharded_spd_tridiag_solve(diag, upper, rhs, mesh: Mesh,
                              axis_name: str = "knot"):
    """Solve the SPD block-tridiagonal system S x = rhs with the knot
    axis sharded over `mesh`'s `axis_name` devices.

    diag [N, m, m], upper [N-1, m, m], rhs [N, m] or [N, m, r]. N must be
    divisible by n_dev with N/n_dev >= 3. Returns x with the same
    (sharded) layout as rhs.
    """
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    N, m, _ = diag.shape
    n_dev = mesh.shape[axis_name]
    if N % n_dev or N // n_dev < 3:
        raise ValueError(
            f"N={N} must be divisible by n_dev={n_dev} with chunks >= 3")
    # pad upper to [N] so it shards evenly; entry N-1 is zero (no coupling
    # out of the last row) which the partition body relies on.
    upper_p = jnp.concatenate(
        [upper, jnp.zeros((1, m, m), upper.dtype)], axis=0)

    body = functools.partial(_local_partition_solve, axis_name=axis_name)
    spec = P(axis_name)
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec)
    x = fn(diag, upper_p, rhs)
    return x[..., 0] if squeeze else x
