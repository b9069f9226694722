"""JAX bridge to the native (C++) KKT factorization.

Exposes `piccolax.native.qd_solve` inside jitted/vmapped IPM iterations
via `jax.pure_callback` — the host-backend analogue of the reference's
Ipopt/MadNLP choice (SURVEY.md section 2.9). Intended for CPU runs and
for verification; on TPU the matmul-only factorization in `kkt.py` is
the production path (a host callback per IPM iteration would serialize
on the PCIe/ICI boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import native

__all__ = ["native_kkt_available", "qd_solve_callback"]


def native_kkt_available() -> bool:
    return native.available()


def _host_qd_solve(P, C, Rdiag, Cnext, rhs):
    """Host implementation. Base ranks: P 3, C 3, Rdiag 2, Cnext 3,
    rhs 4 ([N, mb, r] plus optional leading batch axes)."""
    P = np.asarray(P, np.float64)
    extra = P.ndim - 3                     # leading batch axes from vmap
    if extra == 0:
        x, _ = native.qd_solve(P, C, Rdiag, Cnext, np.asarray(rhs))
        return x
    lead = P.shape[:extra]
    B = int(np.prod(lead)) if lead else 1

    def flat(a, base):
        a = np.asarray(a, np.float64)
        return np.broadcast_to(a, lead + a.shape[a.ndim - base:]).reshape(
            (B,) + a.shape[a.ndim - base:])

    x, _ = native.qd_solve(flat(P, 3), flat(C, 3), flat(Rdiag, 2),
                           flat(Cnext, 3), flat(rhs, 3))
    return x.reshape(lead + x.shape[1:])


def qd_solve_callback(P, C, Rdiag, Cnext, rhs):
    """Solve the quasidefinite block-tridiagonal KKT on the host.

    P [N, dz, dz], C [N, m, dz], Rdiag [N, m], Cnext [N-1, m, dz],
    rhs [N, dz+m, r]. NaN output signals a non-PD primal block, matching
    `kkt.qd_factor` semantics. Works under jit and vmap.
    """
    out_shape = jax.ShapeDtypeStruct(rhs.shape, jnp.float64)
    return jax.pure_callback(
        _host_qd_solve, out_shape, P, C, Rdiag, Cnext, rhs,
        vmap_method="expand_dims")
