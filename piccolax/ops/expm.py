"""Matrix exponential kernels.

The collocation dynamics constraint is x_{k+1} = expm(dt * G(u_k)) x_k
(reference integrator: DirectTrajOpt's Pade/exponential BilinearIntegrator,
see SURVEY.md section 2.7). Everything here is jnp-traceable, vmappable and
exactly differentiable by JAX autodiff — the optimizer's dynamics ARE the
Pade approximant, so autodiff of these functions gives the exact Jacobians
the reference hand-assembles.

Two paths:
- `expm`: general scaling-and-squaring Pade-13 with dynamic (but statically
  bounded) squaring count. Safe default.
- `expm_pade_fixed`: fixed Pade order + static squaring count for the solver
  hot loop where the norm scale is known (small dt*H). Fully static shapes
  and control flow — the XLA/MXU fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["expm", "expm_pade_fixed", "expm_taylor_fixed", "expm_fixed",
           "expm_action"]

# Pade-13 coefficients (Higham 2005)
_B13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0, 670442572800.0,
    33522128640.0, 1323241920.0, 40840800.0, 960960.0, 16380.0, 182.0, 1.0,
)

# Scaling threshold. The classic Pade-13 radius is 5.37, but the Pade
# denominator is inverted with Newton-Schulz (TPU's LuDecomposition
# supports only f32/c64, so jnp.linalg.solve is off-limits in the f64
# production path); NS needs ||q(A)/b0 - I|| < 1, which holds for
# ||A|| <= ~0.95 (series bound ~0.60). The extra squarings this costs
# are 1-2 matmuls — cheaper than a pivoted solve anyway.
_THETA13 = 0.95


def _ns_solve(Mden, Mnum, b0, iters):
    """Solve Mden @ F = Mnum by matmul-only Newton-Schulz inversion.

    Contract: Mden = b0*(I + E) with ||E|| < 1 (true for scaled Pade
    denominators). X <- X(2I - Mden X) doubles correct digits per
    iteration from X0 = I/b0; `iters` is static. Exact under autodiff.
    """
    n = Mden.shape[-1]
    ident = jnp.eye(n, dtype=Mden.dtype)
    X = jnp.broadcast_to(ident / b0, Mden.shape)
    for _ in range(iters):
        X = X @ (2.0 * ident - Mden @ X)
    return X @ Mnum


def _pade13(A):
    b = _B13
    n = A.shape[-1]
    ident = jnp.eye(n, dtype=A.dtype)
    A2 = A @ A
    A4 = A2 @ A2
    A6 = A4 @ A2
    U = A @ (A6 @ (b[13] * A6 + b[11] * A4 + b[9] * A2)
             + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * ident)
    V = (A6 @ (b[12] * A6 + b[10] * A4 + b[8] * A2)
         + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * ident)
    return _ns_solve(V - U, V + U, b[0], iters=8)


@partial(jax.jit, static_argnames=("max_squarings",))
def expm(A, max_squarings: int = 16):
    """Scaling-and-squaring Pade-13 expm; batched over leading axes."""
    A = jnp.asarray(A)
    norm = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1)  # inf-norm
    s = jnp.maximum(
        jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA13, 1e-30))), 0.0)
    s = jnp.minimum(s, float(max_squarings)).astype(jnp.int32)
    scale = (2.0 ** (-s)).astype(jnp.result_type(A.dtype, float))
    A_scaled = A * scale[..., None, None] if A.ndim > 2 else A * scale
    P = _pade13(A_scaled)

    def body(i, M):
        do = i < s
        sq = M @ M
        if A.ndim > 2:
            return jnp.where(do[..., None, None], sq, M)
        return jnp.where(do, sq, M)

    return jax.lax.fori_loop(0, max_squarings, body, P)


# Pade coefficients for lower orders (numerator; denominator is mirrored signs)
_PADE_B = {
    3: (120.0, 60.0, 12.0, 1.0),
    5: (30240.0, 15120.0, 3360.0, 420.0, 30.0, 1.0),
    7: (17297280.0, 8648640.0, 1995840.0, 277200.0, 25200.0, 1512.0, 56.0, 1.0),
    9: (17643225600.0, 8821612800.0, 2075673600.0, 302702400.0, 30270240.0,
        2162160.0, 110880.0, 3960.0, 90.0, 1.0),
}


def expm_pade_fixed(A, order: int = 7, squarings: int = 2):
    """Diagonal Pade-[m/m] expm with a STATIC squaring count.

    Accurate when ||A|| / 2^squarings is within the Pade radius for `order`
    (e.g. order 7, ||A||/2^s <~ 0.95 gives ~1e-15; the collocation residual
    uses dt*||H|| which templates keep O(1)). No data-dependent control flow
    — ideal under vmap/jit on TPU.
    """
    b = _PADE_B[order]
    A = A * (2.0 ** (-squarings))
    n = A.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    # Even powers A^0, A^2, ..., A^(order-1)
    n_even = (order + 1) // 2
    evens = [ident]
    A2 = A @ A
    for j in range(1, n_even):
        evens.append(A2 if j == 1 else evens[-1] @ A2)
    # U = A * sum_j b[2j+1] A^(2j);  V = sum_j b[2j] A^(2j)
    U_inner = sum(b[2 * j + 1] * evens[j] for j in range(n_even))
    V = sum(b[2 * j] * evens[j] for j in range(n_even))
    U = A @ U_inner
    F = _ns_solve(V - U, V + U, b[0], iters=6)
    for _ in range(squarings):
        F = F @ F
    return F


_FACT = [1.0]
for _i in range(1, 14):
    _FACT.append(_FACT[-1] * _i)

# Truncation radius: ||A|| <= theta gives Taylor error theta^(m+1)/(m+1)!
# below the dtype eps of the production paths (m=8 at 0.33 -> 1.3e-10 for
# f32; m=12 at 0.33 -> 9e-17 for f64).
TAYLOR_THETA = 0.33


def expm_taylor_fixed(A, order: int | None = None, squarings: int = 2):
    """Taylor expm with STATIC squaring count, Paterson-Stockmeyer form.

    The solver hot-loop kernel: inversion-free (4-5 matmuls + squarings
    vs ~18 for Pade + Newton-Schulz), exactly differentiable, fully
    static. Accurate when ||A|| / 2^squarings <= TAYLOR_THETA; the
    collocation templates choose `squarings` from a feasible-box norm
    bound (control/integrators.py:choose_squarings).

    order: 8 or 12 (None = dtype-adaptive: 8 for float32, 12 otherwise).
    """
    A = jnp.asarray(A)
    if order is None:
        order = 8 if A.dtype == jnp.float32 else 12
    c = [1.0 / _FACT[i] for i in range(order + 1)]
    A = A * (2.0 ** (-squarings))
    n = A.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    A2 = A @ A
    A3 = A2 @ A
    A4 = A2 @ A2

    def cubic(i0):
        return (c[i0] * ident + c[i0 + 1] * A + c[i0 + 2] * A2
                + c[i0 + 3] * A3)

    if order == 8:
        B1 = cubic(4) + c[8] * A4
        F = cubic(0) + A4 @ B1
    elif order == 12:
        B2 = cubic(8) + c[12] * A4
        B1 = cubic(4)
        F = cubic(0) + A4 @ (B1 + A4 @ B2)
    else:
        raise ValueError(f"unsupported Taylor order {order}")
    for _ in range(squarings):
        F = F @ F
    return F


def expm_fixed(A, order, squarings: int):
    """Static-shape expm dispatcher for the collocation hot path.

    order: "taylor" (dtype-adaptive Paterson-Stockmeyer Taylor — the
    production default) or a Pade order in {3, 5, 7, 9}.
    """
    if order == "taylor":
        return expm_taylor_fixed(A, None, squarings)
    return expm_pade_fixed(A, order=order, squarings=squarings)


def expm_action(A, x, order: int = 7, squarings: int = 2):
    """expm(A) @ x without forming expm when x has few columns.

    For now forms the exponential (n is small in quantum control); kept as
    the single seam where a Krylov/Pallas implementation can drop in.
    """
    return expm_pade_fixed(A, order=order, squarings=squarings) @ x
