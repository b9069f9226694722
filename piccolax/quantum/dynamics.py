"""Rollout engine and fidelity kernels.

TPU-native counterpart of the reference dynamics layer
(reference: src/quantum/dynamics.jl). Design deltas (SURVEY.md section 7):

- ZOH + time-independent systems use EXACT piecewise-constant propagation:
  per-interval expm composed with `jax.lax.associative_scan` (log-depth
  parallel prefix of matrix products) instead of an adaptive ODE solver.
- Time-dependent / interpolated controls use a fixed-substep 4th-order
  Magnus integrator (two Gauss-Legendre nodes + commutator term), the
  analogue of the reference's MagnusGL4 (dynamics.jl:6-14); fixed substep
  counts keep shapes static for XLA.
- Open systems propagate vec(rho) with the exact expm of the Lindblad
  superoperator per substep (unconditionally stable, trace preserving).
- Ensembles fan out with `vmap` instead of SciML EnsembleProblem
  (dynamics.jl:573-585).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.expm import expm
from . import isomorphisms as iso
from .operators import EmbeddedOperator
from .pulses import CubicSplinePulse, LinearSplinePulse, ZeroOrderPulse

__all__ = [
    "rollout_with_scipy",
    "fidelity",
    "density_fidelity",
    "unitary_fidelity",
    "pedersen_fidelity",
    "free_phase_diagonal",
    "free_phase_angles",
    "fidelity_iso",
    "unitary_fidelity_iso",
    "pedersen_fidelity_iso",
    "density_fidelity_iso",
    "unitary_rollout",
    "ket_rollout",
    "density_rollout",
    "step_propagators",
    "liouvillian",
    "lindblad_propagators",
    "rollout_fidelity",
    "unitary_rollout_fidelity",
]

_SQRT3 = np.sqrt(3.0)


# --------------------------------------------------------------------------- #
# Fidelity kernels (reference: src/quantum/dynamics.jl:273-299)
# --------------------------------------------------------------------------- #


def fidelity(psi, psi_goal):
    """|<psi|psi_goal>|^2 (batched over leading axes)."""
    inner = jnp.sum(jnp.conj(psi) * psi_goal, axis=-1)
    return jnp.abs(inner) ** 2


def density_fidelity(rho, rho_goal):
    """Trace fidelity tr(rho @ rho_goal) (real)."""
    return jnp.real(jnp.einsum("...ij,...ji->...", rho, rho_goal))


def unitary_fidelity(U, U_goal, subspace=None):
    """|tr(U' U_goal)|^2 / N^2, optionally restricted to a subspace."""
    if subspace is not None:
        sub = np.asarray(subspace)
        U = U[..., sub[:, None], sub[None, :]]
        U_goal = U_goal[..., sub[:, None], sub[None, :]]
    N = U.shape[-1]
    tr = jnp.einsum("...ij,...ij->...", jnp.conj(U), U_goal)
    return jnp.abs(tr) ** 2 / N ** 2


def pedersen_fidelity(U_sub, U_goal_sub):
    """Pedersen average-gate fidelity on a subspace (handles leakage):

        F = (tr(M' M) + |tr M|^2) / (n (n + 1)),  M = U_goal' U_sub

    reference: src/quantum/trajectories/rollouts_extensions.jl:892-931.
    """
    n = U_sub.shape[-1]
    M = jnp.swapaxes(jnp.conj(U_goal_sub), -1, -2) @ U_sub
    t1 = jnp.abs(jnp.einsum("...ij,...ij->...", jnp.conj(M), M))
    t2 = jnp.abs(jnp.einsum("...ii->...", M)) ** 2
    return (t1 + t2) / (n * (n + 1))


def free_phase_angles(phases, n_qubits: int, dim: int):
    """Per-entry total free phase: entry i sums the phases of qubits in |1>
    in the binary decomposition of i (MSB = qubit 0). Real output."""
    i = jnp.arange(dim)
    total = jnp.zeros(dim)
    for j in range(n_qubits):
        bit = (i >> (n_qubits - 1 - j)) & 1
        total = total + bit * phases[j]
    return total


def free_phase_diagonal(phases, n_qubits: int, dim: int):
    """exp(i * free_phase_angles) as a complex diagonal.

    reference convention: rollouts_extensions.jl free-phase goal.
    """
    return jnp.exp(1j * free_phase_angles(phases, n_qubits, dim))


def free_phase_angles_levels(phases, subsystem_levels, dim: int):
    """Number-operator free phases over arbitrary subsystem levels: basis
    index i decomposes row-major into per-subsystem level indices s_j and
    the total phase is sum_j s_j * phases[j] — e.g. |e, 2> of a
    transmon (x) cavity gets theta_1 + 2 theta_2.

    reference: _make_free_phase_ket_goals, smooth_pulse_problem.jl:28-64.
    Reduces to `free_phase_angles` when every level is 2.
    """
    i = jnp.arange(dim)
    total = jnp.zeros(dim)
    rem = i
    levels = tuple(int(v) for v in subsystem_levels)
    for j, lv in enumerate(levels):
        stride = 1
        for v in levels[j + 1:]:
            stride *= v
        sj = jnp.minimum(rem // stride, lv - 1)
        rem = rem % stride
        total = total + sj * phases[j]
    return total


# -- iso-space fidelity kernels (real arithmetic; TPU production path) ------ #
# The NLP evaluates these on real iso vectors so the solver traces no
# complex ops (TPU's f64 x64 rewriter has no f64<->c128 conversions).


def fidelity_iso(psi_iso, goal_iso):
    """|<psi|goal>|^2 from ket isos."""
    re, im = iso.iso_inner(psi_iso, goal_iso)
    return re ** 2 + im ** 2


def unitary_fidelity_iso(x_iso, goal_iso):
    """|tr(U^dag U_goal)|^2 / n^2 from operator iso-vecs."""
    n = int(round(np.sqrt(x_iso.shape[-1] // 2)))
    re, im = iso.iso_vec_inner(x_iso, goal_iso)
    return (re ** 2 + im ** 2) / n ** 2


def pedersen_fidelity_iso(x_sub_iso, goal_sub_iso):
    """Pedersen average-gate fidelity on a subspace from iso-vecs.

    F = (tr(M^dag M) + |tr M|^2) / (n (n + 1)), M = U_goal^dag U_sub.
    Assumes the goal's subspace block is unitary (true for embedded gate
    goals), so tr(M^dag M) = ||U_sub||_F^2 = sum(x_sub^2).
    """
    m = int(round(np.sqrt(x_sub_iso.shape[-1] // 2)))
    t1 = jnp.sum(x_sub_iso ** 2, axis=-1)
    re, im = iso.iso_vec_inner(goal_sub_iso, x_sub_iso)
    return (t1 + re ** 2 + im ** 2) / (m * (m + 1))


def density_fidelity_iso(x_compact, goal_compact):
    """tr(rho rho_goal) from compact density isos (the sqrt(2)-scaled
    compact iso is a Frobenius isometry, so this is a plain dot)."""
    return jnp.sum(x_compact * goal_compact, axis=-1)


# -- bounded (normalized-overlap) variants for NLP objectives ---------------- #
# The raw overlap fidelities are UNBOUNDED above for unnormalized states
# (|tr(U^dag Ug)|^2 grows without limit off the unitary manifold), which
# gives the collocation NLP a spurious objective basin reachable through
# infeasible territory — fatal for any merit-based globalization. The
# bounded variants divide by the state norm (Cauchy-Schwarz => F <= 1
# everywhere) and coincide EXACTLY with the raw fidelity on the feasible
# manifold (where dynamics constraints enforce unit norm), so converged
# solutions match the reference's objective values.


def fidelity_iso_bounded(psi_iso, goal_iso):
    """|<psi|goal>|^2 / ||psi||^2 (goal assumed normalized)."""
    re, im = iso.iso_inner(psi_iso, goal_iso)
    n2 = jnp.maximum(jnp.sum(psi_iso ** 2, axis=-1), 1e-12)
    return (re ** 2 + im ** 2) / n2


def unitary_fidelity_iso_bounded(x_iso, goal_iso):
    """|tr(U^dag Ug)|^2 / (n ||U||_F^2): equals unitary_fidelity_iso when
    ||U||_F^2 = n (true on the dynamics manifold)."""
    n = int(round(np.sqrt(x_iso.shape[-1] // 2)))
    re, im = iso.iso_vec_inner(x_iso, goal_iso)
    nrm2 = jnp.maximum(jnp.sum(x_iso ** 2, axis=-1), 1e-12)
    return (re ** 2 + im ** 2) / (n * nrm2)


def pedersen_fidelity_iso_bounded(x_sub_iso, goal_sub_iso, x_full_iso):
    """Pedersen subspace fidelity scaled by n_full / ||U_full||_F^2.

    F(gamma U) = gamma^2 F(U), so dividing by the full-state norm bounds
    the objective (F <= n_full / n_sub) while preserving both the on-
    manifold value and the leakage semantics (the subspace-vs-leakage
    norm distribution is untouched)."""
    n_full = int(round(np.sqrt(x_full_iso.shape[-1] // 2)))
    nrm2 = jnp.maximum(jnp.sum(x_full_iso ** 2, axis=-1), 1e-12)
    return pedersen_fidelity_iso(x_sub_iso, goal_sub_iso) * n_full / nrm2


# --------------------------------------------------------------------------- #
# Propagator construction
# --------------------------------------------------------------------------- #


def _magnus4_propagator(system, u_fn, ta, tb):
    """4th-order Magnus step over [ta, tb] with controls from u_fn(t)."""
    h = tb - ta
    c1 = 0.5 - _SQRT3 / 6.0
    c2 = 0.5 + _SQRT3 / 6.0
    t1 = ta + c1 * h
    t2 = ta + c2 * h
    A1 = -1j * system.H(u_fn(t1), t1)
    A2 = -1j * system.H(u_fn(t2), t2)
    Om = (h / 2.0) * (A1 + A2) + (h * h * _SQRT3 / 12.0) * (A2 @ A1 - A1 @ A2)
    return expm(Om)


def _zoh_propagator(system, u_fn, ta, tb):
    """Exact step for piecewise-constant H: expm(-i H(u(ta)) (tb - ta))."""
    h = tb - ta
    Hm = system.H(u_fn(ta), ta)
    return expm(-1j * h * Hm)


def _substep_grid(times, n_substeps: int):
    """Refine knot times into n_substeps per interval -> [(N-1)*S + 1]."""
    if n_substeps == 1:
        return times
    frac = jnp.arange(n_substeps) / n_substeps          # [S]
    t0 = times[:-1]
    dt = times[1:] - times[:-1]
    fine = (t0[:, None] + frac[None, :] * dt[:, None]).reshape(-1)
    return jnp.concatenate([fine, times[-1:]])


def step_propagators(system, u_fn, times, method: str = "magnus4",
                     n_substeps: int = 1):
    """Per-interval propagators over a (refined) time grid.

    Returns (grid [M+1], propagators [M, n, n]).
    """
    grid = _substep_grid(jnp.asarray(times), n_substeps)
    make = _zoh_propagator if method == "zoh" else _magnus4_propagator
    props = jax.vmap(lambda a, b: make(system, u_fn, a, b))(grid[:-1], grid[1:])
    return grid, props


def _cumulative_propagators(props):
    """P_k = U_k @ ... @ U_1 via parallel prefix (log-depth on device)."""
    return jax.lax.associative_scan(lambda a, b: jnp.matmul(b, a), props)


def _select_method(system, pulse, method):
    if method is not None:
        return method
    if isinstance(pulse, ZeroOrderPulse) and not system.time_dependent:
        return "zoh"
    return "magnus4"


def _unitary_rollout_impl(system, pulse, times, method, n_substeps):
    grid, props = step_propagators(system, pulse, times, method, n_substeps)
    cum = _cumulative_propagators(props)
    n = system.levels
    cdtype = props.dtype
    U0 = jnp.eye(n, dtype=cdtype)[None]
    Us = jnp.concatenate([U0, cum], axis=0)           # [M+1, n, n]
    if n_substeps == 1:
        return Us
    return Us[::n_substeps]


def unitary_rollout(system, pulse, times, method: str | None = None,
                    n_substeps: int = 1):
    """Propagate U(0)=I through the pulse; returns U at each knot time
    [N, n, n] (reference: dynamics.jl:631)."""
    times = jnp.asarray(times)
    method = _select_method(system, pulse, method)
    return _unitary_rollout_impl(system, pulse, times, method, n_substeps)


def ket_rollout(system, pulse, times, initial, method: str | None = None,
                n_substeps: int = 1):
    """Propagate a ket (or batch of kets, leading axis) through the pulse.

    Returns [N, (...,) n] states at the knot times (reference: dynamics.jl:692).
    """
    Us = unitary_rollout(system, pulse, times, method, n_substeps)
    initial = jnp.asarray(initial)
    return jnp.einsum("tij,...j->t...i", Us, initial)


def liouvillian(system, u=None, t=0.0):
    """Complex Lindblad superoperator S with d vec(rho)/dt = S vec(rho)
    (column-major vec)."""
    u = jnp.zeros(system.n_drives) if u is None else jnp.asarray(u)
    Hm = system.H(u, t)
    n = Hm.shape[-1]
    Id = jnp.eye(n, dtype=Hm.dtype)
    S = -1j * (jnp.kron(Id, Hm) - jnp.kron(Hm.T, Id))
    for d in getattr(system, "dissipators", ()):
        L = d.operator(u)
        LdL = jnp.conj(L).T @ L
        S = S + (jnp.kron(jnp.conj(L), L)
                 - 0.5 * (jnp.kron(Id, LdL) + jnp.kron(LdL.T, Id)))
    return S


def lindblad_propagators(system, u_fn, times, n_substeps: int = 1):
    """Per-interval superoperator propagators expm(S(u(t_mid)) h) on a
    refined grid; midpoint sampling gives 2nd-order accuracy per substep."""
    grid = _substep_grid(jnp.asarray(times), n_substeps)

    def make(ta, tb):
        h = tb - ta
        tm = 0.5 * (ta + tb)
        return expm(h * liouvillian(system, u_fn(tm), tm))

    props = jax.vmap(make)(grid[:-1], grid[1:])
    return grid, props


def density_rollout(system, pulse, times, initial, n_substeps: int = 4):
    """Propagate a density matrix through the Lindblad master equation.

    Returns [N, n, n] density matrices at the knot times.
    """
    times = jnp.asarray(times)
    _, props = lindblad_propagators(system, pulse, times, n_substeps)
    cum = _cumulative_propagators(props)
    n = system.levels
    rho0 = jnp.asarray(initial, dtype=props.dtype)
    v0 = rho0.T.reshape(-1)                            # column-major vec
    vs = jnp.einsum("tij,j->ti", cum, v0)
    rhos = jnp.swapaxes(vs.reshape(-1, n, n), -1, -2)
    rhos = jnp.concatenate([rho0[None], rhos], axis=0)
    if n_substeps == 1:
        return rhos
    return rhos[::n_substeps]


# --------------------------------------------------------------------------- #
# Validation rollouts (reference: dynamics.jl:538-592)
# --------------------------------------------------------------------------- #


def _pulse_from_samples(us, times, interpolation: str, dus=None):
    if interpolation == "constant":
        return ZeroOrderPulse(us, times)
    if interpolation == "linear":
        return LinearSplinePulse(us, times)
    if interpolation == "cubic":
        if dus is None:
            # finite-difference tangents
            dt = times[1:] - times[:-1]
            slopes = (us[1:] - us[:-1]) / dt[:, None]
            dus = jnp.concatenate([slopes[:1],
                                   0.5 * (slopes[1:] + slopes[:-1]),
                                   slopes[-1:]], axis=0)
        return CubicSplinePulse(us, dus, times)
    raise ValueError(f"unknown interpolation {interpolation!r}")


def rollout_fidelity(system, us, times, initials, goals,
                     interpolation: str = "cubic", dus=None,
                     n_substeps: int = 10, weights=None):
    """Re-integrate continuous dynamics under an interpolation of discrete
    controls and compare to the goal(s) — the discretization-error check
    (reference: dynamics.jl:538). `initials`/`goals` may carry a leading
    batch axis (ensemble fan-out via vmap)."""
    us = jnp.asarray(us)
    times = jnp.asarray(times)
    pulse = _pulse_from_samples(us, times, interpolation, dus)
    method = "zoh" if (interpolation == "constant"
                       and not system.time_dependent) else "magnus4"
    psis = ket_rollout(system, pulse, times, jnp.asarray(initials),
                       method=method, n_substeps=n_substeps)
    F = fidelity(psis[-1], jnp.asarray(goals))
    if F.ndim == 0:
        return F
    if weights is None:
        return jnp.mean(F)
    return jnp.sum(jnp.asarray(weights) * F)


def unitary_rollout_fidelity(system, us, times, goal,
                             interpolation: str = "cubic", dus=None,
                             n_substeps: int = 10, phases=None,
                             n_qubits=None):
    """Unitary version of `rollout_fidelity` (reference: dynamics.jl:594).

    For an `EmbeddedOperator` goal uses the Pedersen subspace fidelity.
    """
    us = jnp.asarray(us)
    times = jnp.asarray(times)
    pulse = _pulse_from_samples(us, times, interpolation, dus)
    method = "zoh" if (interpolation == "constant"
                       and not system.time_dependent) else "magnus4"
    Us = unitary_rollout(system, pulse, times, method=method,
                         n_substeps=n_substeps)
    U_final = Us[-1]
    if isinstance(goal, EmbeddedOperator):
        sub = np.asarray(goal.subspace)
        U_sub = U_final[sub[:, None], sub[None, :]]
        U_goal_sub = jnp.asarray(goal.unembed())
        if phases is not None:
            diag = free_phase_diagonal(jnp.asarray(phases), n_qubits,
                                       U_goal_sub.shape[-1])
            U_goal_sub = diag[:, None] * U_goal_sub
        return pedersen_fidelity(U_sub, U_goal_sub)
    return unitary_fidelity(U_final, jnp.asarray(goal))


def rollout_with_scipy(system, pulse, times, initial=None, *,
                       rtol: float = 1e-10, atol: float = 1e-10):
    """Fully independent cross-check integrator: scipy solve_ivp (DOP853)
    on the Schrodinger/unitary ODE, sharing NO code with the production
    expm-scan/Magnus engines — the analogue of the reference's
    QuantumToolbox `rollout_with_qutip` (reference:
    ext/PiccoloQuantumToolboxExt.jl:21; quality bar |dF| <= 1e-4,
    docs/literate/two_qubit_gate_validation.jl:348).

    Host-side (numpy/scipy), not jittable. `initial` None integrates the
    full unitary from the identity. Returns the state(s) at `times`.
    """
    from scipy.integrate import solve_ivp

    times = np.asarray(times)
    n = system.levels
    if initial is None:
        y0 = np.eye(n, dtype=complex).reshape(-1)
        shape = (n, n)
    else:
        y0 = np.asarray(initial, dtype=complex).reshape(-1)
        shape = (n,) if y0.size == n else (n, y0.size // n)

    dissipators = tuple(getattr(system, "dissipators", ()) or ())
    lindblad = bool(dissipators) and initial is not None \
        and np.asarray(initial).shape == (n, n)

    if lindblad:
        # density-matrix Lindblad RHS (independent of the compact-iso
        # production path; same role as the unitary branch)
        def rhs(t, y):
            u = np.asarray(pulse(t))
            H = np.asarray(system.H(u, t))
            rho = y.reshape(shape)
            drho = -1j * (H @ rho - rho @ H)
            for dis in dissipators:
                L = np.asarray(dis.operator(u))
                LdL = L.conj().T @ L
                drho = drho + L @ rho @ L.conj().T \
                    - 0.5 * (LdL @ rho + rho @ LdL)
            return drho.reshape(-1)
    else:
        def rhs(t, y):
            u = np.asarray(pulse(t))
            H = np.asarray(system.H(u, t))
            return (-1j * H @ y.reshape(shape)).reshape(-1)

    # integrate interval-by-interval: knot times are discontinuity points
    # of ZOH controls (the tstops discipline of the reference rollouts)
    out = [y0.reshape(shape)]
    y = y0
    for ta, tb in zip(times[:-1], times[1:]):
        sol = solve_ivp(rhs, (ta, tb), y, method="DOP853",
                        rtol=rtol, atol=atol, dense_output=False)
        if not sol.success:
            raise RuntimeError(f"scipy integration failed: {sol.message}")
        y = sol.y[:, -1]
        out.append(y.reshape(shape))
    return np.stack(out)
