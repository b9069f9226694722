"""Quantum system containers: closed, open, variational, composite.

TPU-native counterpart of the reference systems layer
(reference: src/quantum/systems/_quantum_systems.jl, drives.jl,
dissipators.jl, quantum_systems.jl, open_quantum_systems.jl,
variational_quantum_systems.jl, composite_quantum_systems.jl).

Systems are JAX pytrees: operator matrices are array leaves (so ensembles
of perturbed systems can be built with `jax.tree_util.tree_map` and
vmapped/stacked), while coefficient *structure* (drive indices, nonlinear
coefficient callables, time modulations) is static metadata.

The full Hamiltonian follows the reference convention
(src/quantum/systems/drives.jl:8):

    H(u, t) = sum_k a_k(t) * H_drift_k  +  sum_d coeff_d(u, t) * H_drive_d

Derivatives of nonlinear drive coefficients are obtained by JAX autodiff
(the reference hand-writes Jacobians/Hessians for Ipopt: drives.jl:93-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field
from . import isomorphisms as iso_mod
from .operators import lift_operator

__all__ = [
    "DriftTerm",
    "LinearDrive",
    "NonlinearDrive",
    "PolarCoeff",
    "ModulatedDrive",
    "LinearDissipator",
    "NonlinearDissipator",
    "QuantumSystem",
    "RealGeneratorSystem",
    "OpenQuantumSystem",
    "VariationalQuantumSystem",
    "CompositeQuantumSystem",
    "normalize_drive_bounds",
]


def _cplx(x):
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.result_type(x.dtype, jnp.complex64))
    return x


def _check_hermitian(M, name: str):
    """Hermiticity assert, skipped for traced arrays (construction-time only)."""
    try:
        arr = np.asarray(M)
    except Exception:
        return
    if not np.allclose(arr, arr.conj().T, atol=1e-10):
        raise ValueError(f"{name} must be Hermitian")


def normalize_drive_bounds(bounds, n_drives: int):
    """Normalize drive bounds to an [n_drives, 2] (lo, hi) array.

    Accepts a scalar b (-> (-b, b) for all drives), a length-n list of
    scalars or (lo, hi) pairs (reference:
    src/quantum/systems/_quantum_systems.jl:87).
    """
    if bounds is None:
        return jnp.stack([jnp.full(n_drives, -jnp.inf), jnp.full(n_drives, jnp.inf)],
                         axis=-1)
    if np.isscalar(bounds):
        b = float(bounds)
        return jnp.stack([jnp.full(n_drives, -b), jnp.full(n_drives, b)], axis=-1)
    out = []
    for b in bounds:
        if np.isscalar(b):
            out.append((-float(b), float(b)))
        else:
            lo, hi = b
            out.append((float(lo), float(hi)))
    assert len(out) == n_drives, f"expected {n_drives} drive bounds, got {len(out)}"
    return jnp.asarray(out)


# --------------------------------------------------------------------------- #
# Drive terms (reference: src/quantum/systems/drives.jl)
# --------------------------------------------------------------------------- #


@pytree_dataclass
class DriftTerm:
    """Drift Hamiltonian term with optional time modulation a(t)."""

    H: jnp.ndarray
    modulation: object = static_field(default=None)   # callable t -> real, or None

    def coeff(self, t):
        if self.modulation is None:
            return jnp.ones(())
        return self.modulation(t)

    @property
    def time_dependent(self) -> bool:
        return self.modulation is not None


@pytree_dataclass
class LinearDrive:
    """Drive with coefficient u[index] (reference: drives.jl:52)."""

    H: jnp.ndarray
    index: int = static_field(default=0)

    def coeff(self, u, t):
        return u[self.index]

    @property
    def time_dependent(self) -> bool:
        return False


@pytree_dataclass
class NonlinearDrive:
    """Drive with coefficient f(u) (reference: drives.jl:93).

    `active_controls` is optional sparsity metadata (indices of u that f
    depends on); JAX autodiff provides Jacobians/Hessians.
    """

    H: jnp.ndarray
    f: object = static_field(default=None)            # callable u -> real
    active_controls: tuple = static_field(default=None)

    def coeff(self, u, t):
        return self.f(u)

    @property
    def time_dependent(self) -> bool:
        return False


class PolarCoeff:
    """Hashable amp * cos/sin(phase) coefficient over the control vector
    — the polar (amplitude, phase) drive parameterization (reference:
    drives.jl nonlinear coefficients; see also the radial-MS
    _AmpPhaseCoeff in templates/ions.py)."""

    def __init__(self, amp_index: int, phase_index: int,
                 quadrature: str = "cos"):
        assert quadrature in ("cos", "sin")
        self.amp_index = amp_index
        self.phase_index = phase_index
        self.quadrature = quadrature

    def __call__(self, u):
        amp = u[self.amp_index]
        phase = u[self.phase_index]
        trig = jnp.cos(phase) if self.quadrature == "cos" \
            else jnp.sin(phase)
        return amp * trig

    def __hash__(self):
        return hash(("polar", self.amp_index, self.phase_index,
                     self.quadrature))

    def __eq__(self, o):
        return isinstance(o, PolarCoeff) and \
            (o.amp_index, o.phase_index, o.quadrature) == \
            (self.amp_index, self.phase_index, self.quadrature)


@pytree_dataclass
class ModulatedDrive:
    """Wrap a drive with a time modulation b(t) (reference: drives.jl:360)."""

    drive: object
    b: object = static_field(default=None)            # callable t -> real

    @property
    def H(self):
        return self.drive.H

    def coeff(self, u, t):
        return self.drive.coeff(u, t) * self.b(t)

    @property
    def time_dependent(self) -> bool:
        return True


# --------------------------------------------------------------------------- #
# Dissipators (reference: src/quantum/systems/dissipators.jl)
# --------------------------------------------------------------------------- #


@pytree_dataclass
class LinearDissipator:
    """Jump operator with constant rate: effective operator L * sqrt(rate)."""

    L: jnp.ndarray
    rate: jnp.ndarray

    def __init__(self, L, rate=1.0):
        object.__setattr__(self, "L", _cplx(L))
        object.__setattr__(self, "rate", jnp.asarray(rate, jnp.result_type(float)))

    def rate_coeff(self, u):
        return self.rate

    def operator(self, u):
        return self.L * jnp.sqrt(self.rate_coeff(u))

    @property
    def control_dependent(self) -> bool:
        return False


@pytree_dataclass
class NonlinearDissipator:
    """Jump operator with control-dependent rate f(u) (reference: dissipators.jl:59)."""

    L: jnp.ndarray
    rate_fn: object = static_field(default=None)      # callable u -> rate >= 0

    def rate_coeff(self, u):
        return self.rate_fn(u)

    def operator(self, u):
        return self.L * jnp.sqrt(self.rate_coeff(u))

    @property
    def control_dependent(self) -> bool:
        return True


# --------------------------------------------------------------------------- #
# QuantumSystem
# --------------------------------------------------------------------------- #


def _normalize_drive_terms(H_drives):
    """Turn a list of matrices / (matrix, modulation) pairs / typed drive
    terms into a tuple of typed drive terms."""
    terms = []
    idx = 0
    for d in H_drives:
        if isinstance(d, (LinearDrive, NonlinearDrive, ModulatedDrive)):
            terms.append(d)
            if isinstance(d, LinearDrive) or (
                isinstance(d, ModulatedDrive) and isinstance(d.drive, LinearDrive)):
                idx += 1
        elif isinstance(d, tuple) and len(d) == 2 and callable(d[1]):
            # Pair syntax: (H, t -> b(t)) (reference: quantum_systems.jl:514)
            terms.append(ModulatedDrive(LinearDrive(_cplx(d[0]), index=idx), b=d[1]))
            idx += 1
        else:
            terms.append(LinearDrive(_cplx(d), index=idx))
            idx += 1
    return tuple(terms)


def _count_linear_controls(drive_terms) -> int:
    n = 0
    for d in drive_terms:
        base = d.drive if isinstance(d, ModulatedDrive) else d
        if isinstance(base, LinearDrive):
            n = max(n, base.index + 1)
        elif isinstance(base, NonlinearDrive) and base.active_controls:
            n = max(n, max(base.active_controls) + 1)
    return n


@pytree_dataclass
class QuantumSystem:
    """Closed quantum system: H(u, t) = sum a_k(t) H_k + sum coeff_d(u,t) H_d.

    reference: src/quantum/systems/quantum_systems.jl:62-80.
    """

    drift_terms: tuple                      # tuple[DriftTerm]
    drive_terms: tuple                      # tuple of typed drives
    drive_bounds: jnp.ndarray               # [n_drives, 2]
    global_params: dict                     # name -> array leaf
    levels: int = static_field(default=0)
    n_drives: int = static_field(default=0)
    time_dependent: bool = static_field(default=False)
    hermitian: bool = static_field(default=True)
    H_fn: object = static_field(default=None)   # optional full H(u, t) callable

    def __init__(self, H_drift=None, H_drives=None, drive_bounds=None, *,
                 n_drives=None, global_params=None, H_fn=None, levels=None,
                 drift_terms=None, check: bool = True):
        if drift_terms is None:
            drift_terms = []
            if H_drift is not None:
                if isinstance(H_drift, DriftTerm):
                    drift_terms = [H_drift]
                elif isinstance(H_drift, (list, tuple)) and len(H_drift) and isinstance(
                        H_drift[0], DriftTerm):
                    drift_terms = list(H_drift)
                elif isinstance(H_drift, tuple) and len(H_drift) == 2 and callable(H_drift[1]):
                    drift_terms = [DriftTerm(_cplx(H_drift[0]), modulation=H_drift[1])]
                else:
                    drift_terms = [DriftTerm(_cplx(H_drift))]
        drift_terms = tuple(drift_terms)
        drive_terms = _normalize_drive_terms(H_drives or [])

        if levels is None:
            if drift_terms:
                levels = int(drift_terms[0].H.shape[-1])
            elif drive_terms:
                levels = int(drive_terms[0].H.shape[-1])
            else:
                raise ValueError("cannot infer system dimension")

        if n_drives is None:
            n_drives = _count_linear_controls(drive_terms)
            if n_drives == 0 and drive_terms:
                n_drives = len(drive_terms)

        hermitian = True
        if check:
            for dt in drift_terms:
                _check_hermitian(dt.H, "H_drift")
            for d in drive_terms:
                _check_hermitian(d.H, "H_drive")

        time_dependent = any(t.time_dependent for t in drift_terms) or any(
            d.time_dependent for d in drive_terms)

        object.__setattr__(self, "drift_terms", drift_terms)
        object.__setattr__(self, "drive_terms", drive_terms)
        object.__setattr__(self, "drive_bounds",
                           normalize_drive_bounds(drive_bounds, n_drives))
        object.__setattr__(self, "global_params", dict(global_params or {}))
        object.__setattr__(self, "levels", levels)
        object.__setattr__(self, "n_drives", int(n_drives))
        object.__setattr__(self, "time_dependent", bool(time_dependent))
        object.__setattr__(self, "hermitian", hermitian)
        object.__setattr__(self, "H_fn", H_fn)

    # -- construction helpers ------------------------------------------------

    @classmethod
    def from_function(cls, H_fn, n_drives: int, drive_bounds=None, levels=None,
                      time_dependent: bool = False, global_params=None):
        """Function-based system: H_fn(u, t) -> complex matrix
        (reference: quantum_systems.jl:108)."""
        if levels is None:
            levels = int(np.asarray(
                H_fn(jnp.zeros(n_drives), jnp.zeros(()))).shape[-1])
        obj = cls(H_drives=[], drive_bounds=drive_bounds, n_drives=n_drives,
                  H_fn=H_fn, levels=levels, global_params=global_params)
        object.__setattr__(obj, "time_dependent", bool(time_dependent))
        object.__setattr__(obj, "drive_bounds",
                           normalize_drive_bounds(drive_bounds, n_drives))
        return obj

    # -- Hamiltonian assembly ------------------------------------------------

    def H(self, u=None, t=0.0):
        """Complex Hamiltonian at controls u, time t."""
        u = jnp.zeros(self.n_drives) if u is None else jnp.asarray(u)
        t = jnp.asarray(t, dtype=jnp.result_type(float))
        if self.H_fn is not None:
            return _cplx(self.H_fn(u, t))
        dt = jnp.result_type(u.dtype, np.float32)
        cdtype = jnp.complex128 if dt == jnp.float64 else jnp.complex64
        Hm = jnp.zeros((self.levels, self.levels), dtype=cdtype)
        for term in self.drift_terms:
            Hm = Hm + term.coeff(t) * term.H
        for d in self.drive_terms:
            Hm = Hm + d.coeff(u, t) * d.H
        return Hm

    def G(self, u=None, t=0.0):
        """Real iso generator G = iso(-iH) (2n x 2n)."""
        return iso_mod.G(self.H(u, t))

    def get_drift(self):
        return self.H(jnp.zeros(self.n_drives), 0.0)

    def get_drives(self):
        return [d.H for d in self.drive_terms]

    def get_drive_terms(self):
        return list(self.drive_terms)

    @property
    def n_global_params(self) -> int:
        return sum(int(np.prod(np.shape(v))) for v in self.global_params.values())

    def with_global_params(self, params: dict) -> "QuantumSystem":
        new = dict(self.global_params)
        new.update(params)
        return self.replace(global_params=new)

    def solver_view(self) -> "RealGeneratorSystem":
        """Real-arithmetic view for the collocation solver (host-built).

        Precomputes the real iso generator of every Hamiltonian term so
        the NLP traces no complex ops: TPU's f64 x64 rewriter has no
        f64<->c128 conversions, and real f64 matmuls cost half their
        emulated-c128 equivalents (SURVEY.md section 7 design delta).
        """
        if self.H_fn is not None:
            raise ValueError(
                "function-based systems (H_fn) have no precomputable real "
                "generator; provide drift/drive matrices for the solver path")
        f64 = jnp.result_type(float)
        drift = tuple(
            DriftTerm(jnp.asarray(iso_mod.G(t.H), f64), modulation=t.modulation)
            for t in self.drift_terms)
        drives = tuple(
            _with_real_G(d, jnp.asarray(iso_mod.G(d.H), f64))
            for d in self.drive_terms)
        return RealGeneratorSystem(
            drift_terms=drift, drive_terms=drives,
            levels=self.levels, n_drives=self.n_drives,
            time_dependent=self.time_dependent)


def _with_real_G(d, Gmat):
    """Rebuild a drive term with its Hamiltonian replaced by the real iso
    generator (the coefficient structure is untouched)."""
    if isinstance(d, ModulatedDrive):
        return ModulatedDrive(_with_real_G(d.drive, Gmat), b=d.b)
    if isinstance(d, LinearDrive):
        return LinearDrive(Gmat, index=d.index)
    return NonlinearDrive(Gmat, f=d.f, active_controls=d.active_controls)


@pytree_dataclass
class RealGeneratorSystem:
    """Solver-side system view: REAL iso generators only.

    Built host-side by `QuantumSystem.solver_view()`. The collocation NLP
    assembles G(u, t) = sum coeff * G_term from these precomputed real
    matrices, so the jitted solver traces zero complex ops — required on
    TPU (the f64 x64 rewriter has no f64<->c128 conversions) and cheaper
    (a real f64 matmul is half an emulated-c128 one). Drive/drift terms
    here carry the real generator in their `H` slot; coefficient
    callables are reused unchanged.

    reference analogue: the reference also optimizes in the real iso
    space (src/control/integrators.jl:33-42 builds G(u) for Ipopt).
    """

    drift_terms: tuple = ()
    drive_terms: tuple = ()
    var_blocks: tuple = ()           # real variational generator blocks
    lind_drift: tuple = ()           # compact-iso Lindblad generator per drift
    lind_drives: tuple = ()          # ... per drive term
    diss_mats: tuple = ()            # unit-rate compact dissipator superops
    diss_rates: tuple = ()           # rate leaves (linear dissipators)
    levels: int = static_field(default=0)
    n_drives: int = static_field(default=0)
    time_dependent: bool = static_field(default=False)
    diss_rate_fns: tuple = static_field(default=())   # callables or None

    def G(self, u=None, t=0.0):
        """Real iso generator (2n x 2n): d/dt iso(x) = G(u, t) iso(x)."""
        u = jnp.zeros(self.n_drives) if u is None else jnp.asarray(u)
        m = 2 * self.levels
        Gm = jnp.zeros((m, m), jnp.result_type(u.dtype, jnp.float32))
        for term in self.drift_terms:
            Gm = Gm + term.coeff(t) * term.H
        for d in self.drive_terms:
            Gm = Gm + d.coeff(u, t) * d.H
        return Gm

    def var_G(self, u=None, t=0.0):
        """Block-triangular variational generator (real)."""
        return iso_mod.var_G(self.G(u, t), list(self.var_blocks))

    def compact_lindbladian(self, u=None, t=0.0):
        """Real compact-iso Lindblad generator (n^2 x n^2)."""
        u = jnp.zeros(self.n_drives) if u is None else jnp.asarray(u)
        m = self.levels * self.levels
        A = jnp.zeros((m, m), jnp.result_type(u.dtype, jnp.float32))
        for term, Am in zip(self.drift_terms, self.lind_drift):
            A = A + term.coeff(t) * Am
        for d, Am in zip(self.drive_terms, self.lind_drives):
            A = A + d.coeff(u, t) * Am
        for i, Dm in enumerate(self.diss_mats):
            fn = self.diss_rate_fns[i]
            rate = self.diss_rates[i] if fn is None else fn(u)
            A = A + rate * Dm
        return A


# --------------------------------------------------------------------------- #
# OpenQuantumSystem
# --------------------------------------------------------------------------- #


@pytree_dataclass
class OpenQuantumSystem(QuantumSystem):
    """Lindblad open system: Hamiltonian terms + dissipators.

    reference: src/quantum/systems/open_quantum_systems.jl.
    """

    dissipators: tuple = ()

    def __init__(self, H_drift=None, H_drives=None, drive_bounds=None, *,
                 dissipators=None, dissipation_operators=None, **kw):
        diss = []
        for d in (dissipators or dissipation_operators or []):
            if isinstance(d, (LinearDissipator, NonlinearDissipator)):
                diss.append(d)
            else:
                diss.append(LinearDissipator(d))
        QuantumSystem.__init__(self, H_drift, H_drives, drive_bounds, **kw)
        object.__setattr__(self, "dissipators", tuple(diss))
        object.__setattr__(self, "hermitian", False)

    @property
    def dissipation_operators(self):
        return [d.L for d in self.dissipators]

    def liouvillian_iso(self, u=None, t=0.0):
        """Real iso superoperator generator on the full density iso-vec
        (2n^2 x 2n^2): d/dt iso_vec(rho) = L_iso @ iso_vec(rho).

        reference compact-path analogue: open_quantum_systems.jl:541-607.
        """
        u = jnp.zeros(self.n_drives) if u is None else jnp.asarray(u)
        Hm = self.H(u, t)
        Lsup = iso_mod.iso(-1j * iso_mod.ad_vec(Hm))
        for d in self.dissipators:
            Lop = d.operator(u)
            LdL = jnp.conj(Lop).T @ Lop
            Lsup = Lsup + iso_mod.iso(
                jnp.kron(jnp.conj(Lop), Lop) - 0.5 * iso_mod.ad_vec(LdL, anti=True))
        return Lsup

    def compact_lindbladian(self, u=None, t=0.0):
        """Real generator on the compact density iso (n^2 x n^2):
        d/dt compact(rho) = A(u) @ compact(rho).

        Built as P @ L_iso @ Lift where P/Lift are the static compact<->full
        maps (reference: open_quantum_systems.jl:541-607)."""
        n = self.levels
        P = iso_mod.density_projection_matrix(n)
        Lf = iso_mod.density_lift_matrix(n)
        return P @ self.liouvillian_iso(u, t) @ Lf

    def lindblad_rhs(self, rho, u=None, t=0.0):
        """drho/dt = -i[H, rho] + sum_j D[L_j](rho) in complex matrix form."""
        u = jnp.zeros(self.n_drives) if u is None else jnp.asarray(u)
        Hm = self.H(u, t)
        out = -1j * (Hm @ rho - rho @ Hm)
        for d in self.dissipators:
            Lop = d.operator(u)
            LdL = jnp.conj(Lop).T @ Lop
            out = out + Lop @ rho @ jnp.conj(Lop).T - 0.5 * (LdL @ rho + rho @ LdL)
        return out

    def solver_view(self) -> "RealGeneratorSystem":
        """Real view including precomputed compact-Lindbladian parts.

        Every Hamiltonian term contributes a constant real n^2 x n^2
        compact generator (its coefficient multiplies linearly); each
        dissipator contributes a unit-rate superoperator scaled by its
        (possibly control-dependent) rate — the compact-path analogue of
        reference open_quantum_systems.jl:541-607."""
        base = QuantumSystem.solver_view(self)
        n = self.levels
        f64 = jnp.result_type(float)
        P = iso_mod.density_projection_matrix(n)
        Lf = iso_mod.density_lift_matrix(n)

        def compact_h(X):
            return jnp.asarray(
                P @ iso_mod.iso(-1j * iso_mod.ad_vec(X)) @ Lf, f64)

        lind_drift = tuple(compact_h(t.H) for t in self.drift_terms)
        lind_drives = tuple(compact_h(d.H) for d in self.drive_terms)
        diss_mats, diss_rates, diss_fns = [], [], []
        for d in self.dissipators:
            diss_mats.append(jnp.asarray(P @ iso_mod.iso_D(d.L) @ Lf, f64))
            if isinstance(d, NonlinearDissipator):
                diss_rates.append(jnp.zeros(()))
                diss_fns.append(d.rate_fn)
            else:
                diss_rates.append(jnp.asarray(d.rate, f64))
                diss_fns.append(None)
        return base.replace(
            lind_drift=lind_drift, lind_drives=lind_drives,
            diss_mats=tuple(diss_mats), diss_rates=tuple(diss_rates),
            diss_rate_fns=tuple(diss_fns))


# --------------------------------------------------------------------------- #
# VariationalQuantumSystem
# --------------------------------------------------------------------------- #


@pytree_dataclass
class VariationalQuantumSystem(QuantumSystem):
    """System with variational perturbation directions H + sum_i eps_i H_var_i.

    reference: src/quantum/systems/variational_quantum_systems.jl:25-111.
    """

    H_vars: tuple = ()
    variational_scales: jnp.ndarray = None

    def __init__(self, H_drift=None, H_drives=None, drive_bounds=None, *,
                 H_vars=None, variational_scales=None, **kw):
        QuantumSystem.__init__(self, H_drift, H_drives, drive_bounds, **kw)
        H_vars = tuple(_cplx(Hv) for Hv in (H_vars or []))
        if variational_scales is None:
            variational_scales = jnp.ones(len(H_vars))
        object.__setattr__(self, "H_vars", H_vars)
        object.__setattr__(self, "variational_scales",
                           jnp.asarray(variational_scales, jnp.result_type(float)))

    @property
    def n_vars(self) -> int:
        return len(self.H_vars)

    def G_vars(self):
        """Iso generators of the perturbation directions (scaled)."""
        return [iso_mod.G(s * Hv)
                for s, Hv in zip(self.variational_scales, self.H_vars)]

    def var_G(self, u=None, t=0.0):
        """Block-triangular variational generator acting on stacked
        [base; sensitivity_1; ...] iso states (isomorphisms.var_G)."""
        return iso_mod.var_G(self.G(u, t), self.G_vars())

    def solver_view(self) -> "RealGeneratorSystem":
        base = QuantumSystem.solver_view(self)
        f64 = jnp.result_type(float)
        return base.replace(
            var_blocks=tuple(jnp.asarray(Gv, f64) for Gv in self.G_vars()))


# --------------------------------------------------------------------------- #
# CompositeQuantumSystem
# --------------------------------------------------------------------------- #


@pytree_dataclass
class CompositeQuantumSystem(QuantumSystem):
    """Tensor-product composition of subsystems with coupling terms.

    Subsystem drift/drive terms are lifted to the full space; coupling
    drift/drives act on the full space directly
    (reference: src/quantum/systems/composite_quantum_systems.jl:38-249).
    """

    subsystems: tuple = ()
    subsystem_levels: tuple = static_field(default=())

    def __init__(self, subsystems, H_drift=None, H_drives=None,
                 drive_bounds=None, **kw):
        subsystems = tuple(subsystems)
        sub_levels = tuple(int(s.levels) for s in subsystems)
        total = int(np.prod(sub_levels))

        drift_terms = []
        if H_drift is not None:
            drift_terms.append(DriftTerm(_cplx(H_drift)))
        drive_terms = list(_normalize_drive_terms(H_drives or []))
        n_coupling_drives = _count_linear_controls(drive_terms)

        # Lift subsystem terms into the full space, re-indexing their controls
        # after the coupling controls.
        idx_offset = n_coupling_drives
        for i, sub in enumerate(subsystems):
            for term in sub.drift_terms:
                lifted = _lift_jnp(term.H, i, sub_levels)
                drift_terms.append(DriftTerm(lifted, modulation=term.modulation))
            for d in sub.drive_terms:
                base = d.drive if isinstance(d, ModulatedDrive) else d
                liftedH = _lift_jnp(base.H, i, sub_levels)
                if isinstance(base, LinearDrive):
                    nb = LinearDrive(liftedH, index=idx_offset + base.index)
                else:
                    off = idx_offset
                    f0 = base.f
                    ac = base.active_controls
                    nsub = sub.n_drives
                    nb = NonlinearDrive(
                        liftedH,
                        f=_OffsetCoeff(f0, off, nsub),
                        active_controls=tuple(off + a for a in (ac or range(nsub))))
                if isinstance(d, ModulatedDrive):
                    nb = ModulatedDrive(nb, b=d.b)
                drive_terms.append(nb)
            idx_offset += sub.n_drives

        n_drives = idx_offset

        bounds = []
        cb = normalize_drive_bounds(drive_bounds, n_coupling_drives) \
            if n_coupling_drives else jnp.zeros((0, 2))
        bounds.append(cb)
        for sub in subsystems:
            bounds.append(sub.drive_bounds)
        all_bounds = jnp.concatenate(bounds, axis=0) if n_drives else None

        QuantumSystem.__init__(
            self, drift_terms=drift_terms, H_drives=drive_terms,
            drive_bounds=None, n_drives=n_drives, levels=total,
            check=False, **kw)
        if all_bounds is not None:
            object.__setattr__(self, "drive_bounds", all_bounds)
        object.__setattr__(self, "subsystems", subsystems)
        object.__setattr__(self, "subsystem_levels", sub_levels)


class _OffsetCoeff:
    """Re-index a subsystem nonlinear drive coefficient into composite controls.

    A named (hashable-by-fields) callable so identically-built composites
    share trace caches."""

    def __init__(self, f, offset: int, n: int):
        self.f = f
        self.offset = offset
        self.n = n

    def __call__(self, u):
        return self.f(jax.lax.dynamic_slice(u, (self.offset,), (self.n,)))

    def __hash__(self):
        return hash((self.f, self.offset, self.n))

    def __eq__(self, other):
        return (isinstance(other, _OffsetCoeff)
                and (self.f, self.offset, self.n) == (other.f, other.offset, other.n))


def _lift_jnp(H, index: int, subsystem_levels):
    """kron-lift a (possibly traced) operator into the composite space."""
    out = jnp.ones((1, 1), dtype=H.dtype)
    for i, l in enumerate(subsystem_levels):
        out = jnp.kron(out, H if i == index else jnp.eye(l, dtype=H.dtype))
    return out
