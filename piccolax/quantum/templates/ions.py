"""Trapped-ion system templates.

TPU-native counterpart of the reference ion templates
(reference: src/quantum/templates/ions/ion_chain.jl:82,213 and
radial_ms.jl:101,291 — the IEEE TQE 2024 radial-mode MS model).
"""

from __future__ import annotations

import numpy as np

from ..operators import annihilate, lift_operator
from ..systems import LinearDrive, ModulatedDrive, NonlinearDrive, QuantumSystem

__all__ = [
    "IonChainSystem",
    "MolmerSorensenCoupling",
    "RadialMSGateSystem",
    "RadialMSGateSystemWithPhase",
]


def _sigma_ops(ion_levels: int):
    sp = np.zeros((ion_levels, ion_levels), dtype=complex)
    sp[1, 0] = 1.0
    sm = sp.conj().T
    sx = sp + sm
    sy = -1j * (sp - sm)
    return sp, sm, sx, sy


def IonChainSystem(*, N_ions: int = 2, ion_levels: int = 2, N_modes: int = 1,
                   mode_levels: int = 10, omega_q=1.0, omega_m=0.1, eta=0.1,
                   lab_frame: bool = False, frame_omega: float | None = None,
                   multiply_by_2pi: bool = True,
                   drive_bounds=None) -> QuantumSystem:
    """Ion chain: qubits + motional modes with Lamb-Dicke sigma_x (x) x_m
    coupling; X/Y drives per ion (reference: ion_chain.jl:82-174)."""
    wq = np.broadcast_to(np.atleast_1d(omega_q), (N_ions,)).astype(float)
    wm = np.broadcast_to(np.atleast_1d(omega_m), (N_modes,)).astype(float)
    eta_mat = np.broadcast_to(np.atleast_2d(eta), (N_ions, N_modes)).astype(float)
    if frame_omega is None:
        frame_omega = 0.0 if lab_frame else float(wq[0])

    levels = [ion_levels] * N_ions + [mode_levels] * N_modes
    total = int(np.prod(levels))
    sp, sm, sx, sy = _sigma_ops(ion_levels)

    H_drift = np.zeros((total, total), dtype=complex)
    for i in range(N_ions):
        detuning = wq[i] - frame_omega
        H_drift += detuning * lift_operator(sp.conj().T @ sp, i, levels)
    a = annihilate(mode_levels)
    for mth in range(N_modes):
        H_drift += wm[mth] * lift_operator(a.conj().T @ a, N_ions + mth, levels)
    for i in range(N_ions):
        sx_i = lift_operator(sx, i, levels)
        for mth in range(N_modes):
            x_m = lift_operator(a + a.conj().T, N_ions + mth, levels)
            H_drift += eta_mat[i, mth] * sx_i @ x_m

    H_drives = []
    for i in range(N_ions):
        H_drives.append(lift_operator(sx, i, levels))
        H_drives.append(lift_operator(sy, i, levels))

    if multiply_by_2pi:
        H_drift = 2 * np.pi * H_drift
        H_drives = [2 * np.pi * H for H in H_drives]
    if drive_bounds is None:
        drive_bounds = 1.0
    return QuantumSystem(H_drift, H_drives, drive_bounds)


def MolmerSorensenCoupling(N_ions: int, N_modes: int, ion_levels: int,
                           mode_levels: int) -> np.ndarray:
    """MS interaction sum_{i<j} sigma_x^i sigma_x^j in the full space
    (reference: ion_chain.jl:213)."""
    levels = [ion_levels] * N_ions + [mode_levels] * N_modes
    total = int(np.prod(levels))
    _, _, sx, _ = _sigma_ops(ion_levels)
    H = np.zeros((total, total), dtype=complex)
    for i in range(N_ions - 1):
        for j in range(i + 1, N_ions):
            H += lift_operator(sx, i, levels) @ lift_operator(sx, j, levels)
    return H


class _CosMod:
    """cos(w t) modulation as a hashable named callable."""

    def __init__(self, w: float):
        self.w = float(w)

    def __call__(self, t):
        import jax.numpy as jnp
        return jnp.cos(self.w * t)

    def __hash__(self):
        return hash(("cos", self.w))

    def __eq__(self, o):
        return isinstance(o, _CosMod) and o.w == self.w


class _SinMod(_CosMod):
    def __call__(self, t):
        import jax.numpy as jnp
        return jnp.sin(self.w * t)

    def __hash__(self):
        return hash(("sin", self.w))

    def __eq__(self, o):
        return isinstance(o, _SinMod) and o.w == self.w


def _radial_ms_terms(N_ions, mode_levels, delta_vec, eta_mat,
                     multiply_by_2pi, coeff_for_ion):
    """Shared construction of the modulated MS drive terms.

    H(t) = sum_{j,k} eta_jk Omega_j(t) sigma_x_j [cos(d_k t) P_k + sin(d_k t) Q_k]
    with P_k = -i/2 (a_k - a_k'), Q_k = -1/2 (a_k + a_k') (both Hermitian)
    — the interaction-picture radial MS Hamiltonian
    (reference: radial_ms.jl:135-161).
    """
    N_modes = 2 * N_ions
    levels = [2] * N_ions + [mode_levels] * N_modes
    _, _, sx, _ = _sigma_ops(2)
    a = annihilate(mode_levels)
    scale = 2 * np.pi if multiply_by_2pi else 1.0

    terms = []
    for j in range(N_ions):
        sx_j = lift_operator(sx, j, levels)
        for k in range(N_modes):
            if abs(eta_mat[j, k]) < 1e-12:
                continue
            a_op = lift_operator(a, N_ions + k, levels)
            P = -0.5j * (a_op - a_op.conj().T)
            Q = -0.5 * (a_op + a_op.conj().T)
            Hp = scale * eta_mat[j, k] * sx_j @ P
            Hq = scale * eta_mat[j, k] * sx_j @ Q
            base_p = coeff_for_ion(j, Hp)
            base_q = coeff_for_ion(j, Hq)
            terms.append(ModulatedDrive(base_p, b=_CosMod(delta_vec[k])))
            terms.append(ModulatedDrive(base_q, b=_SinMod(delta_vec[k])))
    return terms, levels


def RadialMSGateSystem(*, N_ions: int = 2, mode_levels: int = 5,
                       omega_m_radial=None, delta=0.2, eta=0.1,
                       multiply_by_2pi: bool = True,
                       drive_bounds=None) -> QuantumSystem:
    """Radial-mode Molmer-Sorensen gate system: N_ions qubits, 2*N_ions
    radial modes, per-ion amplitude controls with time-modulated
    sideband couplings (reference: radial_ms.jl:101)."""
    N_modes = 2 * N_ions
    delta_vec = np.broadcast_to(np.atleast_1d(delta), (N_modes,)).astype(float)
    eta_mat = np.broadcast_to(np.atleast_2d(eta), (N_ions, N_modes)).astype(float)

    def coeff(j, H):
        return LinearDrive(H, index=j)

    terms, levels = _radial_ms_terms(N_ions, mode_levels, delta_vec, eta_mat,
                                     multiply_by_2pi, coeff)
    total = int(np.prod(levels))
    if drive_bounds is None:
        drive_bounds = [1.0] * N_ions
    return QuantumSystem(np.zeros((total, total)), terms, drive_bounds,
                         n_drives=N_ions)


class _AmpPhaseCoeff:
    """Omega_j * cos(phi_j) or * sin(phi_j) over controls
    [amps; phases] (hashable)."""

    def __init__(self, j: int, n_ions: int, quadrature: str):
        self.j = j
        self.n = n_ions
        self.quad = quadrature

    def __call__(self, u):
        import jax.numpy as jnp
        amp = u[self.j]
        phase = u[self.n + self.j]
        trig = jnp.cos(phase) if self.quad == "cos" else jnp.sin(phase)
        return amp * trig

    def __hash__(self):
        return hash(("ampphase", self.j, self.n, self.quad))

    def __eq__(self, o):
        return isinstance(o, _AmpPhaseCoeff) and \
            (o.j, o.n, o.quad) == (self.j, self.n, self.quad)


def RadialMSGateSystemWithPhase(*, N_ions: int = 2, mode_levels: int = 5,
                                omega_m_radial=None, delta=0.2, eta=0.1,
                                multiply_by_2pi: bool = True,
                                amplitude_bounds=None, phase_bounds=None
                                ) -> QuantumSystem:
    """Phase-compensated radial MS: controls are per-ion (amplitude, phase)
    pairs with Omega_j e^{i phi_j} drive phasors
    (reference: radial_ms.jl:291)."""
    N_modes = 2 * N_ions
    delta_vec = np.broadcast_to(np.atleast_1d(delta), (N_modes,)).astype(float)
    eta_mat = np.broadcast_to(np.atleast_2d(eta), (N_ions, N_modes)).astype(float)
    n_drives = 2 * N_ions

    def coeff(j, H):
        # amplitude*cos(phase) on the P quadrature; the ModulatedDrive
        # wrapper adds the sideband time modulation on top. sin-phase
        # terms enter through the paired Q-quadrature operator.
        return NonlinearDrive(H, f=_AmpPhaseCoeff(j, N_ions, "cos"),
                              active_controls=(j, N_ions + j))

    terms, levels = _radial_ms_terms(N_ions, mode_levels, delta_vec, eta_mat,
                                     multiply_by_2pi, coeff)
    total = int(np.prod(levels))
    bounds = []
    amplitude_bounds = amplitude_bounds or [1.0] * N_ions
    phase_bounds = phase_bounds or [(-np.pi, np.pi)] * N_ions
    bounds = list(amplitude_bounds) + list(phase_bounds)
    return QuantumSystem(np.zeros((total, total)), terms, bounds,
                         n_drives=n_drives)
