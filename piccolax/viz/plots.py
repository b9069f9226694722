"""Visualization: pulses, populations, Bloch/Wigner (matplotlib).

TPU-native counterpart of the reference visualization layer
(reference: src/visualizations/quantum_objects/pulse_plots.jl,
unitary_populations.jl, state_populations.jl;
ext/PiccoloQuantumToolboxExt.jl Bloch/Wigner). Matplotlib replaces the
Makie weak-dependency extensions; every function returns the Figure so
callers can save or compose.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "plot_pulse",
    "plot_pulse_IQ",
    "plot_pulse_phases",
    "plot_unitary_populations",
    "plot_state_populations",
    "plot_bloch_trajectory",
    "plot_wigner",
    "weyl_coordinates",
    "plot_weyl_trajectory",
    "animate_pulse",
    "animate_populations",
    "animate_bloch",
    "animate_wigner",
    "rydberg_populations",
    "plot_rydberg_chain",
    "animate_rydberg_chain",
    "LivePulsePlot",
]


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _pulse_samples(pulse, n: int = 400):
    import jax

    times = np.linspace(0.0, float(np.asarray(pulse.duration)), n)
    us = np.asarray(jax.vmap(pulse)(times))
    return times, us


def plot_pulse(pulse, *, n_samples: int = 400, show_knots: bool = True,
               bounds=None, ax=None, labels=None):
    """Type-aware pulse rendering: dense curve + knot markers for spline
    pulses, step plot for ZOH (reference: pulse_plots.jl:1-168)."""
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 3.2))
    else:
        fig = ax.figure
    from ..quantum.pulses import ZeroOrderPulse

    times, us = _pulse_samples(pulse, n_samples)
    d = us.shape[1]
    labels = labels or [f"u{i + 1}" for i in range(d)]
    for i in range(d):
        if isinstance(pulse, ZeroOrderPulse):
            kt = np.asarray(pulse.knot_times())
            kv = np.asarray(pulse.knot_values())
            ax.step(kt, kv[:, i], where="post", label=labels[i])
        else:
            ax.plot(times, us[:, i], label=labels[i])
            if show_knots and hasattr(pulse, "knot_times"):
                try:
                    kt = np.asarray(pulse.knot_times())
                    kv = np.asarray(pulse.knot_values())
                    ax.plot(kt, kv[:, i], ".", ms=5)
                except TypeError:
                    pass
    if bounds is not None:
        b = np.asarray(bounds)
        for i in range(min(d, b.shape[0])):
            ax.axhline(b[i, 0], color="gray", lw=0.5, ls="--")
            ax.axhline(b[i, 1], color="gray", lw=0.5, ls="--")
    ax.set_xlabel("t")
    ax.set_ylabel("u(t)")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    return fig


def plot_pulse_IQ(pulse, *, n_samples: int = 400):
    """IQ-pair rendering: drives (2i, 2i+1) as I/Q of channel i
    (reference: pulse_plots.jl:666)."""
    plt = _mpl()
    times, us = _pulse_samples(pulse, n_samples)
    d = us.shape[1]
    n_ch = d // 2
    fig, axes = plt.subplots(n_ch, 1, figsize=(8, 2.6 * n_ch), squeeze=False)
    for c in range(n_ch):
        ax = axes[c, 0]
        ax.plot(times, us[:, 2 * c], label=f"I{c + 1}")
        ax.plot(times, us[:, 2 * c + 1], label=f"Q{c + 1}")
        ax.legend(fontsize=8)
        ax.set_ylabel(f"ch {c + 1}")
    axes[-1, 0].set_xlabel("t")
    fig.tight_layout()
    return fig


def plot_pulse_phases(pulse, *, n_samples: int = 400):
    """Magnitude + unwrapped phase of IQ pairs (reference: pulse_plots.jl:772)."""
    plt = _mpl()
    times, us = _pulse_samples(pulse, n_samples)
    n_ch = us.shape[1] // 2
    fig, axes = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    for c in range(n_ch):
        z = us[:, 2 * c] + 1j * us[:, 2 * c + 1]
        axes[0].plot(times, np.abs(z), label=f"|ch{c + 1}|")
        axes[1].plot(times, np.unwrap(np.angle(z)), label=f"arg ch{c + 1}")
    axes[0].set_ylabel("magnitude")
    axes[1].set_ylabel("phase (rad)")
    axes[1].set_xlabel("t")
    for a in axes:
        a.legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_unitary_populations(qtraj, *, columns=None):
    """|U_ij(t)|^2 transfer populations from the cached rollout
    (reference: unitary_populations.jl:104)."""
    plt = _mpl()
    times = np.asarray(qtraj.times)
    Us = np.asarray(qtraj.Us)
    n = Us.shape[-1]
    columns = range(n) if columns is None else columns
    fig, axes = plt.subplots(1, len(list(columns)), figsize=(4 * n, 3),
                             squeeze=False)
    for ax_i, j in enumerate(columns):
        ax = axes[0, ax_i]
        for i in range(n):
            ax.plot(times, np.abs(Us[:, i, j]) ** 2,
                    label=rf"$|U_{{{i}{j}}}|^2$")
        ax.set_title(f"column {j}")
        ax.set_xlabel("t")
        ax.legend(fontsize=7)
    fig.tight_layout()
    return fig


def plot_state_populations(qtraj, *, subspace=None):
    """|psi_i(t)|^2 state populations (reference: state_populations.jl:101)."""
    plt = _mpl()
    times = np.asarray(qtraj.times)
    psis = np.asarray(qtraj.psis)
    pops = np.abs(psis) ** 2
    idx = range(pops.shape[-1]) if subspace is None else subspace
    fig, ax = plt.subplots(figsize=(8, 3.2))
    for i in idx:
        ax.plot(times, pops[..., i].reshape(len(times), -1)[:, 0],
                label=rf"$|\psi_{{{i}}}|^2$")
    ax.set_xlabel("t")
    ax.set_ylabel("population")
    ax.legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_bloch_trajectory(qtraj):
    """Bloch-sphere path of a 2-level ket trajectory
    (reference: quantum_toolbox.jl plot_bloch)."""
    plt = _mpl()
    psis = np.asarray(qtraj.psis)
    from ..quantum.gates import PAULIS

    xyz = []
    for psi in psis:
        rho = np.outer(psi, psi.conj())
        xyz.append([np.real(np.trace(rho @ PAULIS[p]))
                    for p in ("X", "Y", "Z")])
    xyz = np.array(xyz)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    u, v = np.mgrid[0:2 * np.pi:40j, 0:np.pi:20j]
    ax.plot_wireframe(np.cos(u) * np.sin(v), np.sin(u) * np.sin(v),
                      np.cos(v), color="lightgray", lw=0.3)
    ax.plot(xyz[:, 0], xyz[:, 1], xyz[:, 2], lw=2)
    ax.scatter(*xyz[0], color="green", s=40)
    ax.scatter(*xyz[-1], color="red", s=40)
    return fig


def _wigner_grid(rho, xs):
    """W(x, p) over a grid via the displaced-parity formula.

    rho is zero-padded so the displacement operators at the grid edges
    are accurate — D(alpha) on a space truncated near the state's own
    support produces O(1) artifacts for |alpha| beyond a few photons.
    """
    rho = np.asarray(rho)
    n = rho.shape[0]
    from scipy.linalg import expm as _expm

    r_max = np.sqrt(2.0) * float(np.max(np.abs(xs)))
    n_pad = max(n, int(np.ceil((r_max + 2.0) ** 2)))
    rho_p = np.zeros((n_pad, n_pad), dtype=complex)
    rho_p[:n, :n] = rho
    a = np.diag(np.sqrt(np.arange(1, n_pad)), 1)
    parity = (-1.0) ** np.arange(n_pad)
    X, P = np.meshgrid(xs, xs)                     # [g, g]
    alphas = (X + 1j * P).ravel() / np.sqrt(2)

    import jax
    import jax.numpy as jnp

    ad, aj = jnp.asarray(a.conj().T), jnp.asarray(a)
    rho_j, par = jnp.asarray(rho_p), jnp.asarray(parity)

    def w_at(alpha):
        D = jax.scipy.linalg.expm(alpha * ad - jnp.conj(alpha) * aj)
        # Tr[rho D diag(parity) D^dag] without forming the product
        M = D.conj().T @ rho_j @ D
        return (2 / jnp.pi) * jnp.real(jnp.sum(jnp.diag(M) * par))

    with jax.default_device(jax.devices("cpu")[0]):
        vals = jax.jit(jax.vmap(w_at))(jnp.asarray(alphas))
    return np.asarray(vals).reshape(len(xs), len(xs))


def plot_wigner(rho, *, xrange=(-4, 4), n_grid: int = 101):
    """Wigner quasi-probability of a density matrix via the displaced-parity
    formula (reference: quantum_toolbox.jl plot_wigner)."""
    plt = _mpl()
    xs = np.linspace(*xrange, n_grid)
    W = _wigner_grid(rho, xs)
    fig, ax = plt.subplots(figsize=(5, 4.4))
    vmax = np.abs(W).max()
    im = ax.pcolormesh(xs, xs, W, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
    fig.colorbar(im, ax=ax, label="W(x, p)")
    ax.set_xlabel("x")
    ax.set_ylabel("p")
    fig.tight_layout()
    return fig


def weyl_coordinates(U):
    """Weyl-chamber coordinates (c1, c2, c3)/pi of a 4x4 two-qubit
    unitary via the Makhlin local invariants (eigenphases of U Utilde
    with Utilde = (Y x Y) U^T (Y x Y); reference semantics:
    weyl_trajectory.jl:2-27)."""
    from ..quantum.gates import PAULIS

    U = np.asarray(U)
    if U.shape != (4, 4):
        raise ValueError(f"expected a 4x4 unitary, got {U.shape}")
    yy = np.kron(np.asarray(PAULIS["Y"]), np.asarray(PAULIS["Y"]))
    Ut = yy @ U.T @ yy
    ev = np.linalg.eigvals(U @ Ut / np.sqrt(complex(np.linalg.det(U))))
    two_s = np.angle(ev) / np.pi
    two_s = np.where(two_s <= -0.5, two_s + 2.0, two_s)
    s = np.sort(two_s / 2.0)[::-1]
    n = int(round(s.sum()))
    s = s - np.concatenate([np.ones(n), np.zeros(4 - n)])
    s = np.roll(s, -n)
    mix = np.array([[1, 1, 0], [1, 0, 1], [0, 1, 1]], dtype=float)
    c1, c2, c3 = mix @ s[:3]
    if c3 < 0:
        c1, c3 = 1.0 - c1, -c3
    return np.array([c1, c2, c3])


def plot_weyl_trajectory(qtraj_or_Us, ax=None):
    """Two-qubit gate path through the Weyl chamber
    (reference: weyl_trajectory.jl:31). Accepts a UnitaryTrajectory or an
    array of unitaries [T, 4, 4]; draws the chamber edges + the
    perfect-entangler polytope and the c1c2c3 path."""
    plt = _mpl()
    Us = np.asarray(getattr(qtraj_or_Us, "Us", qtraj_or_Us))
    pts = np.array([weyl_coordinates(U) for U in Us])
    if ax is None:
        fig = plt.figure(figsize=(6, 5))
        ax = fig.add_subplot(projection="3d")
    else:
        fig = ax.figure
    O = np.array([0, 0, 0.0])
    A1 = np.array([1, 0, 0.0])
    A2 = np.array([0.5, 0.5, 0.0])
    A3 = np.array([0.5, 0.5, 0.5])
    L = np.array([0.5, 0, 0.0])
    M = np.array([0.75, 0.25, 0.0])
    Nn = np.array([0.75, 0.25, 0.25])
    P = np.array([0.25, 0.25, 0.25])
    Q = np.array([0.25, 0.25, 0.0])
    for a, b in ((O, A1), (A1, A2), (A2, A3), (A3, A1), (A3, O), (O, A2)):
        ax.plot(*np.stack([a, b]).T, color="black", lw=1)
    # perfect-entangler polytope edges
    for a, b in ((L, M), (L, Q), (Q, P), (P, A2), (L, Nn), (L, P),
                 (Nn, P), (Nn, A2), (Nn, M)):
        ax.plot(*np.stack([a, b]).T, color="gray", lw=0.8, linestyle="--")
    ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], color="tab:red", lw=2)
    ax.scatter(*pts[0], color="green", s=40)
    ax.scatter(*pts[-1], color="red", s=40)
    ax.set_xlabel(r"$c_1/\pi$")
    ax.set_ylabel(r"$c_2/\pi$")
    ax.set_zlabel(r"$c_3/\pi$")
    return fig


def animate_pulse(pulses, path=None, *, fps: int = 10, n_samples: int = 200):
    """Animate a sequence of pulses (e.g. per-iteration snapshots from
    LivePulsePlot) into a matplotlib FuncAnimation
    (reference: animations.jl:65-184 / animate_pulse)."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation

    import jax

    frames = []
    for p in pulses:
        t, u = _pulse_samples(p, n_samples)
        frames.append((t, u))
    fig, ax = plt.subplots(figsize=(8, 3.2))
    lo = min(u.min() for _, u in frames)
    hi = max(u.max() for _, u in frames)
    pad = 0.05 * max(hi - lo, 1e-9)
    d = frames[0][1].shape[1]
    lines = [ax.plot([], [], label=f"u{i + 1}")[0] for i in range(d)]
    ax.set_xlim(0, max(t[-1] for t, _ in frames))
    ax.set_ylim(lo - pad, hi + pad)
    ax.set_xlabel("t")
    ax.legend(fontsize=8)

    def update(i):
        t, u = frames[i]
        for j, ln in enumerate(lines):
            ln.set_data(t, u[:, j])
        ax.set_title(f"iteration {i}")
        return lines

    anim = FuncAnimation(fig, update, frames=len(frames),
                         interval=1000 // fps, blit=False)
    if path is not None:
        anim.save(path, writer="pillow", fps=fps)
    return anim


def animate_populations(qtraj, path=None, *, fps: int = 20):
    """Animate unitary column populations over time
    (reference: animations.jl animate_name)."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation

    times = np.asarray(qtraj.times)
    Us = np.asarray(qtraj.Us)
    n = Us.shape[-1]
    pops = np.abs(Us[:, :, 0]) ** 2           # first-column populations
    fig, ax = plt.subplots(figsize=(6, 3.2))
    bars = ax.bar(range(n), pops[0])
    ax.set_ylim(0, 1.05)
    ax.set_xlabel("level")
    ax.set_ylabel("population")

    def update(i):
        for b, h in zip(bars, pops[i]):
            b.set_height(h)
        ax.set_title(f"t = {times[i]:.2f}")
        return bars

    anim = FuncAnimation(fig, update, frames=len(times),
                         interval=1000 // fps, blit=False)
    if path is not None:
        anim.save(path, writer="pillow", fps=fps)
    return anim


def animate_bloch(qtraj_or_psis, path=None, *, fps: int = 20,
                  stride: int = 1):
    """Animate a 2-level ket's Bloch-sphere path as it evolves
    (reference: PiccoloQuantumToolboxExt.jl:145-233 animate_bloch —
    Makie recording replaced by a matplotlib FuncAnimation)."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation

    from ..quantum.gates import PAULIS

    psis = np.asarray(getattr(qtraj_or_psis, "psis", qtraj_or_psis))
    xyz = []
    for psi in psis[::stride]:
        rho = np.outer(psi, psi.conj())
        xyz.append([np.real(np.trace(rho @ PAULIS[p]))
                    for p in ("X", "Y", "Z")])
    xyz = np.array(xyz)
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    u, v = np.mgrid[0:2 * np.pi:40j, 0:np.pi:20j]
    ax.plot_wireframe(np.cos(u) * np.sin(v), np.sin(u) * np.sin(v),
                      np.cos(v), color="lightgray", lw=0.3)
    (trail,) = ax.plot([], [], [], lw=2)
    head = ax.scatter([], [], [], color="red", s=40)

    def update(i):
        trail.set_data(xyz[: i + 1, 0], xyz[: i + 1, 1])
        trail.set_3d_properties(xyz[: i + 1, 2])
        head._offsets3d = ([xyz[i, 0]], [xyz[i, 1]], [xyz[i, 2]])
        return trail, head

    anim = FuncAnimation(fig, update, frames=len(xyz),
                         interval=1000 // fps, blit=False)
    if path is not None:
        anim.save(path, writer="pillow", fps=fps)
    return anim


def animate_wigner(rhos, path=None, *, fps: int = 10, xrange=(-4, 4),
                   n_grid: int = 61):
    """Animate the Wigner function over a sequence of density matrices
    (e.g. a DensityTrajectory's rhos; reference:
    PiccoloQuantumToolboxExt.jl:236-349 animate_wigner)."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation

    rhos = [np.asarray(r) for r in
            (getattr(rhos, "rhos", rhos))]
    xs = np.linspace(*xrange, n_grid)
    Ws = [_wigner_grid(r, xs) for r in rhos]
    vmax = max(np.abs(W).max() for W in Ws)
    fig, ax = plt.subplots(figsize=(5, 4.4))
    im = ax.pcolormesh(xs, xs, Ws[0], cmap="RdBu_r", vmin=-vmax,
                       vmax=vmax)
    fig.colorbar(im, ax=ax, label="W(x, p)")
    ax.set_xlabel("x")
    ax.set_ylabel("p")

    def update(i):
        im.set_array(Ws[i].ravel())
        ax.set_title(f"frame {i}")
        return (im,)

    anim = FuncAnimation(fig, update, frames=len(Ws),
                         interval=1000 // fps, blit=False)
    if path is not None:
        anim.save(path, writer="pillow", fps=fps)
    return anim


def rydberg_populations(psi, N: int):
    """Per-atom Rydberg (|1>) population of an N-atom chain state
    (reference: visualizations/systems/rydberg_chain.jl:
    rydberg_populations)."""
    psi = np.asarray(psi)
    probs = np.abs(psi) ** 2
    pops = np.zeros(N)
    for idx in range(2 ** N):
        for i in range(N):
            if (idx >> (N - 1 - i)) & 1:
                pops[i] += probs[idx]
    return pops


def plot_rydberg_chain(N: int, distance: float, *,
                       C: float = 862690 * 2 * np.pi,
                       cutoff_order: int = 1, populations=None,
                       ax=None):
    """Draw a 1D chain of N atoms with spacing `distance` (um):
    interaction edges up to `cutoff_order` neighbors with thickness
    proportional to C / r^6, atoms colored by Rydberg population when
    `populations` is given (reference:
    visualizations/systems/rydberg_chain.jl: plot_rydberg_chain)."""
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=(1.2 * N, 2.0))
    else:
        fig = ax.figure
    pos = distance * np.arange(N)
    nn = C / distance ** 6
    for gap in range(1, cutoff_order + 1):
        r = distance * gap
        lw = (C / r ** 6) / nn * 5.0
        for i in range(N - gap):
            ax.plot([pos[i], pos[i + gap]], [0.0, 0.0], color="gray",
                    lw=lw, zorder=1, alpha=0.7)
    if populations is None:
        colors = ["tab:blue"] * N
    else:
        populations = np.clip(np.asarray(populations, float), 0.0, 1.0)
        cmap = plt.get_cmap("coolwarm")
        colors = [cmap(p) for p in populations]
        sm = plt.cm.ScalarMappable(cmap=cmap,
                                   norm=plt.Normalize(0.0, 1.0))
        fig.colorbar(sm, ax=ax, label="Rydberg population",
                     fraction=0.08)
    ax.scatter(pos, np.zeros(N), s=600, c=colors, zorder=2,
               edgecolors="black")
    for i, x in enumerate(pos):
        ax.annotate(str(i + 1), (x, 0.0), ha="center", va="center",
                    zorder=3, fontsize=9)
    ax.set_xlabel("Position (um)")
    ax.set_yticks([])
    ax.set_ylim(-1, 1)
    for side in ("top", "right", "left"):
        ax.spines[side].set_visible(False)
    fig.tight_layout()
    return fig


def animate_rydberg_chain(qtraj_or_psis, N: int, distance: float,
                          path=None, *, fps: int = 10, stride: int = 1,
                          C: float = 862690 * 2 * np.pi,
                          cutoff_order: int = 1):
    """Animate per-atom Rydberg populations along a ket trajectory
    (reference: rydberg_chain.jl: animate_rydberg_chain)."""
    plt = _mpl()
    from matplotlib.animation import FuncAnimation

    psis = np.asarray(getattr(qtraj_or_psis, "psis", qtraj_or_psis))
    pops = [rydberg_populations(psi, N) for psi in psis[::stride]]
    fig, ax = plt.subplots(figsize=(1.2 * N, 2.0))
    cmap = plt.get_cmap("coolwarm")
    plot_rydberg_chain(N, distance, C=C, cutoff_order=cutoff_order,
                       populations=pops[0], ax=ax)
    scat = [c for c in ax.collections if np.asarray(c.get_offsets()).shape[0] == N][0]

    def update(i):
        scat.set_color([cmap(p) for p in np.clip(pops[i], 0, 1)])
        ax.set_title(f"frame {i}")
        return (scat,)

    anim = FuncAnimation(fig, update, frames=len(pops),
                         interval=1000 // fps, blit=False)
    if path is not None:
        anim.save(path, writer="pillow", fps=fps)
    return anim


class LivePulsePlot:
    """Per-iteration live pulse hook for QuantumControlProblem.solve
    (reference: LivePulsePlotCallback, live_callbacks.jl:6-47 +
    PiccoloMakieExt.jl:469-477).

    Usage:
        live = LivePulsePlot(times, snapshot_dir="snaps")   # or dir=None
        prob.solve(callback=live, callback_every=5)
        live.animate("pulses.gif")                          # afterwards
    """

    def __init__(self, times, snapshot_dir=None):
        self.times = np.asarray(times)
        self.snapshot_dir = snapshot_dir
        self.history = []                     # (it, kkt, u [N, d])

    def __call__(self, it, kkt, mu, alpha, u):
        if u is None:
            return
        self.history.append((int(it), float(kkt), np.asarray(u)))
        if self.snapshot_dir is not None:
            import os

            os.makedirs(self.snapshot_dir, exist_ok=True)
            from ..quantum.pulses import ZeroOrderPulse

            fig = plot_pulse(ZeroOrderPulse(u, self.times))
            fig.suptitle(f"it {it}  kkt {kkt:.2e}")
            fig.savefig(os.path.join(self.snapshot_dir,
                                     f"pulse_{it:04d}.png"), dpi=80)
            import matplotlib.pyplot as plt

            plt.close(fig)

    def animate(self, path=None, fps: int = 10):
        from ..quantum.pulses import ZeroOrderPulse

        pulses = [ZeroOrderPulse(u, self.times)
                  for _, _, u in self.history]
        return animate_pulse(pulses, path, fps=fps)
