"""Problem assembly: trajectory + objectives + integrators -> NLP -> solve.

TPU-native counterpart of the reference QuantumControlProblem / DTO stack
(reference: src/control/problems.jl:50-181; call stack SURVEY.md 3.1-3.2).
`QuantumControlProblem.solve()` runs the batched IPM and then syncs the
quantum trajectory: update globals -> extract pulse -> re-rollout
(reference sync_trajectory!: problems.jl:137-151).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..quantum.trajectories import extract_pulse
from ..solver.ipm import IPMOptions, solve_nlp, solve_nlp_traced
from ..solver.nlp import CollocationNLP
from ..trajectory import KnotLayout, Trajectory

__all__ = ["QuantumControlProblem", "build_nlp"]

# Module-level jitted solvers: combined with the per-problem structure
# cache (QuantumControlProblem.build), repeated solves of the same
# problem (warm-started re-solve, MinimumTime chain on an unchanged
# structure) hit the XLA compile cache instead of re-tracing.
_SOLVE = jax.jit(solve_nlp,
                 static_argnames=("options", "callback", "callback_every"))
_SOLVE_TRACED = jax.jit(solve_nlp_traced, static_argnames=("options",))


def _nlp_layout(traj: Trajectory) -> KnotLayout:
    """Layout over the NLP decision components (frozen excluded)."""
    names = [n for n in traj.names if n not in traj.frozen]
    return KnotLayout(names, [traj.dims[n] for n in names],
                      traj.global_names,
                      [traj.global_data[n].shape[0] for n in traj.global_names])


def build_nlp(traj: Trajectory, objectives, integrators, eq_groups=(),
              params=None):
    """Assemble a CollocationNLP from trajectory metadata + terms.

    Returns (nlp, params, Z0, g0, layout).
    """
    N = traj.N
    layout = _nlp_layout(traj)
    dz = layout.z_dim
    dg = layout.g_dim
    params = dict(params or {})
    params["frozen"] = {n: traj.data[n] for n in traj.frozen}

    # Bounds
    lo = np.full((N, dz), -np.inf)
    hi = np.full((N, dz), np.inf)
    for name, sl in layout.slices.items():
        if name in traj.bounds:
            b = np.asarray(traj.bounds[name])
            lo[:, sl] = b[:, 0][None, :]
            hi[:, sl] = b[:, 1][None, :]
    g_lo = np.full(dg, -np.inf)
    g_hi = np.full(dg, np.inf)
    for name, sl in layout.global_slices.items():
        if name in traj.global_bounds:
            b = np.asarray(traj.global_bounds[name])
            g_lo[sl] = b[:, 0]
            g_hi[sl] = b[:, 1]

    # Boundary pins: Ipopt-style fixed-variable treatment
    # (fixed_variable_treatment = make_parameter). Pinned coordinates are
    # REMOVED from the optimization — the IPM forces their step to zero,
    # drops their barrier terms, and injects the pinned values into Z0 —
    # instead of being carried as equality rows on every knot's KKT
    # block. On the SX benchmark this halves the per-knot constraint row
    # count (m = 24 -> 12); block factorization cost scales ~m^2-m^3.
    groups = []
    pin_mask = np.zeros((N, dz))
    pin_val = np.zeros((N, dz))
    for kind, table in (("init", traj.initial), ("fin", traj.final)):
        for name, val in table.items():
            if name in traj.frozen:
                continue
            v = np.asarray(val, dtype=float)
            row = 0 if kind == "init" else N - 1
            fin = np.isfinite(v)
            if not fin.any():
                continue
            # Drop box bounds on pinned entries at the pinned knot (a
            # fixed variable has no barrier).
            sl = layout.slices[name]
            cols = np.arange(sl.start, sl.stop)[fin]
            lo[row, cols] = -np.inf
            hi[row, cols] = np.inf
            pin_mask[row, cols] = 1.0
            pin_val[row, cols] = v[fin]
    params["pin_val"] = jnp.asarray(pin_val)
    for grp in eq_groups:
        groups.append((grp.dim, np.asarray(grp.mask, dtype=float), grp.fn))

    me = sum(d for d, _, _ in groups)
    if me:
        eq_mask = np.concatenate([m for _, m, _ in groups], axis=1)
    else:
        eq_mask = np.zeros((N, 0))

    md = sum(intg.dim for intg in integrators)

    def make_get(k, z, params):
        def get(name):
            if name in layout.slices:
                return z[layout.slices[name]]
            return params["frozen"][name][k]
        return get

    def gview_factory(g):
        def gview(name):
            return g[layout.global_slices[name]]
        return gview

    def stage_cost(k, z, g, params):
        get = make_get(k, z, params)
        total = 0.0
        for obj in objectives:
            total = total + obj.stage_cost(k, get, g, params, N)
        return total

    def dynamics(k, z, zp, g, params):
        get = make_get(k, z, params)
        getp = make_get(k + 1, zp, params)
        outs = [intg.residual(k, get, getp, g, params)
                for intg in integrators]
        return jnp.concatenate(outs) if outs else jnp.zeros(0)

    def stage_eq(k, z, g, params):
        get = make_get(k, z, params)
        gview = gview_factory(g)
        outs = [fn(k, get, gview, g, params) for _, _, fn in groups]
        return jnp.concatenate(outs) if outs else jnp.zeros(0)

    # Split-argument fast-derivative views: the bilinear/variational
    # integrators are LINEAR in the state components of z_k — only the
    # drive, timestep, and accumulated-time columns reach the matrix
    # exponential. Exposing those as a separate autodiff argument lets
    # the IPM's jacfwd/hessian sweeps propagate symbolic-zero tangents
    # through the expm kernel for the state columns (which dominate dz),
    # cutting the derivative cost by the state/control dimension ratio.
    # Exact restructuring — identical values, fewer traced tangent ops.
    nl_names = set()
    for intg in integrators:
        if hasattr(intg, "drive_name"):          # expm-bearing integrators
            nl_names.add(intg.drive_name)
            nl_names.add(intg.time_name)
            if getattr(intg, "time_dependent", False):
                # accumulated-time column name as the integrator spells it
                # (TimeAccumulator's t_name is configurable)
                nl_names.add(getattr(intg, "t_name", "t"))
    nl_order = [n for n in layout.names if n in nl_names]
    lin_order = [n for n in layout.names if n not in nl_names]
    split_ok = md > 0 and nl_order and lin_order

    if split_ok:
        nl_local, lin_local, nl_cols, lin_cols = {}, {}, [], []
        off = 0
        for n in nl_order:
            d = layout.slices[n].stop - layout.slices[n].start
            nl_local[n] = slice(off, off + d)
            nl_cols.extend(range(layout.slices[n].start, layout.slices[n].stop))
            off += d
        off = 0
        for n in lin_order:
            d = layout.slices[n].stop - layout.slices[n].start
            lin_local[n] = slice(off, off + d)
            lin_cols.extend(range(layout.slices[n].start, layout.slices[n].stop))
            off += d

        def make_get_split(k, zn, zl, params):
            def get(name):
                if name in nl_local:
                    return zn[nl_local[name]]
                if name in lin_local:
                    return zl[lin_local[name]]
                return params["frozen"][name][k]
            return get

        def stage_cost_split(k, zn, zl, g, params):
            get = make_get_split(k, zn, zl, params)
            total = 0.0
            for obj in objectives:
                total = total + obj.stage_cost(k, get, g, params, N)
            return total

        def dynamics_split(k, zn, zl, zp, g, params):
            get = make_get_split(k, zn, zl, params)
            getp = make_get(k + 1, zp, params)
            outs = [intg.residual(k, get, getp, g, params)
                    for intg in integrators]
            return jnp.concatenate(outs) if outs else jnp.zeros(0)

        def stage_eq_split(k, zn, zl, g, params):
            get = make_get_split(k, zn, zl, params)
            gview = gview_factory(g)
            outs = [fn(k, get, gview, g, params) for _, _, fn in groups]
            return jnp.concatenate(outs) if outs else jnp.zeros(0)
    else:
        stage_cost_split = dynamics_split = stage_eq_split = None
        nl_cols = lin_cols = None

    nlp = CollocationNLP(
        N=N, dz=dz, dg=dg, md=md, me=me,
        stage_cost=stage_cost,
        dynamics=dynamics if md else None,
        stage_eq=stage_eq if me else None,
        lo=lo, hi=hi, g_lo=g_lo, g_hi=g_hi, eq_mask=eq_mask,
        pin_mask=pin_mask,
        dynamics_split=dynamics_split if split_ok else None,
        stage_cost_split=stage_cost_split if split_ok else None,
        stage_eq_split=(stage_eq_split if (split_ok and me) else None),
        nl_cols=nl_cols, lin_cols=lin_cols)

    Z0 = jnp.concatenate([traj.data[n] for n in layout.names], axis=1)
    g0 = (jnp.concatenate([traj.global_data[n] for n in layout.global_names])
          if dg else jnp.zeros(0))
    return nlp, params, Z0, g0, layout


def _writeback(traj: Trajectory, layout: KnotLayout, Z, g) -> Trajectory:
    data = dict(traj.data)
    for name, sl in layout.slices.items():
        data[name] = Z[:, sl]
    out = traj.replace(data=data)
    if layout.g_dim:
        gd = dict(traj.global_data)
        for name, sl in layout.global_slices.items():
            gd[name] = g[sl]
        out = out.replace(global_data=gd)
    return out


class QuantumControlProblem:
    """A quantum trajectory + assembled NLP, with solve/sync semantics.

    reference: src/control/problems.jl:50 (QuantumControlProblem),
    :167-178 (solve!), :137-151 (sync_trajectory!).
    """

    def __init__(self, qtraj, traj: Trajectory, objectives, integrators,
                 constraints=(), params=None):
        self.qtraj = qtraj
        self.objectives = list(objectives)
        self.integrators = list(integrators)
        self.constraints = list(constraints)
        for con in self.constraints:
            traj = con.setup(traj)
        self.traj = traj
        eq_groups = []
        for con in self.constraints:
            eq_groups.extend(con.eq_rows(traj.N))
        self.eq_groups = eq_groups
        self.extra_params = dict(params or {})
        self.result = None
        self.history = None
        self._built = None
        self._built_fp = None
        self._cb_cache = None

    # -- assembly ------------------------------------------------------------

    def _fingerprint(self):
        """Hash of everything `_build_structure` bakes into the cached NLP
        (bounds, pins, frozen data, extra params). A changed fingerprint
        invalidates the cache so post-construction mutation of the problem
        is picked up by the next solve()."""
        import hashlib
        h = hashlib.sha1()

        def upd(v):
            leaves, treedef = jax.tree_util.tree_flatten(v)
            h.update(repr(treedef).encode())
            for leaf in leaves:
                if hasattr(leaf, "dtype") or isinstance(
                        leaf, (int, float, bool, complex)):
                    h.update(np.asarray(leaf).tobytes())
                else:
                    h.update(repr(leaf).encode())

        t = self.traj
        h.update(str(t.N).encode())
        h.update(repr(t.frozen).encode())
        for name in t.frozen:
            upd(t.data[name])
        for table in (t.bounds, t.global_bounds, t.initial, t.final,
                      t.goal or {}):
            h.update(b"|")
            for name in sorted(table):
                h.update(name.encode())
                upd(table[name])
        h.update(b"|params")
        for k in sorted(self.extra_params):
            h.update(k.encode())
            upd(self.extra_params[k])
        return h.hexdigest()

    def invalidate(self):
        """Drop the cached NLP structure (forces a rebuild + re-trace on
        the next solve). Called automatically when the fingerprinted
        inputs change; call manually after mutating objectives,
        integrators, or constraints in place."""
        self._built = None
        self._built_fp = None
        return self

    def build(self):
        """Assemble (nlp, params, Z0, g0, layout).

        The NLP structure (closures, bounds, params) is built ONCE per
        problem and cached: `solve_nlp` is jitted on the nlp pytree whose
        treedef includes those closure objects, so rebuilding them on
        every solve() would force a full re-trace + recompile each call
        (minutes on TPU). Only Z0/g0 — the warm start, which changes
        after each solve — are recomputed from the current trajectory.
        The cache is keyed by a fingerprint of the baked inputs (bounds,
        pins, frozen data, extra params) so mutating the problem between
        solves is safe; see `invalidate` for in-place term mutation.
        """
        fp = self._fingerprint()
        if self._built is None or self._built_fp != fp:
            self._built = self._build_structure()
            self._built_fp = fp
        nlp, params, layout = self._built
        Z0 = jnp.concatenate(
            [self.traj.data[n] for n in layout.names], axis=1)
        g0 = (jnp.concatenate([self.traj.global_data[n]
                               for n in layout.global_names])
              if layout.g_dim else jnp.zeros(0))
        return nlp, params, Z0, g0, layout

    def _build_structure(self):
        params = dict(self.extra_params)
        params.setdefault("system", self.qtraj.system)
        if "goal" not in params:
            params["goal"] = self._default_goals()
        # Solver views (host-built): the jitted NLP must trace no complex
        # ops — TPU's f64 x64 rewriter has no f64<->c128 conversions, and
        # real f64 matmuls are half the cost of emulated-c128 ones.
        # Systems become real-generator views; goals become iso vectors.
        from ..quantum.systems import RealGeneratorSystem
        if not isinstance(params["system"], RealGeneratorSystem):
            params["system"] = params["system"].solver_view()
        if "systems" in params:
            params["systems"] = tuple(
                s if isinstance(s, RealGeneratorSystem) else s.solver_view()
                for s in params["systems"])
        params["goal"] = {nm: self._goal_iso(v)
                          for nm, v in params["goal"].items()}
        nlp, params, _Z0, _g0, layout = build_nlp(
            self.traj, self.objectives, self.integrators,
            self.eq_groups, params)
        return nlp, params, layout

    def _goal_iso(self, goal):
        """Host-side goal -> real iso vector matching the state encoding."""
        from ..quantum import isomorphisms as iso
        from ..quantum.trajectories import (DensityTrajectory,
                                            MultiDensityTrajectory,
                                            SamplingTrajectory)
        if goal is None:
            return None
        arr = jnp.asarray(np.asarray(goal))
        if arr.ndim >= 1 and not jnp.iscomplexobj(arr):
            arr = arr.astype(jnp.complex128)
        qt = self.qtraj
        if isinstance(qt, SamplingTrajectory):
            qt = qt.base
        if isinstance(qt, (DensityTrajectory, MultiDensityTrajectory)):
            return iso.density_to_compact_iso(arr)
        if arr.ndim == 1:
            return iso.ket_to_iso(arr)
        return iso.operator_to_iso_vec(arr)

    def _default_goals(self):
        qt = self.qtraj
        from ..quantum.trajectories import (MultiDensityTrajectory,
                                            MultiKetTrajectory,
                                            SamplingTrajectory)
        if isinstance(qt, SamplingTrajectory):
            base_goal = qt.base.goal
            return {f"{qt.base.state_name}{i + 1}": base_goal
                    for i in range(qt.n_systems)}
        if isinstance(qt, (MultiKetTrajectory, MultiDensityTrajectory)):
            return {nm: qt.goals[i] for i, nm in enumerate(qt.state_names())}
        return {qt.state_name: qt.goal}

    # -- solve ---------------------------------------------------------------

    def solve(self, max_iter: int = 150, tol: float = 1e-7, sync: bool = True,
              verbose=True, options: IPMOptions | None = None,
              callback=None, callback_every: int = 1):
        """Solve the NLP, write the solution back into the trajectory, and
        re-sync the quantum trajectory (globals -> pulse -> rollout).

        verbose: False (silent), True (one summary line), or "detailed"
        (per-iteration table — the Ipopt iteration-log analogue; runs the
        traced solver and stores the history in `self.history`).
        callback: optional host function called per accepted iterate with
        (it, kkt_err, mu, alpha, u [N, n_drives]) — the LivePulsePlot
        hook (reference: src/visualizations/live_callbacks.jl:6-47).
        """
        opts = options or IPMOptions(max_iter=max_iter, tol=tol,
                                     constr_viol_tol=tol)
        nlp, params, Z0, g0, layout = self.build()
        cb = None
        if callback is not None:
            # Memoized per (user callback, u slice): _SOLVE declares
            # `callback` static, so a fresh closure per solve() would be
            # a jit-cache miss (full re-trace) every call.
            u_sl = layout.slices.get("u")
            key = (callback, u_sl)
            if self._cb_cache is None or self._cb_cache[0] != key:
                def cb(it, kkt, mu, alpha, Z):  # noqa: ANN001 — host side
                    callback(int(it), float(kkt), float(mu), float(alpha),
                             np.asarray(Z[:, u_sl]) if u_sl else None)

                self._cb_cache = (key, cb)
            cb = self._cb_cache[1]

        detailed = verbose == "detailed"
        if detailed and cb is not None:
            import warnings
            warnings.warn(
                "verbose='detailed' runs the traced solver, which does not "
                "support per-iteration callbacks; the callback is ignored. "
                "Use verbose=True with callback= for live hooks.",
                stacklevel=2)
            cb = None
        t0 = time.time()
        if detailed:
            state, hist = _SOLVE_TRACED(nlp, params, Z0, g0, options=opts)
            state = jax.block_until_ready(state)
            self.history = {k: np.asarray(v) for k, v in hist.items()}
        else:
            state = _SOLVE(nlp, params, Z0, g0, options=opts,
                           callback=cb, callback_every=callback_every)
            state = jax.block_until_ready(state)
        t1 = time.time()
        self.result = state
        self.traj = _writeback(self.traj, layout, state.Z, state.g)
        if sync:
            self.sync_trajectory()
        if detailed:
            n_it = int(state.it)
            print(f"[piccolax] {'it':>4} {'objective':>12} {'kkt':>10} "
                  f"{'mu':>9} {'alpha':>9}")
            h = self.history
            for i in range(n_it):
                print(f"[piccolax] {i:4d} {float(h['f'][i]):12.6e} "
                      f"{float(h['kkt'][i]):10.3e} {float(h['mu'][i]):9.2e} "
                      f"{float(h['alpha'][i]):9.2e}")
        if verbose:
            status = "stalled-at-floor" if bool(state.stalled) \
                else f"converged={bool(state.converged)}"
            print(f"[piccolax] IPM: {int(state.it)} iters, "
                  f"kkt={float(state.kkt_err):.2e}, {status}, "
                  f"wall={t1 - t0:.2f}s")
        return self

    def sync_trajectory(self):
        """Update globals, extract the optimized pulse, re-rollout.

        The re-rollout honors PiccoloOptions.rollout_integrator /
        rollout_n_substeps when the problem was built from a template
        with an options record (reference: options.jl:69)."""
        gp = {n: self.traj.global_data[n]
              for n in self.qtraj.system.global_params}
        if gp:
            new_system = self.qtraj.system.with_global_params(gp)
            self.qtraj = self.qtraj.replace(system=new_system)
        pulse = extract_pulse(self.qtraj, self.traj)
        kw = {}
        meth = getattr(self, "_rollout_method", None)
        if meth is not None:
            kw["method"] = meth
        ns = getattr(self, "_rollout_substeps", None)
        if ns is not None:
            kw["n_substeps"] = ns
        try:
            self.qtraj = self.qtraj.rollout(pulse, **kw)
        except TypeError:
            # density rollouts have no method switch
            kw.pop("method", None)
            self.qtraj = self.qtraj.rollout(pulse, **kw)
        return self

    # -- accessors -----------------------------------------------------------

    @property
    def pulse(self):
        return self.qtraj.pulse

    def fidelity(self, **kw):
        """Rollout fidelity; free-phase problems automatically evaluate at
        the optimized phase globals (reference: free-phase fidelity,
        rollouts_extensions.jl:892-931)."""
        pg = getattr(self, "_phase_global", None)
        if pg is not None and "phases" not in kw:
            name, spec = pg
            kw["phases"] = np.asarray(self.traj.global_data[name])
            from ..quantum.trajectories import KetTrajectory, UnitaryTrajectory
            if isinstance(self.qtraj, UnitaryTrajectory):
                kw.setdefault("n_qubits", spec)
            elif isinstance(self.qtraj, KetTrajectory) \
                    and isinstance(spec, tuple):
                kw.setdefault("subsystem_levels", spec)
        return self.qtraj.fidelity(**kw)

    @property
    def converged(self) -> bool:
        """True only if the KKT tolerance (or acceptable) test passed —
        a numerical-floor stall reports False here and True in
        `stalled` (honest f32 termination semantics)."""
        return bool(self.result.converged) if self.result is not None else False

    @property
    def stalled(self) -> bool:
        """True if the solve stopped at the dtype's accuracy floor (KKT
        progress below the stall threshold) without meeting the KKT
        tolerance. The iterate is still primal-feasible; validate
        solution quality with `fidelity()` / `rollout_fidelity`."""
        return bool(self.result.stalled) if self.result is not None else False
