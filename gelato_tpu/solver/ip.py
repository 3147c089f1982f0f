"""Primal-dual interior-point NLP solver, pure JAX, designed for TPU.

Replaces the external pyoptsparse→IPOPT loop of the reference
(/root/reference/Trajectory_Optimization.py:419-462) with an on-device
solver so the entire optimize loop stays on the accelerator:

  minimize f(z)   s.t.  cE(z) = 0,  cI(z) ≥ 0,  l ≤ z ≤ u

Algorithm (Wächter-Biegler, the method IPOPT implements, re-derived for a
condensed dense KKT system):

* slack variables s > 0 for the inequalities, log-barrier on s and on both
  box-bound gaps, monotone Fiacco-McCormick barrier reduction;
* exact Hessian of the Lagrangian via forward-over-reverse AD — the
  reference's hand-written sparse COO Jacobians and FD blocks
  (lib/jac_fd.py, lib/con_dynamics.py:292-496) become one jacfwd;
* gradient-based constraint/objective scaling, least-squares multiplier
  initialization, slack reset for lagging inequalities;
* the inequality block is condensed into the Hessian (mI is small), leaving
  a symmetric (n + mE) KKT system factored once per iteration by dense LU —
  the factors are reused for second-order corrections;
* fraction-to-boundary rule, filter line search **with memory**, second-order
  correction, inertia correction by adaptive primal regularization with
  μ-scaled dual regularization in recovery mode.

The solver is compiled as several independently jitted pieces (residuals +
Jacobians, Hessian, KKT factor + direction, trial evaluation, update)
orchestrated by a small host loop: one fully fused step sends XLA compile
time superlinear on this toolchain, while the pieces compile in ~2 minutes
total and keep all heavy math on-device.  A fully fused, vmappable step
(without filter memory) is provided for batched dispersion solves.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import linalg


class IPOptions(NamedTuple):
    tol: float = 1.0e-6
    mu_init: float = 1.0e-1
    mu_min: float = 1.0e-9
    kappa_mu: float = 0.2  # linear barrier reduction factor
    theta_mu: float = 1.5  # superlinear barrier reduction exponent
    kappa_eps: float = 10.0  # barrier subproblem tolerance factor
    # Barrier schedule.  "monotone" is IPOPT's default Fiacco-McCormick
    # ladder: mu drops one rung (kappa_mu*mu, mu^theta_mu) only when the
    # subproblem is solved to kappa_eps*mu.  "adaptive" keeps the same
    # trigger but, when it fires, jumps straight to the LOQO-style
    # centrality target
    #     sigma * avg(compl),  sigma = 0.1*min(0.05*(1-xi)/xi, 2)^3,
    #     xi = min(compl)/avg(compl)
    # (capped by the classical rung, floored at mu_min): a well-centered
    # iterate skips the remaining ladder rungs instead of grinding each
    # subproblem in turn.  Strictly monotone-decreasing, so the filter
    # machinery stays valid; with hessian="hybrid" the exact-Newton endgame
    # then closes the final subproblem in a few iterations.
    mu_strategy: str = "monotone"
    # Stall watchdog (host loop; 0 = off).  The L-BFGS path can grind
    # hundreds of iterations at one barrier rung because the subproblem
    # trigger err_mu <= kappa_eps*mu is hard to hit with a quasi-Newton
    # direction at small mu (measured: ~400 iterations at mu=1.8e-7 on the
    # example, PERF.md "fragility notes").  When mu hasn't moved for this
    # many iterations AND the iterate is already primal-feasible to the
    # overall tolerance (theta <= tol) AND the scaled KKT error is
    # O(1)-small (err0 <= 1 — grinding complementarity, not diverging),
    # force one rung drop anyway.  Monotone-decreasing, so the filter
    # logic stays valid.  solve_device applies the same watchdog at chunk
    # boundaries (err0 gate only) without touching the compiled step.
    mu_force_after: int = 0
    # Wedge recovery (host loop + solve_device chunk boundaries; 0 = off).
    # A too-ambitious barrier schedule (e.g. aggressive mu_force_after on a
    # hard mission) can leave the iterate so far off the central path that
    # the filter rejects every trial step: alpha stays 0 and the loop spins
    # to max_iter with no progress (observed: demo mission at mu=1e-9,
    # err0 3.4e6, 1400+ dead iterations).  When no step has been accepted
    # for this many consecutive iterations — or the KKT error explodes to
    # 1e4x the best seen — restore the best iterate recorded so far, raise
    # its barrier two rungs (mu*100, capped at mu_init), and reset the
    # filter + L-BFGS memory: the analogue of batch.reset_diverged for a
    # single solve, and of IPOPT falling back to restoration.  Bounded by
    # wedge_max_recoveries, after which the best iterate is returned.
    wedge_recover_after: int = 15
    wedge_max_recoveries: int = 3
    tau_min: float = 0.99  # fraction-to-boundary floor
    s_max: float = 100.0  # scaling threshold for the optimality error
    eta: float = 1.0e-8  # Armijo constant (IPOPT eta_phi)
    max_ls: int = 20  # backtracking steps
    max_soc: int = 3  # second-order correction attempts
    kappa_soc: float = 0.99  # SOC progress requirement
    gamma_theta: float = 1.0e-5  # filter margins
    gamma_phi: float = 1.0e-5
    # absolute infeasibility cap as a multiple of theta(x0).  IPOPT defaults
    # to 1e4; near-feasible warm starts do much better with a tight cap that
    # rejects feasibility-destroying excursions early.
    theta_max_factor: float = 1.0e4
    s_phi: float = 2.3  # switching condition exponents (IPOPT)
    s_theta: float = 1.1
    delta_sw: float = 1.0
    delta_w_init: float = 1.0e-8
    delta_w_max: float = 1.0e12
    # fused-step within-iteration inertia/globalization retries: number of
    # growing δ_w levels tried per iteration, reusing the evaluated point
    # (the host loop's 15-level loop, bounded for device control flow)
    max_inertia_retries: int = 3
    # persistent Hessian regularization floor: damps zero-curvature control
    # subspaces (e.g. body rates entering only bilinear defect rows)
    delta_w_floor: float = 0.0
    # Equality-row regularization is 0 by default: a nonzero delta_c leaks
    # delta_c*dyE into the linearized constraint.  In recovery mode it becomes
    # IPOPT's mu-scaled value, bounding multipliers of dependent rows.
    delta_c: float = 0.0
    delta_c_bar: float = 1.0e-8
    kappa_c: float = 0.25
    bound_relax: float = 1.0e-8
    bound_push: float = 1.0e-2
    slack_min: float = 1.0e-8
    kappa_sigma: float = 1.0e10  # dual safeguard box
    max_iter: int = 300
    # KKT factorization: "chol" = condensed normal-equations fp64 Cholesky
    # (TPU-native, and the inertia oracle: chol of a non-PD H yields NaNs
    # which trigger the delta_w retry); "lu" = dense fp64 LU of the full
    # system (CPU debugging).  See solver/linalg.py.
    kkt_method: str = "chol"
    kkt_refine: int = 1
    # acceptance gate on the structured solve's measured relative KKT
    # residual (the struct path's stand-in for the chol-NaN inertia oracle;
    # see direction_struct)
    struct_rtol: float = 1.0e-4
    # How the struct path factors the Schur matrix T̂ = Ĵ D⁻¹ Ĵᵀ + Ĝ:
    # "scan" = bordered block-tridiagonal lax.scan sweep (low memory,
    # right for single huge meshes); "dense" = one batched dense Cholesky
    # on the MXU — the batch/dispersion configuration (the scan sweep is
    # latency-bound under vmap: measured 2.5 s of the ~2.6 s batched step
    # at B=8, PERF.md round-4 probe, vs ~0.1 s dense).
    struct_sweep: str = "scan"
    # Mixed-precision KKT (SURVEY §7 hard-part #3): factor T̂ in fp32 and
    # refine in fp64 ("float32"; dense sweep only).  Pair with
    # kkt_refine >= 2; the struct_rtol residual gate stays the accuracy
    # oracle, so a factor too coarse for the current conditioning routes
    # into the δ_w retry instead of silently degrading the step.
    struct_factor_dtype: str = "float64"
    scale: bool = True  # gradient-based constraint/objective scaling
    scale_max: float = 100.0
    # Lagrangian Hessian mode.  "lbfgs" (damped limited-memory BFGS) is the
    # default and what the reference effectively ran: pyoptsparse passes only
    # first derivatives, so IPOPT used hessian_approximation=limited-memory.
    # Its positive-definite updates are immune to the near-singular exact
    # Hessian of singular-arc attitude sections (body rates enter only
    # bilinear defect rows).  "exact" uses forward-over-reverse AD
    # throughout; "hybrid" runs an exact-Newton endgame once mu and the KKT
    # error are small — with the chol-NaN inertia oracle retrying non-PD
    # Hessians in-iteration it converges the example in ~2.4x fewer
    # iterations than pure L-BFGS (284 vs 680+) at ~1e-13 feasibility.
    hessian: str = "lbfgs"
    lbfgs_memory: int = 20
    hybrid_mu_switch: float = 1.0e-6
    hybrid_err_switch: float = 1.0e-3
    # IPOPT-style acceptable termination: stop once the error has stayed
    # under acceptable_tol for acceptable_iter consecutive iterations
    # (the reference example itself runs IPOPT with acceptable_tol=1e-4,
    # example-settings.json:94)
    acceptable_tol: float = 1.0e-4
    acceptable_iter: int = 15
    # ∞-norm cap on the primal step (variables are O(1) after
    # nondimensionalization).  Protects a near-feasible start from being
    # destroyed while the multipliers of the ill-conditioned continuity
    # chain equilibrate; inactive once ‖dz‖ is moderate.
    max_step_norm: float = 1.0
    # Batch-safe device control flow for the fused step (OFF by default so
    # the single-case HLO — and its warm compile-cache entry — is untouched).
    # Every vmapped ``lax.scan(vmap(step))`` program faults the TPU worker
    # at its first dispatch while all of the step's *pieces* run fine
    # vmapped in isolation (PERF.md round-4 bisect): the remaining
    # structural difference is the step's ``lax.while_loop``s and
    # ``lax.cond``s, which lower to batched-predicate whiles /
    # select-both-branches under vmap.  With this flag the step is pure
    # scan+dataflow: the backtracking while_loop becomes a fixed-trip scan
    # (masked, same semantics), the inertia-retry while_loop is statically
    # unrolled to ``max_inertia_retries`` trips (batch callers should set it
    # to 1 — a failed iteration escalates δ_w across scan iterations via the
    # existing failure bookkeeping instead of retrying in-place), and the
    # SOC lax.cond is skipped when ``max_soc == 0`` (set it to 0 for
    # batches) or computed unconditionally + selected otherwise.
    batch_safe_loops: bool = False


class IPState(NamedTuple):
    z: jnp.ndarray
    s: jnp.ndarray
    yE: jnp.ndarray
    lam: jnp.ndarray
    zL: jnp.ndarray
    zU: jnp.ndarray
    mu: jnp.ndarray
    delta_w: jnp.ndarray
    nu: jnp.ndarray  # kept for warm-start compat (unused by the filter LS)
    err0: jnp.ndarray
    alpha: jnp.ndarray
    it: jnp.ndarray
    converged: jnp.ndarray


class Filter:
    """Wächter-Biegler (θ, φ) filter with margins (IPOPT eq. 22-23)."""

    def __init__(self, theta0, gamma_theta=1e-5, gamma_phi=1e-5,
                 theta_max_factor=1e4):
        self.gt = gamma_theta
        self.gp = gamma_phi
        self.theta_max = theta_max_factor * max(1.0, theta0)
        self.theta_min = 1.0e-4 * max(1.0, theta0)
        self.entries = []  # list of (theta_bound, phi_bound)

    def acceptable(self, theta, phi):
        if not (np.isfinite(theta) and np.isfinite(phi)):
            return False
        if theta > self.theta_max:
            return False
        for tj, pj in self.entries:
            if theta >= tj and phi >= pj:
                return False
        return True

    def add(self, theta, phi):
        tb = (1.0 - self.gt) * theta
        pb = phi - self.gp * theta
        self.entries = [(tj, pj) for tj, pj in self.entries
                        if tj < tb or pj < pb]
        self.entries.append((tb, pb))

    def reset(self):
        self.entries = []


def _push_inside(z, lb, ub, kappa):
    """IPOPT-style initial-point push strictly inside the bounds."""
    width = ub - lb
    pl = jnp.minimum(kappa * jnp.maximum(1.0, jnp.abs(lb)), 0.5 * width)
    pu = jnp.minimum(kappa * jnp.maximum(1.0, jnp.abs(ub)), 0.5 * width)
    return jnp.clip(z, lb + pl, ub - pu)


def relaxed_bounds(lb, ub, opts: IPOptions):
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    return (lb - opts.bound_relax * jnp.maximum(1.0, jnp.abs(lb)),
            ub + opts.bound_relax * jnp.maximum(1.0, jnp.abs(ub)))


def normalize_funcs(funcs):
    """Canonicalize problem functions to the two-argument ``f(z, aux)`` form.

    ``aux`` is an arbitrary pytree of per-case problem *data* (wind tables,
    dispersed masses, ...) threaded through every function evaluation — the
    mechanism that lets ``vmap`` vary physics across dispersion-batch lanes,
    not just initial guesses (reference analogue: each run_batch.sh case is
    a whole separate settings file).  Single-case callers keep passing
    one-argument functions and ``aux=()``.
    """
    if funcs.get("_aux"):
        return funcs
    out = {k: (lambda f: (lambda z, aux: f(z)))(f)
           for k, f in funcs.items() if callable(f)}
    out["_aux"] = True
    return out


def init_state(funcs, z0, lb, ub, opts: IPOptions, aux=()):
    """Initial primal-dual state from a primal guess (bounds pre-relaxed).

    Slacks are floored at O(mu) so near-active inequalities do not spawn
    huge initial multipliers, and the equality multipliers start from the
    least-squares estimate  min ||JE^T y + (∇f - zL + zU)||  capped at
    IPOPT's constr_mult_init_max.

    Jitted as a whole: the embedded jacfwd would otherwise run op-by-op,
    which on a remote accelerator costs minutes of per-primitive dispatch
    (the jit is per-call, but init runs once per solve and the compiled
    artifact lands in the persistent cache).
    """
    funcs = normalize_funcs(funcs)

    @jax.jit
    def _impl(z0, lb, ub, aux):
        return _init_state_impl(funcs, z0, lb, ub, opts, aux)

    return _impl(jnp.asarray(z0), jnp.asarray(lb), jnp.asarray(ub), aux)


def _init_state_impl(funcs, z0, lb, ub, opts, aux):
    z = _push_inside(jnp.asarray(z0, jnp.float64), lb, ub, opts.bound_push)
    cI = funcs["ineq"](z, aux)
    mu = jnp.asarray(opts.mu_init, jnp.float64)
    # slacks floored like bound gaps (IPOPT pushes slack "bounds" by
    # bound_push relative to magnitude): active rows start with s ≈ 1e-2 and
    # moderate multipliers instead of lambda = mu/slack_min blow-ups
    s = jnp.maximum(cI, opts.bound_push * jnp.maximum(1.0, jnp.abs(cI)))
    lam = mu / s
    zL = mu / (z - lb)
    zU = mu / (ub - z)

    if "obj" in funcs:
        g = jax.grad(funcs["obj"])(z, aux)
        JE = jax.jacfwd(funcs["eq"])(z, aux)
        JI = jax.jacfwd(funcs["ineq"])(z, aux)
        rhs_ls = -(g - JI.T @ lam - zL + zU)
        mE = JE.shape[0]
        gram = JE @ JE.T + 1.0e-8 * jnp.eye(mE)
        yE = linalg.spd_solve(gram, JE @ rhs_ls)
        yE = jnp.where(jnp.max(jnp.abs(yE), initial=0.0) > 1.0e3,
                       jnp.zeros_like(yE), yE)
        yE = jnp.where(jnp.all(jnp.isfinite(yE)), yE, jnp.zeros_like(yE))
    else:
        yE = jnp.zeros(funcs["eq"](z, aux).shape[0])

    # strong-typed scalars: weak-typed state fields would retrace (and on a
    # remote TPU, recompile for ~20 minutes) on the second call once the
    # step's outputs come back strongly typed
    f64 = jnp.float64
    return IPState(
        z=z, s=s, yE=yE, lam=lam, zL=zL, zU=zU,
        mu=jnp.asarray(mu, f64),
        delta_w=jnp.asarray(0.0, f64), nu=jnp.asarray(1.0, f64),
        err0=jnp.asarray(jnp.inf, f64), alpha=jnp.asarray(0.0, f64),
        it=jnp.asarray(0, jnp.int64), converged=jnp.asarray(False),
    )


def _kkt_errors(g, JE, JI, cE, rI, st, lb, ub, mu, opts):
    """Scaled optimality errors (E_mu, E_0) — IPOPT eq. (5)."""
    dual_inf = g + JE.T @ st.yE - JI.T @ st.lam - st.zL + st.zU
    n = st.z.shape[0]
    y_sum = (jnp.sum(jnp.abs(st.yE)) + jnp.sum(jnp.abs(st.lam))
             + jnp.sum(jnp.abs(st.zL)) + jnp.sum(jnp.abs(st.zU)))
    m_all = st.yE.shape[0] + st.lam.shape[0] + 2 * n
    sd = jnp.maximum(opts.s_max, y_sum / m_all) / opts.s_max
    z_sum = (jnp.sum(jnp.abs(st.zL)) + jnp.sum(jnp.abs(st.zU))
             + jnp.sum(jnp.abs(st.lam)))
    sc = jnp.maximum(opts.s_max, z_sum / (2 * n + st.lam.shape[0])) / opts.s_max
    comp0 = jnp.concatenate([
        st.s * st.lam, (st.z - lb) * st.zL, (ub - st.z) * st.zU])
    feas = jnp.maximum(jnp.max(jnp.abs(cE), initial=0.0),
                       jnp.max(jnp.abs(rI), initial=0.0))
    stat = jnp.max(jnp.abs(dual_inf), initial=0.0) / sd

    def err(mu_val):
        comp = jnp.max(jnp.abs(comp0 - mu_val), initial=0.0) / sc
        return jnp.maximum(stat, jnp.maximum(feas, comp))

    return err(mu), err(0.0)


def _max_alpha(v, dv, tau):
    """Largest α ∈ (0,1] with v + α·dv ≥ (1-τ)·v (fraction to boundary)."""
    ratio = jnp.where(dv < 0.0, -tau * v / jnp.where(dv < 0.0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio, initial=jnp.inf))


def scale_funcs(funcs, z0, scale_max=100.0, aux=()):
    """IPOPT-style gradient-based scaling.

    Each constraint row and the objective are scaled so the largest gradient
    entry at the starting point is at most ``scale_max``
    (nlp_scaling_method=gradient-based).  Returns scaled funcs plus the scale
    vectors (needed to unscale multipliers for reporting).  Scales are
    computed once at ``(z0, aux)`` and shared by every batch lane, like the
    shared ``z0_scale_ref``.
    """
    funcs = normalize_funcs(funcs)
    z0 = jnp.asarray(z0)

    @jax.jit
    def _probe(z0, aux):
        return (jax.grad(funcs["obj"])(z0, aux),
                jax.jacfwd(funcs["eq"])(z0, aux),
                jax.jacfwd(funcs["ineq"])(z0, aux))

    g0, JE0, JI0 = _probe(z0, aux)

    def row_scale(J):
        m = jnp.max(jnp.abs(J), axis=1) if J.size else jnp.zeros(J.shape[0])
        return jnp.minimum(1.0, scale_max / jnp.maximum(m, 1e-30))

    dE = np.asarray(row_scale(JE0))
    dI = np.asarray(row_scale(JI0))
    df = float(min(1.0, scale_max / max(float(jnp.max(jnp.abs(g0))), 1e-30)))
    dE_j = jnp.asarray(dE)
    dI_j = jnp.asarray(dI)

    obj, eq, ineq = funcs["obj"], funcs["eq"], funcs["ineq"]
    scaled = {
        "obj": lambda z, a: df * obj(z, a),
        "eq": lambda z, a: dE_j * eq(z, a),
        "ineq": lambda z, a: dI_j * ineq(z, a),
        "_aux": True,
    }
    # compressed Jacobians scale by the same row factors
    if funcs.get("jac_eq") is not None:
        jac_eq = funcs["jac_eq"]
        scaled["jac_eq"] = lambda z, a: dE_j[:, None] * jac_eq(z, a)
    if funcs.get("jac_ineq") is not None:
        jac_ineq = funcs["jac_ineq"]
        scaled["jac_ineq"] = lambda z, a: dI_j[:, None] * jac_ineq(z, a)
    return scaled, dict(obj=df, eq=dE, ineq=dI)


class LBFGSHessian:
    """Damped limited-memory BFGS approximation of the Lagrangian Hessian.

    Standard Powell-damped BFGS recursion materialized as a dense n×n matrix
    (n ≈ 1e3 here, so the 2m rank-one updates cost ~m·n² ≈ 1e7 flops —
    negligible next to the KKT factorization).  Matches the method the
    reference effectively used through IPOPT's limited-memory mode.
    """

    def __init__(self, n, memory=6):
        self.n = n
        self.memory = memory
        self.pairs = []  # list of (s, y) numpy arrays

    def update(self, s, y):
        s = np.asarray(s)
        y = np.asarray(y)
        sy = float(s @ y)
        ss = float(s @ s)
        if ss <= 0.0 or not np.isfinite(sy):
            return
        # skip almost-parallel/degenerate pairs
        if abs(sy) < 1e-12 * ss:
            return
        self.pairs.append((s, y))
        if len(self.pairs) > self.memory:
            self.pairs.pop(0)

    def materialize(self):
        n = self.n
        if not self.pairs:
            return jnp.eye(n)
        s_last, y_last = self.pairs[-1]
        sy = float(s_last @ y_last)
        yy = float(y_last @ y_last)
        sigma = yy / sy if sy > 1e-12 * np.sqrt(yy) * np.linalg.norm(s_last) else 1.0
        sigma = min(max(sigma, 1e-4), 1e6)
        B = sigma * np.eye(n)
        for s, y in self.pairs:
            Bs = B @ s
            sBs = float(s @ Bs)
            sy = float(s @ y)
            # Powell damping keeps B positive definite
            if sy < 0.2 * sBs:
                theta = 0.8 * sBs / (sBs - sy)
                y = theta * y + (1.0 - theta) * Bs
                sy = float(s @ y)
            if sBs > 1e-16 and sy > 1e-16:
                B = B - np.outer(Bs, Bs) / sBs + np.outer(y, y) / sy
        return jnp.asarray(B)

    def reset(self):
        self.pairs = []


def make_pieces(funcs, lb, ub, opts: IPOptions, struct_meta=None):
    """Build the jitted compute pieces over *relaxed* bounds.

    Every function-evaluating piece takes a trailing ``aux`` pytree (per-case
    problem data; ``()`` for single-case solves — see :func:`normalize_funcs`).

    ``struct_meta`` (solver/structured.StructMeta) enables the structured
    condensed-KKT direction for the L-BFGS path
    (``opts.kkt_method == "struct"``); the dense pieces then fall back to
    the condensed Cholesky for exact-Hessian iterations.
    """
    # the dense direction's factorization; "struct" applies only to the
    # low-rank (L-BFGS) path, so dense work falls back to "chol"
    kkt_method = "chol" if opts.kkt_method == "struct" else opts.kkt_method
    funcs = normalize_funcs(funcs)
    obj, eq, ineq = funcs["obj"], funcs["eq"], funcs["ineq"]
    grad_f = jax.grad(obj)
    # compressed (colored) Jacobians when the problem supplies them
    # (solver/coloring.py); dense jacfwd otherwise
    jac_eq = funcs.get("jac_eq") or jax.jacfwd(eq)
    jac_ineq = funcs.get("jac_ineq") or jax.jacfwd(ineq)

    def lagrangian(z, yE, lam, aux):
        return obj(z, aux) + eq(z, aux) @ yE - ineq(z, aux) @ lam

    def eval_point(z, aux):
        return (obj(z, aux), grad_f(z, aux), eq(z, aux), ineq(z, aux),
                jac_eq(z, aux), jac_ineq(z, aux))

    eval_hess = jax.jacfwd(jax.grad(lagrangian))
    grad_lag = jax.grad(lagrangian)

    def _finish(st, cI, JI, g, mu, dz, dyE):
        """Dependent directions + step limits + descent info for a primal dz."""
        z, s = st.z, st.s
        rI = cI - s
        dl = z - lb
        du = ub - z
        sigma_s = st.lam / s
        ds = JI @ dz + rI
        dlam = (mu / s - st.lam) - sigma_s * ds
        dzL = mu / dl - st.zL - (st.zL / dl) * dz
        dzU = mu / du - st.zU + (st.zU / du) * dz
        tau = jnp.maximum(opts.tau_min, 1.0 - mu)
        alpha_cap = jnp.minimum(
            1.0, opts.max_step_norm / jnp.maximum(
                jnp.max(jnp.abs(dz), initial=0.0), 1e-30))
        alpha_max = jnp.minimum(alpha_cap, jnp.minimum(
            _max_alpha(s, ds, tau),
            jnp.minimum(_max_alpha(dl, dz, tau), _max_alpha(du, -dz, tau))))
        alpha_dual = jnp.minimum(
            _max_alpha(st.lam, dlam, tau),
            jnp.minimum(_max_alpha(st.zL, dzL, tau),
                        _max_alpha(st.zU, dzU, tau)))
        dphi = (g @ dz
                - mu * (jnp.sum(ds / s) + jnp.sum(dz / dl) - jnp.sum(dz / du)))
        return dict(dz=dz, dyE=dyE, ds=ds, dlam=dlam, dzL=dzL, dzU=dzU,
                    alpha_max=alpha_max, alpha_dual=alpha_dual, dphi=dphi)

    def direction(st: IPState, g, cE, cI, JE, JI, W, mu):
        """Factor the condensed KKT matrix and compute the Newton direction."""
        z, s = st.z, st.s
        rI = cI - s
        dl = z - lb
        du = ub - z
        sigma_z = st.zL / dl + st.zU / du
        sigma_s = st.lam / s
        n = z.shape[0]

        H = (W + jnp.diag(sigma_z)
             + (st.delta_w + opts.delta_w_floor) * jnp.eye(n)
             + JI.T @ (sigma_s[:, None] * JI))
        rd = g + JE.T @ st.yE - JI.T @ st.lam - mu / dl + mu / du
        r_cond = JI.T @ ((mu / s - st.lam) - sigma_s * rI)
        rhs_primal = -(rd - r_cond)

        # IPOPT-style dual regularization, active only in recovery mode
        delta_c = jnp.where(st.delta_w > 0.0,
                            opts.delta_c_bar * mu ** opts.kappa_c,
                            opts.delta_c)
        fact = linalg.kkt_factorize(H, JE, delta_c, kkt_method)
        dz, dyE = linalg.kkt_solve(kkt_method, fact, rhs_primal, -cE,
                                   opts.kkt_refine)
        solve_ok = jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dyE))
        curv = dz @ (H @ dz)
        curv_ok = curv > 1.0e-14 * (dz @ dz)

        d = _finish(st, cI, JI, g, mu, dz, dyE)
        d.update(solve_ok=solve_ok, curv_ok=curv_ok, fact=fact,
                 rhs_primal=rhs_primal)
        return d

    def soc_direction(st: IPState, g, cI, JI, mu, fact, rhs_primal, c_soc):
        """Second-order correction: reuse the KKT factors with the corrected
        equality right-hand side (IPOPT algorithm step A-5.7)."""
        dz, dyE = linalg.kkt_solve(kkt_method, fact, rhs_primal, -c_soc,
                                   opts.kkt_refine)
        d = _finish(st, cI, JI, g, mu, dz, dyE)
        d.update(solve_ok=jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dyE)))
        return d

    def direction_struct(st: IPState, g, cE, cI, JE, JI, sVc, mu):
        """Newton direction via the structured *augmented* KKT (no dense H,
        no dense Schur chol — see solver/structured.py).  ``sVc`` is the
        factored L-BFGS Hessian (sigma, V, c) from lowrank.lbfgs_factors;
        the inequality block stays as explicit Schur rows with the benign
        s/λ diagonal instead of being condensed into H (stability — see
        structured.py's module note)."""
        from . import structured

        sigma, Vb, cb = sVc
        z, s = st.z, st.s
        dl = z - lb
        du = ub - z
        sigma_z = st.zL / dl + st.zU / du

        Dd = sigma + sigma_z + st.delta_w + opts.delta_w_floor

        r1 = -(g + JE.T @ st.yE - JI.T @ st.lam - mu / dl + mu / du)
        r2 = -cE
        r3 = mu / st.lam - cI
        delta_c = jnp.where(st.delta_w > 0.0,
                            opts.delta_c_bar * mu ** opts.kappa_c,
                            opts.delta_c)
        gdiag = jnp.concatenate([
            jnp.full(cE.shape[0], delta_c), s / st.lam])
        if opts.struct_sweep == "dense":
            fdt = (jnp.float32 if opts.struct_factor_dtype == "float32"
                   else None)
            fact = structured.factorize_dense(Dd, Vb, cb, JE, JI, gdiag,
                                              factor_dtype=fdt)
        else:
            fact = structured.factorize(Dd, Vb, cb, JE, JI, gdiag,
                                        struct_meta)
        dz, dyE, w = structured.solve(fact, struct_meta, r1, r2, r3,
                                      opts.kkt_refine)
        # Residual gate — the struct path's inertia/breakdown oracle.  The
        # dense path signals an unusable system via chol-NaN; QR-based
        # Woodbury/SMW instead can return finite-but-inaccurate solutions
        # on breakdown, so the measured relative KKT residual routes those
        # iterations into the same δ_w retry.
        dyw = jnp.concatenate([dyE, w])
        rel = structured.kkt_residual(fact, struct_meta, dz, dyw, r1,
                                      jnp.concatenate([r2, r3]))
        solve_ok = (jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dyw))
                    & (rel < opts.struct_rtol))
        # curvature w.r.t. the *condensed* Hessian (H₀ + J_IᵀΣ_sJ_I), the
        # operator the dense path tests
        sigma_s = st.lam / s
        Hdz = (structured.h0matvec(fact, dz)
               + JI.T @ (sigma_s * (JI @ dz)))
        curv = dz @ Hdz
        curv_ok = curv > 1.0e-14 * (dz @ dz)

        d = _finish(st, cI, JI, g, mu, dz, dyE)
        d.update(solve_ok=solve_ok, curv_ok=curv_ok, fact=fact,
                 rhs_primal=jnp.concatenate([r1, r3]))
        return d

    def soc_direction_struct(st: IPState, g, cI, JI, mu, fact, rhs_primal,
                             c_soc):
        """SOC through the structured factors (mirror of soc_direction).

        ``rhs_primal`` carries the packed (r1, r3) of the primary direction
        — the SOC changes only the equality right-hand side."""
        from . import structured

        n = st.z.shape[0]
        r1, r3 = rhs_primal[:n], rhs_primal[n:]
        dz, dyE, w = structured.solve(fact, struct_meta, r1, -c_soc, r3,
                                      opts.kkt_refine)
        d = _finish(st, cI, JI, g, mu, dz, dyE)
        d.update(solve_ok=jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dyE)))
        return d

    def mu_target(st: IPState):
        """LOQO-style centrality target for mu_strategy="adaptive".

        xi near 1 (perfectly centered) drives sigma — and the target — to
        ~0: the iterate can afford an aggressive barrier drop.  A badly
        centered iterate (xi << 1) keeps sigma at its 0.8 cap, i.e. mu
        barely moves below the average complementarity.
        """
        dl = st.z - lb
        du = ub - st.z
        compl = jnp.concatenate([st.s * st.lam, dl * st.zL, du * st.zU])
        avg = jnp.mean(compl)
        xi = jnp.min(compl) / jnp.maximum(avg, 1.0e-300)
        sigma = 0.1 * jnp.minimum(
            0.05 * (1.0 - xi) / jnp.maximum(xi, 1.0e-12), 2.0) ** 3
        return sigma * avg

    def phi_theta(z, s, mu, aux):
        """Barrier objective and constraint violation at a point."""
        bar = (jnp.sum(jnp.log(s)) + jnp.sum(jnp.log(z - lb))
               + jnp.sum(jnp.log(ub - z)))
        theta = jnp.sum(jnp.abs(eq(z, aux))) + jnp.sum(jnp.abs(ineq(z, aux) - s))
        return obj(z, aux) - mu * bar, theta

    def trial(z, s, dz, ds, alpha, mu, aux):
        """Evaluate a trial point: (phi_t, theta_t, cE_t)."""
        z_t = z + alpha * dz
        s_t = s + alpha * ds
        phi_t, theta_t = phi_theta(z_t, s_t, mu, aux)
        return phi_t, theta_t, eq(z_t, aux)

    def apply_step(st: IPState, d, alpha, accept, mu, err0):
        z_new = st.z + alpha * d["dz"]
        s_new = jnp.maximum(st.s + alpha * d["ds"], 1e-300)
        a_dual = jnp.where(accept, d["alpha_dual"], 0.0)
        yE_new = st.yE + alpha * d["dyE"]
        lam_new = st.lam + a_dual * d["dlam"]
        zL_new = st.zL + a_dual * d["dzL"]
        zU_new = st.zU + a_dual * d["dzU"]
        ks = opts.kappa_sigma
        dl = z_new - lb
        du = ub - z_new
        zL_new = jnp.clip(zL_new, mu / (ks * dl), ks * mu / dl)
        zU_new = jnp.clip(zU_new, mu / (ks * du), ks * mu / du)
        lam_new = jnp.clip(lam_new, mu / (ks * s_new), ks * mu / s_new)

        return IPState(
            z=jnp.where(accept, z_new, st.z),
            s=jnp.where(accept, s_new, st.s),
            yE=jnp.where(accept, yE_new, st.yE),
            lam=jnp.where(accept, lam_new, st.lam),
            zL=jnp.where(accept, zL_new, st.zL),
            zU=jnp.where(accept, zU_new, st.zU),
            mu=mu, delta_w=st.delta_w, nu=st.nu, err0=err0,
            alpha=jnp.where(accept, alpha, 0.0), it=st.it + 1,
            converged=err0 <= opts.tol,
        )

    def errors(st: IPState, g, cE, cI, JE, JI):
        return _kkt_errors(g, JE, JI, cE, cI - st.s, st, lb, ub, st.mu, opts)

    def slack_reset(st: IPState, cI):
        """Raise lagging slacks to the constraint value (Knitro-style reset);
        multipliers recentered so complementarity stays on target."""
        reset = cI > st.s
        s_new = jnp.where(reset, cI, st.s)
        lam_new = jnp.where(reset, st.mu / s_new, st.lam)
        return st._replace(s=s_new, lam=lam_new)

    raw = dict(eval_point=eval_point, eval_hess=eval_hess, grad_lag=grad_lag,
               direction=direction, soc_direction=soc_direction,
               direction_struct=direction_struct,
               soc_direction_struct=soc_direction_struct,
               phi_theta=phi_theta, trial=trial, mu_target=mu_target,
               apply_step=apply_step, errors=errors, slack_reset=slack_reset)
    pieces = {k: jax.jit(v) for k, v in raw.items()}
    pieces["raw"] = raw
    return pieces


_LS_DEBUG = False


def _filter_linesearch(pieces, st, d, mu, cE, phi0, theta0, filt, opts,
                       aux=()):
    """Host-side backtracking with filter memory and second-order correction.

    Returns (accepted, alpha, d_used, used_armijo).
    """
    z, s = st.z, st.s
    alpha_max = float(d["alpha_max"])
    dphi = float(d["dphi"])
    if _LS_DEBUG:
        print(f"    LS: theta0={theta0:.3e} phi0={phi0:.6f} dphi={dphi:.3e} "
              f"alpha_max={alpha_max:.3e} filter={len(filt.entries)}")
    alpha_rel = 1.0
    for k in range(opts.max_ls):
        alpha = alpha_rel * alpha_max
        phi_t, theta_t, cE_t = pieces["trial"](z, s, d["dz"], d["ds"],
                                               jnp.asarray(alpha), mu, aux)
        phi_t, theta_t = float(phi_t), float(theta_t)

        def acceptance(phi_t, theta_t, alpha):
            switching = (dphi < 0.0 and
                         alpha * (-dphi) ** opts.s_phi
                         > opts.delta_sw * theta0 ** opts.s_theta)
            armijo = (dphi < 0.0
                      and phi_t <= phi0 + opts.eta * alpha * dphi)
            progress = (theta_t < (1.0 - opts.gamma_theta) * theta0
                        or phi_t < phi0 - opts.gamma_phi * theta0)
            if theta0 <= filt.theta_min and switching:
                ok = armijo
            else:
                ok = progress or (switching and armijo)
            return ok and filt.acceptable(theta_t, phi_t), armijo and switching

        ok, by_armijo = acceptance(phi_t, theta_t, alpha)
        if _LS_DEBUG and k < 4:
            print(f"      k={k} a={alpha:.3e} theta_t={theta_t:.3e} "
                  f"phi_t={phi_t:.6f} ok={ok} armijo_rhs="
                  f"{phi0 + opts.eta * alpha * dphi:.6f} "
                  f"filter_ok={filt.acceptable(theta_t, phi_t)}")
        if ok:
            return True, alpha, d, by_armijo

        # Second-order correction on the *first* trial when infeasibility grew
        if k == 0 and theta_t >= theta0 and opts.max_soc > 0:
            c_soc = jnp.asarray(alpha_max) * cE + cE_t
            theta_prev = theta_t
            for p in range(opts.max_soc):
                d_soc = pieces["soc_direction"](
                    st, d["g"], d["cI"], d["JI"], mu, d["fact"],
                    d["rhs_primal"], c_soc)
                if not bool(d_soc["solve_ok"]):
                    break
                a_soc = float(d_soc["alpha_max"])
                phi_c, theta_c, cE_c = pieces["trial"](
                    z, s, d_soc["dz"], d_soc["ds"], jnp.asarray(a_soc), mu,
                    aux)
                phi_c, theta_c = float(phi_c), float(theta_c)
                ok_c, by_armijo_c = acceptance(phi_c, theta_c, a_soc)
                if _LS_DEBUG:
                    print(f"      soc{p} a={a_soc:.3e} theta={theta_c:.3e} "
                          f"phi={phi_c:.6f} ok={ok_c}")
                if ok_c:
                    return True, a_soc, d_soc, by_armijo_c
                if theta_c > opts.kappa_soc * theta_prev:
                    break  # SOC not helping
                theta_prev = theta_c
                c_soc = jnp.asarray(a_soc) * c_soc + cE_c

        alpha_rel *= 0.5
    return False, 0.0, d, False


def ip_iterate(pieces, st: IPState, opts: IPOptions, filt: Filter = None,
               lbfgs: LBFGSHessian = None, aux=(), force_mu_drop=False):
    """One IP iteration, orchestrated on host (all heavy math on device)."""
    f, g, cE, cI, JE, JI = pieces["eval_point"](st.z, aux)
    st = pieces["slack_reset"](st, cI)
    err_mu, err0 = pieces["errors"](st, g, cE, cI, JE, JI)

    # barrier update: monotone Fiacco-McCormick rung, optionally jumping to
    # the LOQO centrality target when mu_strategy="adaptive"; the stall
    # watchdog (mu_force_after) can force a rung when the subproblem
    # trigger refuses to fire at small mu
    mu = float(st.mu)
    if (float(err_mu) <= opts.kappa_eps * mu or force_mu_drop) \
            and mu > opts.mu_min:
        rung = min(opts.kappa_mu * mu, mu ** opts.theta_mu)
        if opts.mu_strategy == "adaptive":
            rung = min(rung, float(pieces["mu_target"](st)))
        mu = max(opts.mu_min, rung)
        if filt is not None:
            filt.reset()  # new barrier subproblem: fresh filter (IPOPT)
    mu_j = jnp.asarray(mu)
    st = st._replace(mu=mu_j)

    if filt is None:
        filt = Filter(1.0)

    phi0, theta0 = pieces["phi_theta"](st.z, st.s, mu_j, aux)
    phi0, theta0 = float(phi0), float(theta0)

    if lbfgs is not None:
        W = lbfgs.materialize()
    else:
        W = pieces["eval_hess"](st.z, st.yE, st.lam, aux)

    # inertia correction: retry the (cheap) KKT solve with growing Hessian
    # regularization until the direction has positive curvature and the
    # filter line search accepts
    delta = float(st.delta_w)
    accepted, alpha, d_used = False, 0.0, None
    for _ in range(15):
        st_try = st._replace(delta_w=jnp.asarray(delta))
        d = pieces["direction"](st_try, g, cE, cI, JE, JI, W, mu_j)
        d["g"], d["cI"], d["JI"] = g, cI, JI
        if bool(d["solve_ok"]) and bool(d["curv_ok"]):
            accepted, alpha, d_used, by_armijo = _filter_linesearch(
                pieces, st, d, mu_j, cE, phi0, theta0, filt, opts, aux)
            if accepted:
                if not by_armijo:
                    filt.add(theta0, phi0)
                break
        delta = opts.delta_w_init if delta == 0.0 else delta * 10.0
        if delta > opts.delta_w_max:
            break

    # regularization bookkeeping: decay on success, keep on failure
    if accepted:
        delta_next = 0.0 if delta <= opts.delta_w_init else delta / 3.0
    else:
        delta_next = min(max(delta, opts.delta_w_init) * 10.0,
                         opts.delta_w_max)
        d_used = d  # unused direction (alpha = 0)

    st = st._replace(delta_w=jnp.asarray(delta_next))
    st = pieces["apply_step"](st, d_used, jnp.asarray(alpha),
                              jnp.asarray(accepted), mu_j, err0)
    return st


def solve(problem_funcs, z0, lb, ub, opts: IPOptions = IPOptions(),
          callback=None, warm=None, aux=()):
    """Host-driven solve (single problem).  Returns (state, info)."""
    from .warm_start import apply_warm

    scales = None
    if opts.scale:
        problem_funcs, scales = scale_funcs(problem_funcs, z0,
                                            opts.scale_max, aux)
    lbr, ubr = relaxed_bounds(lb, ub, opts)
    pieces = make_pieces(problem_funcs, lbr, ubr, opts)
    st = init_state(problem_funcs, z0, lbr, ubr, opts, aux)
    st = apply_warm(st, warm)
    _, theta_init = pieces["phi_theta"](st.z, st.s, st.mu, aux)
    filt = Filter(float(theta_init), opts.gamma_theta, opts.gamma_phi,
                  opts.theta_max_factor)
    lbfgs = (LBFGSHessian(st.z.shape[0], opts.lbfgs_memory)
             if opts.hessian in ("lbfgs", "hybrid") else None)
    history = []
    exact_cooldown = 0  # iterations to stay on L-BFGS after a rejected exact step
    acceptable_run = 0
    acceptable_stop = False
    mu_stall = 0  # iterations since the barrier last moved (watchdog)
    best = None  # (err0, state) lowest-error iterate, wedge-recovery target
    wedged_its = 0  # consecutive iterations with no accepted step
    recoveries = 0
    mu_force_floor = opts.mu_min  # raised by wedge recovery
    for k in range(opts.max_iter):
        z_prev = st.z
        mu_prev = float(st.mu)
        use_exact = opts.hessian == "exact" or (
            opts.hessian == "hybrid"
            and float(st.mu) <= opts.hybrid_mu_switch
            and float(st.err0) <= opts.hybrid_err_switch
            and exact_cooldown == 0)
        force_mu = False
        if opts.mu_force_after > 0 and mu_stall >= opts.mu_force_after:
            # only force once primal-feasible to tolerance AND the scaled
            # KKT error is O(1)-small: the plateau we are breaking is a
            # complementarity grind, not infeasibility and not a diverging
            # subproblem (the demo mission wedged at err≈1e4 when rungs
            # were forced under a theta-only gate — verify drive r3)
            _, theta_now = pieces["phi_theta"](st.z, st.s, st.mu, aux)
            force_mu = (float(theta_now) <= opts.tol
                        and float(st.err0) <= 1.0
                        and float(st.mu) > mu_force_floor)
        st = ip_iterate(pieces, st, opts, filt,
                        None if use_exact else lbfgs, aux,
                        force_mu_drop=force_mu)
        mu_stall = 0 if float(st.mu) != mu_prev else mu_stall + 1
        if use_exact and float(st.alpha) == 0.0:
            exact_cooldown = 10
        elif exact_cooldown > 0:
            exact_cooldown -= 1
        if lbfgs is not None and float(st.alpha) > 0.0:
            gl_new = pieces["grad_lag"](st.z, st.yE, st.lam, aux)
            gl_old = pieces["grad_lag"](z_prev, st.yE, st.lam, aux)
            lbfgs.update(np.asarray(st.z - z_prev),
                         np.asarray(gl_new - gl_old))
        err_now = float(st.err0)
        if np.isfinite(err_now) and (best is None or err_now < best[0]):
            best = (err_now, st)
        if opts.wedge_recover_after > 0 and not bool(st.converged):
            # the ONLY trigger is a sustained alpha=0 lock (no step accepted
            # for wedge_recover_after consecutive iterations).  Error
            # explosions are deliberately NOT a trigger: large transient
            # excursions are normal both in the cold-start phase and after
            # barrier rung drops, and healthy runs recover from them on
            # their own (demo control run: err 8e4 at it 650, converged
            # anyway) — acting on them burned recoveries and derailed
            # otherwise-convergent solves.
            wedged_its = wedged_its + 1 if float(st.alpha) == 0.0 else 0
            if (wedged_its >= opts.wedge_recover_after
                    and best is not None
                    and recoveries < opts.wedge_max_recoveries):
                mu_new = min(opts.mu_init,
                             max(float(best[1].mu) * 100.0, opts.mu_min))
                st = best[1]._replace(
                    mu=jnp.asarray(mu_new, dtype=best[1].mu.dtype))
                filt.entries.clear()
                if lbfgs is not None:
                    lbfgs.pairs.clear()
                wedged_its = 0
                mu_stall = 0
                recoveries += 1
                # the rung we wedged below was too ambitious for the
                # watchdog: stop FORCING below the recovered level (natural
                # rung drops — subproblem actually solved — stay allowed),
                # breaking the force->wedge->recover cycle
                mu_force_floor = max(mu_force_floor, mu_new)
            elif wedged_its >= max(2 * opts.wedge_recover_after, 30):
                # recoveries exhausted and still locked: stop burning
                # iterations (the pre-fix demo spun 1400 dead iterations);
                # the best-iterate return below reports the best point
                break
        if callback is not None:
            callback(k, st)
        history.append((float(st.err0), float(st.mu), float(st.alpha)))
        if bool(st.converged):
            break
        if float(st.err0) <= opts.acceptable_tol:
            acceptable_run += 1
            if acceptable_run >= opts.acceptable_iter:
                acceptable_stop = True
                break
        else:
            acceptable_run = 0
    # out of iterations with a worse-than-best iterate (e.g. a late wedge
    # with recoveries exhausted): return the best recorded point instead —
    # IPOPT likewise reports the best acceptable point on restoration failure
    if (not bool(st.converged) and best is not None
            and (not np.isfinite(float(st.err0))
                 or best[0] < float(st.err0))):
        st = best[1]
    final_err = float(st.err0)
    # classify like IPOPT: optimal / solved-to-acceptable / out of iterations
    if bool(st.converged) and final_err <= opts.tol:
        status = "optimal"
    elif acceptable_stop or final_err <= opts.acceptable_tol:
        status = "acceptable"
    else:
        status = "max_iter"
    info = {
        "iterations": int(st.it),
        "converged": status in ("optimal", "acceptable"),
        "acceptable": status == "acceptable",
        "status": status,
        "err": final_err,
        "history": history,
        "scales": scales,
    }
    return st, info


class FusedState(NamedTuple):
    """State for the fully fused on-device solver: IP state + L-BFGS ring
    buffers + the device-side (θ, φ) filter + acceptable-run counter.

    The filter is a fixed-size ring buffer of (θ_bound, φ_bound) pairs —
    the on-device twin of :class:`Filter` (host).  Empty slots hold +inf,
    which never dominates a trial point."""

    ip: IPState
    S: jnp.ndarray  # [mem, n] accepted steps (ring buffer)
    Y: jnp.ndarray  # [mem, n] Lagrangian-gradient differences
    count: jnp.ndarray  # total accepted (s, y) pairs ever stored
    acc_run: jnp.ndarray  # consecutive iterations at acceptable error
    filt_tb: jnp.ndarray  # [FILTER_SIZE] filter θ bounds
    filt_pb: jnp.ndarray  # [FILTER_SIZE] filter φ bounds
    filt_idx: jnp.ndarray  # next ring slot
    theta_max: jnp.ndarray  # absolute infeasibility cap (from θ at z0)
    theta_min: jnp.ndarray  # switching-condition threshold (IPOPT θ_min)


FILTER_SIZE = 8


def _lbfgs_matrix_device(S, Y, count, sigma_floor=1e-4, sigma_cap=1e6):
    """Materialize the damped L-BFGS Hessian approximation on device.

    Chronological (oldest-first) BFGS recursion over the ring buffer with
    Powell damping — the device twin of :class:`LBFGSHessian` (matmuls land
    on the MXU; ~mem·n² flops, negligible next to the KKT factorization).
    """
    mem, n = S.shape
    last = (count - 1) % mem
    s_l, y_l = S[last], Y[last]
    sy_l = s_l @ y_l
    yy_l = y_l @ y_l
    sigma = jnp.where(
        (count > 0) & (sy_l > 1e-12 * jnp.sqrt(jnp.maximum(yy_l, 1e-30))
                       * jnp.linalg.norm(s_l)),
        jnp.clip(yy_l / jnp.where(sy_l != 0.0, sy_l, 1.0),
                 sigma_floor, sigma_cap),
        1.0)
    B0 = sigma * jnp.eye(n)

    def body(j, B):
        k = count - mem + j
        idx = k % mem
        valid = k >= 0
        s = S[idx]
        y = Y[idx]
        Bs = B @ s
        sBs = s @ Bs
        sy = s @ y
        theta = jnp.where(sy < 0.2 * sBs,
                          0.8 * sBs / jnp.maximum(sBs - sy, 1e-30), 1.0)
        y_d = theta * y + (1.0 - theta) * Bs
        sy_d = s @ y_d
        ok = valid & (sBs > 1e-16) & (sy_d > 1e-16)
        B_new = (B - jnp.outer(Bs, Bs) / jnp.maximum(sBs, 1e-30)
                 + jnp.outer(y_d, y_d) / jnp.maximum(sy_d, 1e-30))
        return jnp.where(ok, B_new, B)

    return jax.lax.fori_loop(0, mem, body, B0)


def make_fused_step(funcs, lb, ub, opts: IPOptions = IPOptions(),
                    z0_scale_ref=None, aux_example=None):
    """Fully on-device single-iteration step (vmappable, for batched solves
    and low-dispatch TPU execution).

    Same globalization as the host loop (:func:`ip_iterate` +
    :func:`_filter_linesearch`), re-expressed as device control flow over
    :class:`FusedState`:

    * (θ, φ) **filter with memory** — fixed-size ring buffer, reset on each
      new barrier subproblem, with the absolute ``theta_max`` cap;
    * **within-iteration inertia retries** — a bounded ``while_loop`` over
      growing δ_w levels that reuses the (expensive) evaluated point and
      only refactors the (cheap, condensed-Cholesky) KKT system;
    * **second-order correction** — one SOC direction reusing the factors
      when the full step grows the infeasibility;
    * fraction-to-boundary, Armijo/switching acceptance, acceptable-iter
      termination — device ops throughout, so a whole dispersion batch
      advances in lock-step under ``vmap`` and many iterations chain in one
      dispatch with ``lax.scan`` (see :func:`solve_device`).

    Converged lanes freeze.  ``z0_scale_ref``: reference point for
    gradient-based scaling (shared by every lane of a batch).

    ``step(fst, aux)`` / ``state0(z0, aux)`` take a per-case problem-data
    pytree (``()`` when unused); under ``vmap`` over (state, aux) each lane
    solves physically distinct problem data (wind tables, dispersed masses).
    ``aux_example`` is the nominal case used for the shared gradient scaling.
    """
    struct_meta = (funcs.get("struct_meta")
                   if isinstance(funcs, dict) else None)
    funcs = normalize_funcs(funcs)
    aux_ex = () if aux_example is None else aux_example
    if opts.scale and z0_scale_ref is not None:
        funcs, _ = scale_funcs(funcs, z0_scale_ref, opts.scale_max, aux_ex)
    lbr, ubr = relaxed_bounds(lb, ub, opts)
    raw = make_pieces(funcs, lbr, ubr, opts, struct_meta=struct_meta)["raw"]
    use_lbfgs = opts.hessian in ("lbfgs", "hybrid")
    use_struct = opts.kkt_method == "struct"
    if opts.batch_safe_loops and opts.hessian == "hybrid":
        raise ValueError(
            "batch_safe_loops is incompatible with hessian='hybrid' (the "
            "exact-Newton endgame lax.cond would execute both branches per "
            "lane under vmap, paying the dense n^2 Hessian for every lane); "
            "use hessian='lbfgs' for batched solves")
    if use_struct and struct_meta is None:
        raise ValueError(
            "kkt_method='struct' needs funcs['struct_meta'] — build the "
            "function dict with Problem.solver_funcs(structured=True)")
    f64 = jnp.float64

    def filter_ok(theta_t, phi_t, fst):
        """Trial point not dominated by any filter entry and under the cap."""
        dominated = jnp.any((theta_t >= fst.filt_tb) & (phi_t >= fst.filt_pb))
        return (jnp.isfinite(theta_t) & jnp.isfinite(phi_t)
                & (theta_t <= fst.theta_max) & ~dominated)

    def acceptance(fst, theta0, phi0, dphi, alpha, phi_t, theta_t):
        """(ok, by_armijo_switching) — host `_filter_linesearch.acceptance`."""
        switching = (dphi < 0.0) & (
            alpha * (-dphi) ** opts.s_phi
            > opts.delta_sw * theta0 ** opts.s_theta)
        armijo = (dphi < 0.0) & (phi_t <= phi0 + opts.eta * alpha * dphi)
        progress = ((theta_t < (1.0 - opts.gamma_theta) * theta0)
                    | (phi_t < phi0 - opts.gamma_phi * theta0))
        ok = jnp.where(
            (theta0 <= fst.theta_min) & switching,
            armijo, progress | (switching & armijo))
        return ok & filter_ok(theta_t, phi_t, fst), armijo & switching

    def _d_small(d):
        """Direction fields needed beyond the search (drops the factors)."""
        return {k: d[k] for k in ("dz", "ds", "dyE", "dlam", "dzL", "dzU",
                                  "alpha_dual")}

    def linesearch_soc(fst, st_r, d, g, cE, cI, JI, mu, phi0, theta0, aux,
                       soc_fn=None):
        """Full-step trial → SOC on infeasibility growth → backtracking.

        ``soc_fn`` computes the second-order correction from the direction's
        factors (defaults to the dense-KKT soc_direction; the structured
        path passes its own).  Returns (ok, alpha, d_used_small, by_armijo).
        """
        if soc_fn is None:
            soc_fn = raw["soc_direction"]
        z, s = st_r.z, st_r.s
        dphi = d["dphi"]
        alpha_max = d["alpha_max"]

        # --- full step ---
        phi_t, theta_t, cE_t = raw["trial"](z, s, d["dz"], d["ds"],
                                            alpha_max, mu, aux)
        ok0, arm0 = acceptance(fst, theta0, phi0, dphi, alpha_max,
                               phi_t, theta_t)

        # --- second-order correction (IPOPT A-5.7, one attempt) ---
        # lax.cond skips the extra factor-reuse solve + trial whenever the
        # full step was accepted or did not grow the infeasibility (at B=1;
        # under vmap it lowers to a select, which is what a batch needs
        # anyway since lanes diverge)
        soc_needed = (~ok0) & (theta_t >= theta0) & (opts.max_soc > 0)

        def soc_branch(_):
            c_soc = alpha_max * cE + cE_t
            d_soc = soc_fn(st_r, g, cI, JI, mu, d["fact"],
                           d["rhs_primal"], c_soc)
            a_soc = d_soc["alpha_max"]
            phi_c, theta_c, _ = raw["trial"](z, s, d_soc["dz"], d_soc["ds"],
                                             a_soc, mu, aux)
            okc, armc = acceptance(fst, theta0, phi0, d_soc["dphi"], a_soc,
                                   phi_c, theta_c)
            return (okc & d_soc["solve_ok"], armc, a_soc, _d_small(d_soc))

        def soc_skip(_):
            return (jnp.asarray(False), jnp.asarray(False),
                    jnp.asarray(0.0, f64), _d_small(d))

        if not opts.batch_safe_loops:
            okc, armc, a_soc, d_soc_small = jax.lax.cond(
                soc_needed, soc_branch, soc_skip, None)
        elif opts.max_soc > 0:
            # batch-safe: unconditional compute + select — the dataflow vmap
            # would lower the cond to anyway, minus the batched-cond
            # construct itself (PERF.md round-4 bisect)
            okc, armc, a_soc, d_soc_small = jax.tree.map(
                lambda a, b: jnp.where(soc_needed, a, b),
                soc_branch(None), soc_skip(None))
        else:
            # static skip: batch callers disable SOC (max_soc=0) so the
            # batched step never pays the extra factor-reuse solve
            okc, armc, a_soc, d_soc_small = soc_skip(None)
        soc_ok = soc_needed & okc

        # --- backtracking on the primary direction (α_rel = 1/2, 1/4, ...)
        #     entered only when neither the full step nor SOC was accepted ---
        def body(carry):
            alpha_rel, done, best, by_arm, k = carry
            alpha = alpha_rel * alpha_max
            phi_b, theta_b, _ = raw["trial"](z, s, d["dz"], d["ds"], alpha,
                                             mu, aux)
            ok_b, arm_b = acceptance(fst, theta0, phi0, dphi, alpha,
                                     phi_b, theta_b)
            best = jnp.where(ok_b & ~done, alpha_rel, best)
            by_arm = jnp.where(ok_b & ~done, arm_b, by_arm)
            return (alpha_rel * 0.5, done | ok_b, best, by_arm, k + 1)

        def cond(carry):
            _, done, _, _, k = carry
            return (~done) & (k < opts.max_ls)

        bt_init = (jnp.asarray(0.5, f64), ok0 | soc_ok,
                   jnp.asarray(0.0, f64), jnp.asarray(False), jnp.asarray(1))
        if opts.batch_safe_loops:
            # fixed-trip scan, masked by `done` exactly as the while body
            # already is — same semantics, no batched-predicate while in the
            # vmapped lowering.  The while runs body for k=1..max_ls-1.
            _, bt_done, bt_rel, bt_arm, _ = jax.lax.scan(
                lambda c, _: (body(c), None), bt_init, None,
                length=max(opts.max_ls - 1, 0))[0]
        else:
            _, bt_done, bt_rel, bt_arm, _ = jax.lax.while_loop(
                cond, body, bt_init)
        bt_ok = bt_done & ~ok0 & ~soc_ok & (bt_rel > 0.0)

        ok = ok0 | soc_ok | bt_ok
        alpha = jnp.where(
            ok0, alpha_max,
            jnp.where(soc_ok, a_soc, bt_rel * alpha_max))
        by_armijo = jnp.where(ok0, arm0, jnp.where(soc_ok, armc, bt_arm))
        d_used = jax.tree.map(
            lambda a, b: jnp.where(soc_ok, a, b),
            d_soc_small, _d_small(d))
        return ok, alpha, d_used, by_armijo

    def step(fst: FusedState, aux=()) -> FusedState:
        st = fst.ip
        frozen = st.converged
        z_old = st.z
        f, g, cE, cI, JE, JI = raw["eval_point"](st.z, aux)
        st_r = raw["slack_reset"](st, cI)
        err_mu, err0 = raw["errors"](st_r, g, cE, cI, JE, JI)
        mu_drop = (err_mu <= opts.kappa_eps * st_r.mu) & (st_r.mu > opts.mu_min)
        rung = jnp.minimum(opts.kappa_mu * st_r.mu,
                           st_r.mu ** opts.theta_mu)
        if opts.mu_strategy == "adaptive":
            # static Python branch: the default "monotone" HLO is unchanged
            rung = jnp.minimum(rung, raw["mu_target"](st_r))
        mu = jnp.where(mu_drop, jnp.maximum(opts.mu_min, rung), st_r.mu)
        st_r = st_r._replace(mu=mu)

        # new barrier subproblem → fresh filter (IPOPT resets it)
        inf = jnp.asarray(jnp.inf, f64)
        fst = fst._replace(
            filt_tb=jnp.where(mu_drop, inf, fst.filt_tb),
            filt_pb=jnp.where(mu_drop, inf, fst.filt_pb),
            filt_idx=jnp.where(mu_drop, 0, fst.filt_idx))

        phi0, theta0 = raw["phi_theta"](st_r.z, st_r.s, mu, aux)

        def run_retry(direction_fn, soc_fn):
            """Bounded inertia-retry loop: re-factor with growing δ_w,
            reusing the evaluated point (g, cE, cI, JE, JI, Hessian)."""
            n = st_r.z.shape[0]
            zeros_d = dict(
                dz=jnp.zeros(n), ds=jnp.zeros_like(st_r.s),
                dyE=jnp.zeros_like(st_r.yE), dlam=jnp.zeros_like(st_r.lam),
                dzL=jnp.zeros(n), dzU=jnp.zeros(n),
                alpha_dual=jnp.asarray(0.0, f64))
            init = dict(
                delta=st_r.delta_w, k=jnp.asarray(0),
                done=jnp.asarray(False), alpha=jnp.asarray(0.0, f64),
                d=zeros_d, by_armijo=jnp.asarray(False),
                delta_used=st_r.delta_w)

            def retry_cond(c):
                return (~c["done"]) & (c["k"] < opts.max_inertia_retries)

            def retry_body(c):
                st_try = st_r._replace(delta_w=c["delta"])
                d = direction_fn(st_try)
                ls_ok, alpha, d_used, by_arm = linesearch_soc(
                    fst, st_r, d, g, cE, cI, JI, mu, phi0, theta0, aux,
                    soc_fn)
                success = d["solve_ok"] & d["curv_ok"] & ls_ok
                take = success & ~c["done"]
                d_new = jax.tree.map(
                    lambda a, b: jnp.where(take, a, b), d_used, c["d"])
                delta_next = jnp.where(
                    c["delta"] == 0.0, opts.delta_w_init,
                    jnp.minimum(c["delta"] * 100.0, opts.delta_w_max))
                return dict(
                    delta=delta_next, k=c["k"] + 1, done=c["done"] | success,
                    alpha=jnp.where(take, alpha, c["alpha"]), d=d_new,
                    by_armijo=jnp.where(take, by_arm, c["by_armijo"]),
                    delta_used=jnp.where(take, c["delta"], c["delta_used"]))

            if opts.batch_safe_loops:
                # static unroll (batch callers set max_inertia_retries=1):
                # every trip's direction solve executes unconditionally, so
                # keep the trip count at 1 for batches and let a failed
                # iteration escalate δ_w across scan iterations through the
                # existing failure bookkeeping (delta_next below) instead of
                # retrying in-place.
                c = init
                for _ in range(opts.max_inertia_retries):
                    c = retry_body(c)
                return c
            return jax.lax.while_loop(retry_cond, retry_body, init)

        def retry_dense(W):
            return run_retry(
                lambda st_try: raw["direction"](st_try, g, cE, cI, JE, JI,
                                                W, mu),
                raw["soc_direction"])

        def retry_struct(_):
            """Structured condensed KKT on the factored L-BFGS Hessian:
            no dense n×n H, no dense Schur Cholesky (solver/structured.py)."""
            from .lowrank import lbfgs_factors

            sVc = lbfgs_factors(fst.S, fst.Y, fst.count)
            return run_retry(
                lambda st_try: raw["direction_struct"](st_try, g, cE, cI,
                                                       JE, JI, sVc, mu),
                raw["soc_direction_struct"])

        if use_struct and opts.hessian == "hybrid":
            # exact-Newton endgame through the dense path (an exact Hessian
            # is not low-rank); L-BFGS iterations through the structured
            # path.  lax.cond executes only the taken branch at B=1, and
            # the dense n² work exists only inside the exact branch.
            use_exact = ((mu <= opts.hybrid_mu_switch)
                         & (err0 <= opts.hybrid_err_switch))
            out = jax.lax.cond(
                use_exact,
                lambda _: retry_dense(
                    raw["eval_hess"](st_r.z, st_r.yE, st_r.lam, aux)),
                retry_struct, None)
        elif use_struct and use_lbfgs:
            out = retry_struct(None)
        elif opts.hessian == "hybrid":
            # exact-Newton endgame: once the barrier and error are small,
            # switch from L-BFGS to the AD Lagrangian Hessian — measured to
            # cut the tail from ~400 grinding iterations to a few dozen
            # (non-PD exact Hessians are handled by the chol-NaN inertia
            # retry within the same iteration).  lax.cond executes only the
            # taken branch at B=1; the L-BFGS ring stays maintained as the
            # fallback.
            use_exact = ((mu <= opts.hybrid_mu_switch)
                         & (err0 <= opts.hybrid_err_switch))
            W = jax.lax.cond(
                use_exact,
                lambda _: raw["eval_hess"](st_r.z, st_r.yE, st_r.lam, aux),
                lambda _: _lbfgs_matrix_device(fst.S, fst.Y, fst.count),
                None)
            out = retry_dense(W)
        elif use_lbfgs:
            out = retry_dense(_lbfgs_matrix_device(fst.S, fst.Y, fst.count))
        else:
            out = retry_dense(
                raw["eval_hess"](st_r.z, st_r.yE, st_r.lam, aux))
        accept = out["done"]
        alpha = jnp.where(accept, out["alpha"], 0.0)

        # regularization bookkeeping: decay on success, grow on failure
        delta_next = jnp.where(
            accept,
            jnp.where(out["delta_used"] > opts.delta_w_init,
                      out["delta_used"] / 3.0, 0.0),
            jnp.minimum(jnp.maximum(st_r.delta_w, opts.delta_w_init) * 10.0,
                        opts.delta_w_max))
        st_r = st_r._replace(delta_w=delta_next)
        new = raw["apply_step"](st_r, out["d"], alpha, accept, mu, err0)

        # --- filter update: add (θ0, φ0) margins unless pure Armijo accept ---
        add = accept & ~out["by_armijo"]
        slot = fst.filt_idx % FILTER_SIZE
        tb_new = (1.0 - opts.gamma_theta) * theta0
        pb_new = phi0 - opts.gamma_phi * theta0
        filt_tb = fst.filt_tb.at[slot].set(
            jnp.where(add, tb_new, fst.filt_tb[slot]))
        filt_pb = fst.filt_pb.at[slot].set(
            jnp.where(add, pb_new, fst.filt_pb[slot]))
        filt_idx = fst.filt_idx + jnp.where(add, 1, 0)

        # --- device-side L-BFGS pair update ---
        if use_lbfgs:
            s_vec = new.z - z_old
            gl_new = raw["grad_lag"](new.z, new.yE, new.lam, aux)
            gl_old = raw["grad_lag"](z_old, new.yE, new.lam, aux)
            y_vec = gl_new - gl_old
            ss = s_vec @ s_vec
            sy = s_vec @ y_vec
            pair_ok = (accept & jnp.isfinite(sy) & (ss > 0.0)
                       & (jnp.abs(sy) > 1e-12 * ss))
            idx = fst.count % fst.S.shape[0]
            S_new = fst.S.at[idx].set(jnp.where(pair_ok, s_vec, fst.S[idx]))
            Y_new = fst.Y.at[idx].set(jnp.where(pair_ok, y_vec, fst.Y[idx]))
            count_new = fst.count + jnp.where(pair_ok, 1, 0)
        else:
            S_new, Y_new, count_new = fst.S, fst.Y, fst.count

        # --- acceptable termination (IPOPT acceptable_tol semantics) ---
        acc_run = jnp.where(err0 <= opts.acceptable_tol, fst.acc_run + 1,
                            jnp.zeros_like(fst.acc_run))
        new = new._replace(converged=new.converged
                           | (acc_run >= opts.acceptable_iter))

        out_state = FusedState(
            ip=new, S=S_new, Y=Y_new, count=count_new, acc_run=acc_run,
            filt_tb=filt_tb, filt_pb=filt_pb, filt_idx=filt_idx,
            theta_max=fst.theta_max, theta_min=fst.theta_min)
        # frozen lanes pass through unchanged (it stays at the converged count)
        return jax.tree.map(lambda a, b: jnp.where(frozen, a, b),
                            fst, out_state)

    def state0(z0, aux=()):
        ip0 = init_state(funcs, z0, lbr, ubr, opts, aux)
        n = ip0.z.shape[0]
        mem = opts.lbfgs_memory
        _, theta0 = raw["phi_theta"](ip0.z, ip0.s, ip0.mu, aux)
        theta_ref = jnp.maximum(1.0, theta0)
        return FusedState(
            ip=ip0,
            S=jnp.zeros((mem, n)), Y=jnp.zeros((mem, n)),
            count=jnp.asarray(0, jnp.int64), acc_run=jnp.asarray(0, jnp.int64),
            # explicit dtype: a weak-typed jnp.inf fill makes the state0
            # output's avals differ from the scan carry's (weak_type
            # True->False), so the SECOND run_chunk dispatch re-lowers the
            # whole fused program — observed as a second ~20-min remote
            # compile mid-measured-run (bench rehearsal m3, round 4)
            filt_tb=jnp.full(FILTER_SIZE, jnp.inf, dtype=theta_ref.dtype),
            filt_pb=jnp.full(FILTER_SIZE, jnp.inf, dtype=theta_ref.dtype),
            filt_idx=jnp.asarray(0, jnp.int64),
            theta_max=opts.theta_max_factor * theta_ref,
            theta_min=1.0e-4 * theta_ref)

    return step, state0


def prebuild_device_loop(funcs, lb, ub, opts: IPOptions = IPOptions(),
                         z0_scale_ref=None, aux_example=(), chunk=40):
    """Build the jitted chunked iteration loop once for repeated solves.

    Returns ``(run_chunk, state0)`` for :func:`solve_device`'s ``prebuilt``
    parameter.  The jitted ``run_chunk`` is created a single time, so its
    (large) compiled executable is traced/loaded once and reused across
    every subsequent solve — bench warm-up + measured runs, parameter
    sweeps, h-refinement rounds at unchanged mesh.
    """
    step, state0 = make_fused_step(funcs, lb, ub, opts,
                                   z0_scale_ref=z0_scale_ref,
                                   aux_example=aux_example)

    @jax.jit
    def run_chunk(fst, aux):
        def body(c, _):
            return step(c, aux), None
        return jax.lax.scan(body, fst, None, length=chunk)[0]

    return run_chunk, state0


def solve_device(funcs, z0, lb, ub, opts: IPOptions = IPOptions(),
                 chunk=40, callback=None, warm=None, aux=(),
                 deadline_s=None, prebuilt=None):
    """Low-dispatch solve: ``chunk`` fused iterations per device round-trip.

    The whole iteration (residuals, Jacobians, L-BFGS Hessian, KKT factor,
    line search, update) runs as one compiled ``lax.scan`` body; the host
    only checks convergence between chunks.  This is the TPU execution path —
    the piecewise host loop of :func:`solve` is kept for CPU debugging and
    for the filter-with-memory/SOC extras it provides.

    ``deadline_s`` (host-side only, does not affect the compiled program):
    stop between chunks once this much wall-clock has elapsed and return the
    partial state — callers with an external time budget (bench.py) get a
    reportable result instead of nothing.

    ``prebuilt``: a ``(run_chunk, state0)`` pair from
    :func:`prebuild_device_loop` — repeated solves then share ONE compiled
    executable.  Without it every call re-traces, and on the remote-TPU
    toolchain even a persistent-cache *hit* pays minutes of executable
    deserialization per trace (the compiled fused step is ~200 MB).
    """
    import time as _time

    from .warm_start import apply_warm

    t_end = (_time.time() + deadline_s) if deadline_s else None
    if prebuilt is not None:
        run_chunk, state0 = prebuilt
    else:
        run_chunk, state0 = prebuild_device_loop(funcs, lb, ub, opts,
                                                 z0_scale_ref=z0,
                                                 aux_example=aux, chunk=chunk)
    fst = state0(jnp.asarray(z0), aux)
    if warm is not None:
        fst = fst._replace(ip=apply_warm(fst.ip, warm))

    deadline_hit = False
    n_chunks = (opts.max_iter + chunk - 1) // chunk
    # mu-stall watchdog at chunk granularity (opts.mu_force_after, in
    # iterations).  The compiled step can grind hundreds of iterations at
    # one barrier rung (err_mu <= kappa_eps*mu is hard to hit with a
    # quasi-Newton direction at small mu); when mu hasn't moved across
    # enough whole chunks, force one monotone rung drop by editing the
    # carried state HOST-side between dispatches — the fused-step HLO (and
    # its warm compile cache entry) is untouched.  Unlike the host loop's
    # watchdog this cannot gate on theta<=tol (theta isn't carried in the
    # state and evaluating it would need a separately compiled program), so
    # it relies on the stall length alone; the forced rung is the same
    # monotone-decreasing formula the device uses, so the filter reset
    # below mirrors exactly what the on-device drop does.
    mu_ref = float(fst.ip.mu)
    stall_its = 0
    best = None  # (err0, fst) wedge-recovery target (chunk granularity)
    err_ref = None  # previous chunk's err0, for bit-identical wedge check
    recoveries = 0
    mu_force_floor = opts.mu_min  # raised by wedge recovery
    for k in range(n_chunks):
        fst = run_chunk(fst, aux)
        if callback is not None:
            callback(k, fst.ip)
        if bool(fst.ip.converged):
            break
        if t_end is not None and _time.time() > t_end:
            deadline_hit = True
            break
        if opts.wedge_recover_after > 0:
            err_now = float(fst.ip.err0)
            if np.isfinite(err_now) and (best is None or err_now < best[0]):
                best = (err_now, fst)
            # wedged: a whole chunk accepted nothing (alpha 0, bit-identical
            # err — same signature batch.reset_diverged uses).  Error
            # explosions are deliberately NOT a trigger (healthy runs spike
            # and recover on their own — see the host loop's note).  Restore
            # the best chunk-boundary state with the barrier raised two
            # rungs, filter + L-BFGS memory reset — host-side edits only,
            # the compiled step's HLO (and its warm cache entry) untouched.
            wedged = (err_ref is not None and err_now == err_ref
                      and float(fst.ip.alpha) == 0.0)
            err_ref = err_now
            if (wedged and best is not None
                    and recoveries < opts.wedge_max_recoveries):
                mu_new = min(opts.mu_init,
                             max(float(best[1].ip.mu) * 100.0, opts.mu_min))
                fst = best[1]._replace(
                    ip=best[1].ip._replace(
                        mu=jnp.asarray(mu_new, best[1].ip.mu.dtype)),
                    S=jnp.zeros_like(best[1].S),
                    Y=jnp.zeros_like(best[1].Y),
                    count=jnp.zeros_like(best[1].count),
                    filt_tb=jnp.full_like(best[1].filt_tb, jnp.inf),
                    filt_pb=jnp.full_like(best[1].filt_pb, jnp.inf),
                    filt_idx=jnp.zeros_like(best[1].filt_idx))
                recoveries += 1
                err_ref = None
                stall_its = 0
                mu_ref = mu_new
                # stop FORCING rungs below the recovered level (natural
                # drops stay allowed) — breaks the force->wedge->recover
                # cycle observed on the demo mission
                mu_force_floor = max(mu_force_floor, mu_new)
            elif wedged:
                # recoveries exhausted and still locked: stop burning
                # chunks; the best-iterate return below reports the best
                break
        if opts.mu_force_after > 0:
            mu_now = float(fst.ip.mu)
            stall_its = stall_its + chunk if mu_now == mu_ref else 0
            mu_ref = mu_now
            # err0 gate as in the host loop: only break a *grinding*
            # subproblem (scaled KKT error already O(1)-small), never a
            # diverging one — forcing rungs at err≈1e4 wedged the demo
            # mission (alpha=0 at mu_min, verify drive r3)
            if (stall_its >= opts.mu_force_after
                    and mu_now > max(opts.mu_min, mu_force_floor)
                    and float(fst.ip.err0) <= 1.0):
                rung = max(opts.mu_min,
                           min(opts.kappa_mu * mu_now,
                               mu_now ** opts.theta_mu))
                fst = fst._replace(
                    ip=fst.ip._replace(
                        mu=jnp.asarray(rung, fst.ip.mu.dtype)),
                    filt_tb=jnp.full_like(fst.filt_tb, jnp.inf),
                    filt_pb=jnp.full_like(fst.filt_pb, jnp.inf),
                    filt_idx=jnp.zeros_like(fst.filt_idx))
                mu_ref = rung
                stall_its = 0
    st = fst.ip
    # exhausted iterations/recoveries with a worse-than-best iterate:
    # report the best chunk-boundary point (mirrors the host loop)
    if (not bool(st.converged) and best is not None
            and (not np.isfinite(float(st.err0))
                 or best[0] < float(st.err0))):
        st = best[1].ip
    final_err = float(st.err0)
    if bool(st.converged) and final_err <= opts.tol:
        status = "optimal"
    elif bool(st.converged) or final_err <= opts.acceptable_tol:
        status = "acceptable"
    else:
        status = "max_iter"
    info = {
        "iterations": int(st.it),
        "converged": status in ("optimal", "acceptable"),
        "acceptable": status == "acceptable",
        "status": status,
        "err": final_err,
        "deadline_hit": deadline_hit,
    }
    return st, info
