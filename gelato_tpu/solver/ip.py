"""Primal-dual interior-point NLP solver, pure JAX, designed for TPU.

Replaces the external pyoptsparse→IPOPT loop of the reference
(/root/reference/Trajectory_Optimization.py:419-462) with an on-device
solver so the entire optimize loop stays on the accelerator:

  minimize f(z)   s.t.  cE(z) = 0,  cI(z) ≥ 0,  l ≤ z ≤ u

* slack variables s > 0 for the inequalities, log-barrier on s and on both
  box-bound gaps, monotone Fiacco-McCormick barrier reduction;
* exact Hessian of the Lagrangian via forward-over-reverse AD — the
  reference's hand-written sparse COO Jacobians and FD blocks
  (lib/jac_fd.py, lib/con_dynamics.py:292-496) are replaced by one jacfwd;
* the inequality block is condensed into the Hessian (mI is small), leaving
  a symmetric (n + mE) KKT system factored densely — batched fp64 LU is the
  dominant per-iteration cost and maps well onto the TPU;
* fraction-to-boundary rule, ℓ1-merit backtracking line search, Levenberg
  inertia regularization adapted across iterations, and primal-dual warm
  start.

The solver is compiled as several independently jitted pieces (residuals +
Jacobians, Hessian, KKT solve + direction, line search, update) orchestrated
by a tiny host loop: one fully fused step sends XLA compile time superlinear,
while the pieces compile in ~2 minutes total and keep all heavy math
on-device.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class IPOptions(NamedTuple):
    tol: float = 1.0e-6
    mu_init: float = 1.0e-1
    mu_min: float = 1.0e-9
    kappa_mu: float = 0.2  # linear barrier reduction factor
    theta_mu: float = 1.5  # superlinear barrier reduction exponent
    kappa_eps: float = 10.0  # barrier subproblem tolerance factor
    tau_min: float = 0.99  # fraction-to-boundary floor
    s_max: float = 100.0  # scaling threshold for the optimality error
    eta: float = 1.0e-4  # Armijo constant
    max_ls: int = 25  # backtracking steps
    delta_w_init: float = 1.0e-8
    delta_w_max: float = 1.0e12
    # Equality-row regularization is 0 by default: a nonzero delta_c leaks
    # delta_c*dyE into the linearized constraint, which with large (legitimate)
    # duals walks the iterate off the constraint manifold.  It is enabled
    # adaptively only while in recovery mode (delta_w > 0).
    delta_c: float = 0.0
    delta_c_fallback: float = 1.0e-12
    bound_relax: float = 1.0e-8
    bound_push: float = 1.0e-2
    slack_min: float = 1.0e-8
    nu_init: float = 1.0  # merit penalty
    kappa_sigma: float = 1.0e10  # dual safeguard box
    max_iter: int = 300


class IPState(NamedTuple):
    z: jnp.ndarray
    s: jnp.ndarray
    yE: jnp.ndarray
    lam: jnp.ndarray
    zL: jnp.ndarray
    zU: jnp.ndarray
    mu: jnp.ndarray
    delta_w: jnp.ndarray
    nu: jnp.ndarray
    err0: jnp.ndarray
    alpha: jnp.ndarray
    it: jnp.ndarray
    converged: jnp.ndarray


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


def init_state(funcs, z0, lb, ub, opts: IPOptions):
    """Initial primal-dual state from a primal guess (bounds pre-relaxed).

    Slacks are floored at O(mu) so near-active inequalities do not spawn
    huge initial multipliers, and the equality multipliers start from the
    least-squares estimate  min ||JE^T y + (∇f - zL + zU)||  (IPOPT's
    mu-independent initialization).
    """
    z = _push_inside(jnp.asarray(z0), lb, ub, opts.bound_push)
    cI = funcs["ineq"](z)
    mu = jnp.asarray(opts.mu_init)
    s = jnp.maximum(cI, jnp.maximum(opts.slack_min, 1.0e-2 * mu))
    lam = mu / s
    zL = mu / (z - lb)
    zU = mu / (ub - z)

    if "obj" in funcs:
        g = jax.grad(funcs["obj"])(z)
        JE = jax.jacfwd(funcs["eq"])(z)
        JI = jax.jacfwd(funcs["ineq"])(z)
        rhs_ls = -(g - JI.T @ lam - zL + zU)
        mE = JE.shape[0]
        gram = JE @ JE.T + 1.0e-8 * jnp.eye(mE)
        yE = jnp.linalg.solve(gram, JE @ rhs_ls)
        # fall back to zero when the estimate is extreme (IPOPT does too)
        yE = jnp.where(jnp.max(jnp.abs(yE), initial=0.0) > 1.0e8,
                       jnp.zeros_like(yE), yE)
        yE = jnp.where(jnp.all(jnp.isfinite(yE)), yE, jnp.zeros_like(yE))
    else:
        mE = funcs["eq"](z).shape[0]
        yE = jnp.zeros(mE)

    return IPState(
        z=z, s=s, yE=yE, lam=lam, zL=zL, zU=zU, mu=mu,
        delta_w=jnp.asarray(0.0), nu=jnp.asarray(opts.nu_init),
        err0=jnp.asarray(jnp.inf), alpha=jnp.asarray(0.0),
        it=jnp.asarray(0), converged=jnp.asarray(False),
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


def make_pieces(funcs, lb, ub, opts: IPOptions):
    """Build the jitted compute pieces over *relaxed* bounds."""
    obj, eq, ineq = funcs["obj"], funcs["eq"], funcs["ineq"]
    grad_f = jax.grad(obj)

    def lagrangian(z, yE, lam):
        return obj(z) + eq(z) @ yE - ineq(z) @ lam

    def eval_point(z):
        return (obj(z), grad_f(z), eq(z), ineq(z),
                jax.jacfwd(eq)(z), jax.jacfwd(ineq)(z))

    eval_hess = jax.jacfwd(jax.grad(lagrangian))

    def direction(st: IPState, g, cE, cI, JE, JI, W, mu):
        z, s = st.z, st.s
        rI = cI - s
        dl = z - lb
        du = ub - z
        sigma_z = st.zL / dl + st.zU / du
        sigma_s = st.lam / s
        n = z.shape[0]
        mE = cE.shape[0]

        H = (W + jnp.diag(sigma_z) + st.delta_w * jnp.eye(n)
             + JI.T @ (sigma_s[:, None] * JI))
        rd = g + JE.T @ st.yE - JI.T @ st.lam - mu / dl + mu / du
        r_cond = JI.T @ ((mu / s - st.lam) - sigma_s * rI)
        rhs = jnp.concatenate([-(rd - r_cond), -cE])

        delta_c = jnp.where(st.delta_w > 0.0, opts.delta_c_fallback, opts.delta_c)
        K = jnp.zeros((n + mE, n + mE))
        K = K.at[:n, :n].set(H)
        K = K.at[:n, n:].set(JE.T)
        K = K.at[n:, :n].set(JE)
        K = K.at[n:, n:].set(-delta_c * jnp.eye(mE))
        sol = jnp.linalg.solve(K, rhs)
        dz, dyE = sol[:n], sol[n:]
        ds = JI @ dz + rI
        dlam = (mu / s - st.lam) - sigma_s * ds
        dzL = mu / dl - st.zL - (st.zL / dl) * dz
        dzU = mu / du - st.zU + (st.zU / du) * dz
        solve_ok = jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dyE))

        tau = jnp.maximum(opts.tau_min, 1.0 - mu)
        alpha_max = jnp.minimum(
            _max_alpha(s, ds, tau),
            jnp.minimum(_max_alpha(dl, dz, tau), _max_alpha(du, -dz, tau)),
        )
        alpha_dual = jnp.minimum(
            _max_alpha(st.lam, dlam, tau),
            jnp.minimum(_max_alpha(st.zL, dzL, tau), _max_alpha(st.zU, dzU, tau)),
        )

        theta = jnp.sum(jnp.abs(cE)) + jnp.sum(jnp.abs(rI))
        # directional derivative of the barrier objective (no penalty term —
        # acceptance follows the Wächter-Biegler either/or rule)
        dphi = (g @ dz
                - mu * (jnp.sum(ds / s) + jnp.sum(dz / dl) - jnp.sum(dz / du)))
        # cheap inertia proxy: the condensed Hessian must have positive
        # curvature along the primal step, else the regularization grows
        curv = dz @ (H @ dz)
        curv_ok = curv > 1.0e-14 * (dz @ dz)
        return dict(dz=dz, dyE=dyE, ds=ds, dlam=dlam, dzL=dzL, dzU=dzU,
                    solve_ok=solve_ok, curv_ok=curv_ok, alpha_max=alpha_max,
                    alpha_dual=alpha_dual, nu=st.nu, dphi=dphi, theta=theta)

    def phi_theta(z, s, mu):
        """Barrier objective and constraint violation at a point."""
        bar = (jnp.sum(jnp.log(s)) + jnp.sum(jnp.log(z - lb))
               + jnp.sum(jnp.log(ub - z)))
        theta = jnp.sum(jnp.abs(eq(z))) + jnp.sum(jnp.abs(ineq(z) - s))
        return obj(z) - mu * bar, theta

    def linesearch(z, s, dz, ds, alpha_max, mu, dphi):
        """Wächter-Biegler-style acceptance (filter logic without memory):

        * Armijo decrease of the barrier objective when the direction is a
          descent direction and the violation is already small, OR
        * sufficient progress in violation or barrier objective otherwise.
        """
        phi0, theta0 = phi_theta(z, s, mu)
        gamma_t = 1.0e-5
        gamma_p = 1.0e-5
        theta_small = 1.0e-8 * jnp.maximum(1.0, theta0)
        switching = (dphi < 0.0) & (theta0 <= 1.0e-6)

        def body(carry):
            alpha, done, best, k = carry
            z_t = z + alpha * alpha_max * dz
            s_t = s + alpha * alpha_max * ds
            phi_t, theta_t = phi_theta(z_t, s_t, mu)
            armijo = ((dphi < 0.0)
                      & (phi_t <= phi0 + opts.eta * alpha * alpha_max * dphi))
            # strict inequalities: with theta0 == 0 progress degenerates to a
            # strict decrease requirement instead of accepting any step
            progress = ((theta_t < (1.0 - gamma_t) * theta0)
                        | (phi_t < phi0 - gamma_p * theta0))
            ok = jnp.isfinite(phi_t) & jnp.isfinite(theta_t) & jnp.where(
                switching, armijo, armijo | progress)
            best = jnp.where(ok & ~done, alpha, best)
            return (alpha * 0.5, done | ok, best, k + 1)

        def cond(carry):
            _, done, _, k = carry
            return (~done) & (k < opts.max_ls)

        _, ok, alpha_rel, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(1.0), jnp.asarray(False), jnp.asarray(0.0),
             jnp.asarray(0)))
        return ok, alpha_rel

    def apply_step(st: IPState, d, alpha, accept, mu, err0):
        z_new = st.z + alpha * d["dz"]
        s_new = jnp.maximum(st.s + alpha * d["ds"], 1e-300)
        # duals take the full fraction-to-boundary-limited step when accepted
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

        delta_w = jnp.where(
            accept,
            jnp.where(st.delta_w > opts.delta_w_init, st.delta_w / 3.0, 0.0),
            jnp.maximum(opts.delta_w_init, st.delta_w * 10.0),
        )
        delta_w = jnp.minimum(delta_w, opts.delta_w_max)

        return IPState(
            z=jnp.where(accept, z_new, st.z),
            s=jnp.where(accept, s_new, st.s),
            yE=jnp.where(accept, yE_new, st.yE),
            lam=jnp.where(accept, lam_new, st.lam),
            zL=jnp.where(accept, zL_new, st.zL),
            zU=jnp.where(accept, zU_new, st.zU),
            mu=mu, delta_w=delta_w, nu=d["nu"], err0=err0,
            alpha=jnp.where(accept, alpha, 0.0), it=st.it + 1,
            converged=err0 <= opts.tol,
        )

    def errors(st: IPState, g, cE, cI, JE, JI):
        return _kkt_errors(g, JE, JI, cE, cI - st.s, st, lb, ub, st.mu, opts)

    raw = dict(eval_point=eval_point, eval_hess=eval_hess,
               direction=direction, linesearch=linesearch,
               apply_step=apply_step, errors=errors)
    pieces = {k: jax.jit(v) for k, v in raw.items()}
    pieces["raw"] = raw
    return pieces


def ip_iterate(pieces, st: IPState, opts: IPOptions):
    """One IP iteration, orchestrated on host (all math on device)."""
    f, g, cE, cI, JE, JI = pieces["eval_point"](st.z)
    err_mu, err0 = pieces["errors"](st, g, cE, cI, JE, JI)

    # monotone Fiacco-McCormick barrier update (host scalar logic)
    mu = float(st.mu)
    if float(err_mu) <= opts.kappa_eps * mu:
        mu = max(opts.mu_min, min(opts.kappa_mu * mu, mu ** opts.theta_mu))
    mu_j = jnp.asarray(mu)
    st = st._replace(mu=mu_j)

    W = pieces["eval_hess"](st.z, st.yE, st.lam)

    # within-iteration inertia correction: retry the (cheap) KKT solve with
    # growing Hessian regularization until the direction has positive
    # curvature and the line search accepts (IPOPT algorithm IC)
    delta = float(st.delta_w)
    accept, alpha, d = False, 0.0, None
    for _ in range(15):
        st_try = st._replace(delta_w=jnp.asarray(delta))
        d = pieces["direction"](st_try, g, cE, cI, JE, JI, W, mu_j)
        if bool(d["solve_ok"]) and bool(d["curv_ok"]):
            ls_ok, alpha_rel = pieces["linesearch"](
                st.z, st.s, d["dz"], d["ds"], d["alpha_max"], mu_j, d["dphi"])
            if bool(ls_ok):
                accept = True
                alpha = float(alpha_rel) * float(d["alpha_max"])
                break
        delta = opts.delta_w_init if delta == 0.0 else delta * 10.0
        if delta > opts.delta_w_max:
            break

    st = st._replace(delta_w=jnp.asarray(delta))
    st = pieces["apply_step"](st, d, jnp.asarray(alpha),
                              jnp.asarray(accept), mu_j, err0)
    return st


def solve(problem_funcs, z0, lb, ub, opts: IPOptions = IPOptions(),
          callback=None, warm=None):
    """Host-driven solve (single problem).  Returns (state, info)."""
    from .warm_start import apply_warm

    lbr, ubr = relaxed_bounds(lb, ub, opts)
    pieces = make_pieces(problem_funcs, lbr, ubr, opts)
    st = init_state(problem_funcs, z0, lbr, ubr, opts)
    st = apply_warm(st, warm)
    history = []
    for k in range(opts.max_iter):
        st = ip_iterate(pieces, st, opts)
        if callback is not None:
            callback(k, st)
        history.append((float(st.err0), float(st.mu), float(st.alpha)))
        if bool(st.converged):
            break
    info = {
        "iterations": int(st.it),
        "converged": bool(st.converged),
        "err": float(st.err0),
        "history": history,
    }
    return st, info


def make_fused_step(funcs, lb, ub, opts: IPOptions = IPOptions()):
    """Fully on-device single-iteration step (vmappable, for batched solves).

    Same math as :func:`ip_iterate` but with the barrier update and
    accept/reject logic expressed as device ops, so a whole dispersion batch
    advances in lock-step under one ``vmap`` (each lane carries its own mu,
    regularization, and convergence flag; converged lanes become no-ops).
    """
    lbr, ubr = relaxed_bounds(lb, ub, opts)
    raw = make_pieces(funcs, lbr, ubr, opts)["raw"]

    def step(st: IPState) -> IPState:
        f, g, cE, cI, JE, JI = raw["eval_point"](st.z)
        err_mu, err0 = raw["errors"](st, g, cE, cI, JE, JI)
        mu = jnp.where(
            err_mu <= opts.kappa_eps * st.mu,
            jnp.maximum(opts.mu_min,
                        jnp.minimum(opts.kappa_mu * st.mu,
                                    st.mu ** opts.theta_mu)),
            st.mu,
        )
        st = st._replace(mu=mu)
        W = raw["eval_hess"](st.z, st.yE, st.lam)
        d = raw["direction"](st, g, cE, cI, JE, JI, W, mu)
        ls_ok, alpha_rel = raw["linesearch"](
            st.z, st.s, d["dz"], d["ds"], d["alpha_max"], mu, d["dphi"])
        accept = d["solve_ok"] & d["curv_ok"] & ls_ok
        alpha = jnp.where(accept, alpha_rel * d["alpha_max"], 0.0)
        new = raw["apply_step"](st, d, alpha, accept, mu, err0)
        # converged lanes freeze (keeps vmapped batches running cheaply)
        frozen = st.converged
        return jax.tree.map(
            lambda a, b: jnp.where(frozen, a, b), st._replace(it=st.it + 1), new)

    def state0(z0):
        return init_state(funcs, z0, lbr, ubr, opts)

    return step, state0
