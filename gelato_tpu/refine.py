"""h-refinement: error-driven per-section node-count updates between solves.

The reference takes ``num_nodes`` as fixed user input
(/root/reference/example/example-events.csv:1, the ``num_nodes`` column) and
has no mesh refinement; accuracy scaling is purely manual.  This module
closes that gap (SURVEY.md §5 "long-context" analogue) with the standard
pseudospectral h-refinement loop:

1. solve on the current mesh;
2. estimate the per-section discretization error by evaluating the dynamics
   defect of the collocation *interpolant* at non-collocation check points
   (midpoints between support nodes) — at the collocation nodes the defect
   is ~0 by construction, so any residual in between is interpolation error;
3. multiply the node count of every section whose error exceeds the
   tolerance; re-seed the refined problem by barycentric interpolation of
   the previous solution; re-solve.

All per-section work runs on padded stacks; the estimator itself is a
handful of host-side matrix products plus one jitted dynamics evaluation
(eager per-op dispatch over the remote-TPU tunnel costs ~30 ms/op, so the
hot part is a single jitted call).
"""

import numpy as np

import jax
import jax.numpy as jnp

from .transcription.lgr import lgr_nodes, _barycentric_weights


def lagrange_interp_matrix(x_support, x_eval):
    """L[k, i] = L_i(x_eval[k]) via the barycentric second form (stable)."""
    x_support = np.asarray(x_support, dtype=float)
    x_eval = np.asarray(x_eval, dtype=float)
    w = _barycentric_weights(x_support)
    dx = x_eval[:, None] - x_support[None, :]
    exact = np.isclose(dx, 0.0, atol=1e-14)
    dx = np.where(exact, 1.0, dx)
    terms = w[None, :] / dx
    L = terms / terms.sum(axis=1, keepdims=True)
    # evaluation points that coincide with support points pick them exactly
    hit = exact.any(axis=1)
    L[hit] = exact[hit].astype(float)
    return L


def section_defect_errors(problem, z, case=None):
    """Max dynamics-defect error of the interpolant per section, [S].

    Mirrors the residual scaling of Problem.eq_constraint_groups (so the
    numbers are comparable to the solver's feasibility tolerance), evaluated
    at the midpoints between state-support nodes instead of the collocation
    nodes.  dX/dτ at the check points interpolates the degree-(n−1)
    polynomial D·X from the collocation nodes — exact, no new derivatives.
    """
    from .dynamics import acceleration_eci, quaternion_rate

    v = problem.unpack(jnp.asarray(z))
    un = problem.units
    t_x, dt = problem._time_grids(v.t)
    half_dt = np.asarray(dt) * un.t / 2.0
    wind, ca = problem._case_tables(case)

    errors = np.zeros(problem.S)
    for i in range(problem.S):
        n = problem.ps.num_nodes[i]
        tau_col = lgr_nodes(n)
        support = np.concatenate(([-1.0], tau_col))
        # midpoints between consecutive support points: never collocated
        chk = 0.5 * (support[:-1] + support[1:])
        Lx = jnp.asarray(lagrange_interp_matrix(support, chk))
        Ld = jnp.asarray(lagrange_interp_matrix(tau_col, chk))
        Lu = Ld

        sl = slice(0, n + 1)
        X_m = v.mass_s[i, sl]
        X_p = v.pos_s[i, sl]
        X_v = v.vel_s[i, sl]
        X_q = v.quat_s[i, sl]
        U = v.u_s[i, :n]
        D = jnp.asarray(problem.ps.D[i, :n, : n + 1])

        to, tf = v.t[i], v.t[i + 1]
        t_chk = (0.5 * (tf - to) * jnp.asarray(chk)
                 + 0.5 * (tf + to)) * un.t

        @jax.jit
        def defect(X_m, X_p, X_v, X_q, U, t_chk):
            m_c = Lx @ X_m
            p_c = Lx @ X_p
            v_c = Lx @ X_v
            q_c = Lx @ X_q
            u_c = Lu @ U
            # dX/dτ at check points (interpolated from collocation values)
            dm = Ld @ (D @ X_m)
            dp = Ld @ (D @ X_p)
            dv = Ld @ (D @ X_v)
            dq = Ld @ (D @ X_q)
            acc = acceleration_eci(
                m_c * un.mass, p_c * un.position, v_c * un.velocity, q_c,
                t_chk, problem.sec_thrust[i], problem.sec_air_area[i],
                problem.sec_nozzle[i], wind, ca) / un.velocity
            qrate = quaternion_rate(q_c, u_c * un.u)
            h = half_dt[i]
            r_m = jnp.where(problem.sec_engine_on[i],
                            dm + problem.sec_massflow[i] / un.mass * h, dm)
            r_p = dp - v_c * (un.velocity / un.position) * h
            r_v = dv - acc * h
            r_q = jnp.where(problem.att_hold[i], dq, dq - qrate * h)
            return jnp.maximum(
                jnp.max(jnp.abs(r_m)),
                jnp.maximum(jnp.max(jnp.abs(r_p)),
                            jnp.maximum(jnp.max(jnp.abs(r_v)),
                                        jnp.max(jnp.abs(r_q)))))

        errors[i] = float(defect(X_m, X_p, X_v, X_q, U, t_chk))
    return errors


def refine_num_nodes(num_nodes, errors, tol=1e-6, factor=2, cap=64):
    """Next mesh: multiply sections whose defect error exceeds ``tol``."""
    return np.array([
        min(cap, int(n) * factor) if e > tol else int(n)
        for n, e in zip(num_nodes, errors)
    ], dtype=int)


def interp_solution(problem_old, z_old, problem_new):
    """Seed for the refined problem: barycentric interpolation of states and
    controls per section onto the new node grids (knot times copied) — the
    in-memory analogue of the reference's "Initial trajectory file" restart
    (Trajectory_Optimization.py:179-187)."""
    v = problem_old.unpack(jnp.asarray(z_old))
    mass = np.zeros(problem_new.M)
    pos = np.zeros((problem_new.M, 3))
    vel = np.zeros((problem_new.M, 3))
    quat = np.zeros((problem_new.M, 4))
    u = np.zeros((problem_new.N, 2))
    for i in range(problem_old.S):
        n_o = problem_old.ps.num_nodes[i]
        n_n = problem_new.ps.num_nodes[i]
        sup_o = np.concatenate(([-1.0], lgr_nodes(n_o)))
        col_o = lgr_nodes(n_o)
        sup_n = np.concatenate(([-1.0], lgr_nodes(n_n)))
        col_n = lgr_nodes(n_n)
        Lx = lagrange_interp_matrix(sup_o, sup_n)
        Lu = lagrange_interp_matrix(col_o, col_n)
        _, _, xa_o, xb_o, _ = problem_old.ps.get_index(i)
        ua_o, ub_o = problem_old.ps.get_index(i)[:2]
        ua_n, ub_n, xa_n, xb_n, _ = problem_new.ps.get_index(i)
        mass[xa_n:xb_n] = Lx @ np.asarray(v.mass[xa_o:xb_o])
        pos[xa_n:xb_n] = Lx @ np.asarray(v.pos[xa_o:xb_o])
        vel[xa_n:xb_n] = Lx @ np.asarray(v.vel[xa_o:xb_o])
        # NOT renormalized: the NLP does not constrain |q| = 1 (neither does
        # the reference), so forcing it would *change* the converged solution
        # and break the knot-continuity rows of the transferred iterate
        quat[xa_n:xb_n] = Lx @ np.asarray(v.quat[xa_o:xb_o])
        u[ua_n:ub_n] = Lu @ np.asarray(v.u[ua_o:ub_o])
    t = np.asarray(v.t)
    return np.asarray(problem_new.pack(mass, pos, vel, quat, u, t))


def h_refine(mission, tol=1e-7, max_rounds=3, factor=2, cap=64,
             solve_opts=None, warm_z=None, chunk=40, verbose=True,
             structured=True):
    """Iterated solve → estimate → refine loop.  Returns a per-round report
    list of dicts (num_nodes, payload, defect errors, iterations)."""
    from .problem import Problem
    from .solver import solve_device, IPOptions
    from . import initial_guess as ig

    opts = solve_opts or IPOptions(max_iter=2000, mu_init=1e-3)
    report = []
    problem = Problem(mission)
    z = warm_z if warm_z is not None else np.asarray(ig.initial_guess(problem))
    for rnd in range(max_rounds):
        funcs = problem.solver_funcs(
            structured=structured and opts.kkt_method == "struct", z0=z)
        lb, ub = problem.bounds()
        st, info = solve_device(funcs, z, lb, ub, opts, chunk=chunk)
        z = np.asarray(st.z)
        errors = section_defect_errors(problem, z)
        drop = sum(
            i["mass"] for stg in problem.mission.stages.values()
            for i in (stg.get("dropMass") or {}).values())
        payload = float(st.z[0]) * problem.units.mass - mission.m_init - drop
        entry = dict(round=rnd,
                     num_nodes=[int(n) for n in problem.ps.num_nodes],
                     payload_kg=payload, defect_errors=errors.tolist(),
                     iterations=info["iterations"],
                     converged=info["converged"])
        report.append(entry)
        if verbose:
            print(f"h-refine round {rnd}: nodes={entry['num_nodes']} "
                  f"payload={payload:.2f} kg "
                  f"max defect={errors.max():.3e} it={info['iterations']}")
        new_nodes = refine_num_nodes(problem.ps.num_nodes, errors, tol,
                                     factor, cap)
        if (new_nodes == np.asarray(problem.ps.num_nodes)).all():
            break
        nn = np.append(new_nodes, mission.events.num_nodes[-1])
        mission.events.num_nodes = nn
        new_problem = Problem(mission)
        z = interp_solution(problem, z, new_problem)
        problem = new_problem
    return report
