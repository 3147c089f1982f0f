"""Interior-point solver tests on analytic problems with known solutions."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import solve, IPOptions  # noqa: E402


def _run(funcs, z0, lb, ub, **kw):
    st, info = solve(funcs, np.asarray(z0, dtype=float),
                     np.asarray(lb, dtype=float), np.asarray(ub, dtype=float),
                     IPOptions(**kw))
    return np.asarray(st.z), info


class TestIPSolver:
    def test_equality_qp(self):
        """min (x-2)²+(y-1)² s.t. x+y=2, x≥y  → (1.5, 0.5), inactive ineq."""
        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        z, info = _run(funcs, [0.5, 0.5], [0, 0], [5, 5])
        assert info["converged"]
        np.testing.assert_allclose(z, [1.5, 0.5], atol=1e-6)

    def test_constrained_rosenbrock(self):
        """Rosenbrock restricted to the unit disc: known active solution."""
        funcs = dict(
            obj=lambda z: (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2,
            eq=lambda z: jnp.zeros(0),
            ineq=lambda z: jnp.asarray([1.0 - z[0] ** 2 - z[1] ** 2]),
        )
        z, info = _run(funcs, [-0.5, 0.5], [-2, -2], [2, 2])
        assert info["converged"]
        np.testing.assert_allclose(z, [0.7864, 0.6177], atol=1e-3)

    def test_equality_pinned_at_bound(self):
        """Equality forces a variable exactly onto its lower bound (the t0=0
        pattern of the trajectory problem)."""
        funcs = dict(
            obj=lambda z: z[1] ** 2 + z[0],
            eq=lambda z: jnp.asarray([z[0]]),
            ineq=lambda z: jnp.zeros(0),
        )
        z, info = _run(funcs, [0.5, 1.0], [0, 0], [1.5, 1.5])
        assert info["converged"]
        assert abs(z[0]) < 1e-6
        assert abs(z[1]) < 1e-2  # degenerate bound minimum: O(sqrt(mu_min))

    def test_nonconvex_needs_regularization(self):
        """Concave objective: inertia correction must kick in."""
        funcs = dict(
            obj=lambda z: -z[0] ** 2,
            eq=lambda z: jnp.zeros(0),
            ineq=lambda z: jnp.asarray([1.0 - z[0], 1.0 + z[0]]),
        )
        z, info = _run(funcs, [0.3], [-5], [5])
        assert info["converged"]
        np.testing.assert_allclose(abs(z[0]), 1.0, atol=1e-6)

    def test_warm_start_roundtrip(self, tmp_path):
        from gelato_tpu.solver.warm_start import save_state, load_state

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        st, info = solve(funcs, np.array([0.5, 0.5]), np.zeros(2),
                         np.full(2, 5.0))
        path = str(tmp_path / "state.npz")
        save_state(path, st)
        warm = load_state(path)
        st2, info2 = solve(funcs, np.array([0.5, 0.5]), np.zeros(2),
                           np.full(2, 5.0), warm=warm)
        # warm start resumes at the solution: immediate convergence
        assert info2["iterations"] <= 2
        np.testing.assert_allclose(np.asarray(st2.z), [1.5, 0.5], atol=1e-6)

    def test_push_warm_recentering(self, tmp_path):
        """push_warm re-centers the duals to the working barrier: s floored,
        lam = mu/s (complementarity exactly mu on every row), bound duals
        boxed, primal untouched — the hygiene for warm starts onto
        *perturbed* problem data (IPOPT's warm_start_*push analogue)."""
        from gelato_tpu.solver.warm_start import (save_state, load_state,
                                                  push_warm)

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        st, _ = solve(funcs, np.array([0.5, 0.5]), np.zeros(2),
                      np.full(2, 5.0))
        path = str(tmp_path / "state.npz")
        save_state(path, st)
        warm = load_state(path)
        mu = 1.0e-4
        pushed = push_warm(warm, mu=mu)
        np.testing.assert_array_equal(pushed["z"], warm["z"])
        assert float(pushed["mu"]) == mu
        assert np.all(pushed["s"] >= 1.0e-6)
        np.testing.assert_allclose(pushed["s"] * pushed["lam"], mu,
                                   rtol=1e-12)
        for k in ("zL", "zU"):
            assert np.all(pushed[k] >= 1.0e-8)
            assert np.all(pushed[k] <= 1.0e8)
        # a pushed state still re-converges on the same problem
        st2, info2 = solve(funcs, np.array([0.5, 0.5]), np.zeros(2),
                           np.full(2, 5.0), warm=pushed)
        assert info2["converged"]
        np.testing.assert_allclose(np.asarray(st2.z), [1.5, 0.5], atol=1e-6)


class TestFusedStep:
    def test_fused_matches_host_driver(self):
        """make_fused_step advances like ip_iterate on the easy QP."""
        from gelato_tpu.solver.ip import make_fused_step

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        step, state0 = make_fused_step(funcs, np.zeros(2), np.full(2, 5.0))
        fst = state0(jnp.asarray([0.5, 0.5]))
        for _ in range(40):
            fst = step(fst)
        assert bool(fst.ip.converged)
        np.testing.assert_allclose(np.asarray(fst.ip.z), [1.5, 0.5], atol=1e-6)

    def test_vmapped_batch(self):
        from gelato_tpu.solver.ip import make_fused_step

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        step, state0 = make_fused_step(funcs, np.zeros(2), np.full(2, 5.0))
        z0s = jnp.asarray([[0.5, 0.5], [1.0, 0.2], [0.1, 1.4], [2.0, 2.0]])
        states = jax.vmap(state0)(z0s)
        vstep = jax.jit(jax.vmap(step))
        for _ in range(40):
            states = vstep(states)
        assert bool(jnp.all(states.ip.converged))
        np.testing.assert_allclose(
            np.asarray(states.ip.z), np.tile([1.5, 0.5], (4, 1)), atol=1e-6)


class TestMuWatchdog:
    def test_forced_drop_breaks_a_stalled_rung(self):
        """mu_force_after forces a barrier rung once primal-feasible.

        Directly exercises ip_iterate's force_mu_drop on a state whose
        subproblem error is far above kappa_eps*mu (the trigger that
        otherwise gates every rung): forced, mu must drop one rung;
        unforced, it must stay.
        """
        from gelato_tpu.solver.ip import (ip_iterate, init_state,
                                          make_pieces, relaxed_bounds,
                                          Filter, LBFGSHessian)

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-3)
        lbr, ubr = relaxed_bounds(lb, ub, opts)
        pieces = make_pieces(funcs, lbr, ubr, opts)
        # start far from the optimum so the subproblem error is large and
        # the regular trigger err_mu <= kappa_eps*mu cannot fire
        st = init_state(funcs, np.array([4.5, 0.25]), lbr, ubr, opts)
        filt = Filter(1.0)
        lbfgs = LBFGSHessian(2, 5)

        mu0 = float(st.mu)
        st_unforced = ip_iterate(pieces, st, opts, filt, lbfgs)
        st_forced = ip_iterate(pieces, st, opts, Filter(1.0),
                               LBFGSHessian(2, 5), force_mu_drop=True)
        assert float(st_unforced.mu) == mu0
        assert float(st_forced.mu) < mu0

    def test_watchdog_solve_matches_baseline(self):
        """With the watchdog on, the QP still converges to the same point."""
        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        z, info = _run(funcs, [0.5, 0.5], [0, 0], [5, 5], mu_force_after=5)
        assert info["converged"]
        np.testing.assert_allclose(z, [1.5, 0.5], atol=1e-6)

    def test_device_loop_watchdog_forces_rungs(self):
        """solve_device's chunk-boundary watchdog edits the carried state.

        A fake prebuilt loop whose run_chunk is the identity simulates a
        permanently stalled solve: mu never moves on device, so the host
        watchdog alone must walk it down the monotone ladder, resetting the
        filter each time, without ever touching the compiled step.
        """
        from gelato_tpu.solver.ip import (make_fused_step, solve_device,
                                          relaxed_bounds)

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-2, mu_force_after=10, max_iter=30)
        _, state0 = make_fused_step(funcs, lb, ub, opts)
        seen = []

        def frozen_chunk(fst, aux):
            seen.append(float(fst.ip.mu))
            # stalled but *grinding*: scaled KKT error already small (so the
            # watchdog's err0<=1 safety gate lets the force through) and
            # steps ARE being accepted (alpha>0 — an alpha=0 chunk with
            # bit-identical err is a WEDGE and triggers recovery instead)
            return fst._replace(ip=fst.ip._replace(
                err0=jnp.asarray(1e-3, fst.ip.err0.dtype),
                alpha=jnp.asarray(0.5, fst.ip.alpha.dtype)))

        st, info = solve_device(funcs, np.array([4.0, 0.5]), lb, ub, opts,
                                chunk=10, prebuilt=(frozen_chunk, state0))
        # 3 chunks of 10 its; watchdog fires after each stalled chunk:
        # chunk0 sees mu_init, chunks 1-2 see successively forced rungs
        assert len(seen) == 3
        assert seen[0] == pytest.approx(1e-2)
        assert seen[1] < seen[0] and seen[2] < seen[1]
        rung0 = max(opts.mu_min, min(opts.kappa_mu * 1e-2,
                                     1e-2 ** opts.theta_mu))
        assert seen[1] == pytest.approx(rung0)

    def test_device_loop_watchdog_blocked_while_diverging(self):
        """The err0<=1 gate: a stalled-but-diverging state is left alone
        (forcing rungs under divergence wedged the demo mission)."""
        from gelato_tpu.solver.ip import make_fused_step, solve_device

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-2, mu_force_after=10, max_iter=30)
        _, state0 = make_fused_step(funcs, lb, ub, opts)
        seen = []

        def diverging_chunk(fst, aux):
            seen.append(float(fst.ip.mu))
            return fst._replace(ip=fst.ip._replace(
                err0=jnp.asarray(1e4, fst.ip.err0.dtype)))

        solve_device(funcs, np.array([4.0, 0.5]), lb, ub, opts,
                     chunk=10, prebuilt=(diverging_chunk, state0))
        assert seen == [pytest.approx(1e-2)] * 3

    def test_device_loop_wedge_recovery_restores_best(self):
        """An exploding/wedged chunk sequence is rolled back to the best
        chunk-boundary state with the barrier raised two rungs, and the
        returned state is never worse than the best seen (the demo-mission
        wedge: alpha=0 at err 3.4e6 spun 1400 dead iterations pre-fix)."""
        from gelato_tpu.solver.ip import make_fused_step, solve_device

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-2, max_iter=40, wedge_recover_after=1)
        _, state0 = make_fused_step(funcs, lb, ub, opts)
        entries = []

        def scripted_chunk(fst, aux):
            k = len(entries)
            entries.append((float(fst.ip.mu), float(fst.ip.err0)))
            if k == 0:  # good chunk: becomes `best`
                return fst._replace(ip=fst.ip._replace(
                    err0=jnp.asarray(0.5, fst.ip.err0.dtype),
                    alpha=jnp.asarray(0.5, fst.ip.alpha.dtype),
                    mu=jnp.asarray(1e-6, fst.ip.mu.dtype)))
            # every later chunk explodes (the wedge signature)
            return fst._replace(ip=fst.ip._replace(
                err0=jnp.asarray(3e6, fst.ip.err0.dtype),
                alpha=jnp.asarray(0.0, fst.ip.alpha.dtype)))

        st, info = solve_device(funcs, np.array([4.0, 0.5]), lb, ub, opts,
                                chunk=10, prebuilt=(scripted_chunk, state0))
        # the wedge needs two identical bad chunk boundaries (bit-identical
        # err + alpha=0) to trigger; chunk 3 must then see the restored best
        # (err 0.5) with mu raised two rungs from best's 1e-6
        assert entries[3][0] == pytest.approx(1e-4)
        assert entries[3][1] == pytest.approx(0.5)
        # the final reported state is the best seen, not the exploded one
        assert float(st.err0) == pytest.approx(0.5)
        assert not info["converged"]

    def test_device_loop_wedge_recovery_bounded(self):
        """Recoveries stop after wedge_max_recoveries — no infinite
        restore loop on a permanently exploding solve."""
        from gelato_tpu.solver.ip import make_fused_step, solve_device

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-2, max_iter=100, wedge_recover_after=1,
                         wedge_max_recoveries=2)
        _, state0 = make_fused_step(funcs, lb, ub, opts)
        n_good = []

        def scripted_chunk(fst, aux):
            good = float(fst.ip.err0) < 1.0  # restored-from-best entry
            n_good.append(good)
            if len(n_good) == 1:
                return fst._replace(ip=fst.ip._replace(
                    err0=jnp.asarray(0.5, fst.ip.err0.dtype),
                    alpha=jnp.asarray(0.5, fst.ip.alpha.dtype),
                    mu=jnp.asarray(1e-6, fst.ip.mu.dtype)))
            return fst._replace(ip=fst.ip._replace(
                err0=jnp.asarray(3e6, fst.ip.err0.dtype),
                alpha=jnp.asarray(0.0, fst.ip.alpha.dtype)))

        st, _ = solve_device(funcs, np.array([4.0, 0.5]), lb, ub, opts,
                             chunk=10, prebuilt=(scripted_chunk, state0))
        # entry 1 sees chunk 0's natural good state; the 2 allowed
        # recoveries then produce exactly 2 restored-from-best entries
        assert sum(n_good[2:]) == 2
        assert float(st.err0) == pytest.approx(0.5)

    def test_device_loop_watchdog_off_by_default(self):
        """mu_force_after=0 leaves a grinding state's barrier strictly
        alone (steps being accepted, so no wedge recovery either)."""
        from gelato_tpu.solver.ip import make_fused_step, solve_device

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-2, max_iter=30)
        _, state0 = make_fused_step(funcs, lb, ub, opts)
        seen = []

        def grinding_chunk(fst, aux):
            seen.append(float(fst.ip.mu))
            return fst._replace(ip=fst.ip._replace(
                err0=jnp.asarray(5.0, fst.ip.err0.dtype),
                alpha=jnp.asarray(0.5, fst.ip.alpha.dtype)))

        solve_device(funcs, np.array([4.0, 0.5]), lb, ub, opts,
                     chunk=10, prebuilt=(grinding_chunk, state0))
        assert seen == [pytest.approx(1e-2)] * 3

    def test_device_loop_dead_solve_stops_early(self):
        """A solve whose error is never finite and that accepts nothing
        (alpha=0, bit-identical state across chunks) is cut short instead
        of burning the full chunk budget."""
        from gelato_tpu.solver.ip import make_fused_step, solve_device

        funcs = dict(
            obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2,
            eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
            ineq=lambda z: jnp.asarray([z[0] - z[1]]),
        )
        lb, ub = np.zeros(2), np.full(2, 5.0)
        opts = IPOptions(mu_init=1e-2, max_iter=100)
        _, state0 = make_fused_step(funcs, lb, ub, opts)
        seen = []

        def dead_chunk(fst, aux):
            seen.append(float(fst.ip.mu))
            return fst  # err0 stays inf, alpha stays 0

        _, info = solve_device(funcs, np.array([4.0, 0.5]), lb, ub, opts,
                               chunk=10, prebuilt=(dead_chunk, state0))
        assert len(seen) < 10
        assert not info["converged"]
