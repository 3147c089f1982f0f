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
