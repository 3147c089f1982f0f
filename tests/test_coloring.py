"""Colored (compressed) Jacobian tests: exactness vs dense jacfwd and the
expected compression on the section-block-sparse trajectory NLP."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import coloring  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"

# >30 s on the 1-vCPU host (measured: per-file timing, PERF.md round 4)
pytestmark = pytest.mark.slow


def test_greedy_color_valid_on_random_pattern():
    rng = np.random.default_rng(0)
    pattern = rng.random((40, 30)) < 0.15
    color = coloring.greedy_color(pattern)
    # validity: columns sharing a row never share a color
    for r in range(pattern.shape[0]):
        cols = np.nonzero(pattern[r])[0]
        assert len(set(color[cols].tolist())) == len(cols)


def test_colored_matches_dense_on_synthetic():
    def fn(z, aux=()):
        # banded nonlinear map: row i touches cols i-1, i, i+1
        zp = jnp.pad(z, 1)
        return zp[:-2] * z + jnp.sin(zp[2:]) - z ** 2

    z0 = np.linspace(0.3, 1.2, 12)
    jac, info = coloring.colored_jacobian(fn, z0)
    # tridiagonal needs 3 seeds; the greedy density-first order may use 4
    assert info["n_colors"] <= 4
    z = jnp.asarray(z0 + 0.1)
    J_dense = jax.jacfwd(lambda w: fn(w, ()))(z)
    np.testing.assert_allclose(np.asarray(jac(z, ())), np.asarray(J_dense),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(not os.path.exists(SETTINGS), reason="no reference data")
def test_colored_matches_dense_on_trajectory_problem():
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig

    mission = load_mission(SETTINGS)
    # reduced mesh keeps the dense comparison fast; structure is identical
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 3)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem, dt=1.0))
    funcs = problem.solver_funcs(colored=True, z0=z0)
    info = funcs["coloring_info"]
    # compression: far fewer seeds than variables (section-block sparsity)
    assert info["eq"]["n_colors"] < problem.n_z / 2, info

    rng = np.random.default_rng(3)
    z = jnp.asarray(z0 * (1.0 + 1e-4 * rng.normal(size=z0.shape)))
    for key, fn in (("jac_eq", funcs["eq"]), ("jac_ineq", funcs["ineq"])):
        J_c = np.asarray(funcs[key](z, ()))
        J_d = np.asarray(jax.jacfwd(lambda w: fn(w, ()))(z))
        np.testing.assert_allclose(J_c, J_d, rtol=1e-9, atol=1e-12,
                                   err_msg=key)


@pytest.mark.skipif(not os.path.exists(SETTINGS), reason="no reference data")
def test_colored_solve_matches_dense_solve():
    """A few IP iterations with compressed Jacobians reproduce the dense
    iterates (the solver is agnostic to how J is computed)."""
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig
    from gelato_tpu.solver import solve, IPOptions

    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem, dt=2.0))
    lb, ub = problem.bounds()
    opts = IPOptions(max_iter=5, mu_init=1e-3)

    st_d, info_d = solve(problem.solver_funcs(), z0, lb, ub, opts)
    st_c, info_c = solve(problem.solver_funcs(colored=True, z0=z0), z0, lb,
                         ub, opts)
    # the KKT systems are ill-conditioned enough that last-bit Jacobian
    # rounding differences amplify over iterations (same behavior as
    # run-to-run reduction-order noise), so assert matching *progress*, not
    # bitwise iterates
    np.testing.assert_allclose(np.asarray(st_c.z), np.asarray(st_d.z),
                               atol=1e-2)
    assert info_c["err"] < 3.0 * info_d["err"] + 1e-8
