"""End-to-end solve tests (slow; enabled with GELATO_RUN_SLOW=1)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

SLOW = os.environ.get("GELATO_RUN_SLOW", "") == "1"
SETTINGS = "/root/reference/example/example-settings.json"


@pytest.mark.skipif(not SLOW, reason="set GELATO_RUN_SLOW=1 to run")
@pytest.mark.skipif(not os.path.exists(SETTINGS), reason="no reference data")
class TestEndToEnd:
    def test_example_solves_to_acceptable(self):
        from gelato_tpu.config import load_mission
        from gelato_tpu.problem import Problem
        from gelato_tpu import initial_guess as ig
        from gelato_tpu.solver import solve, IPOptions

        problem = Problem(load_mission(SETTINGS))
        z0 = ig.initial_guess(problem)
        funcs = {"obj": problem.objective, "eq": problem.eq_constraints,
                 "ineq": problem.ineq_constraints}
        lb, ub = problem.bounds()
        st, info = solve(funcs, z0, lb, ub,
                         IPOptions(max_iter=2000, mu_init=1e-3))
        assert info["converged"]
        # payload within the expected band for this configuration
        payload = float(st.z[0]) * problem.units.mass - problem.mission.m_init - 140.0
        assert 180.0 < payload < 320.0
        # feasibility at the acceptable level
        ce = np.asarray(problem.eq_constraints(st.z))
        assert np.abs(ce).max() < 5e-4
