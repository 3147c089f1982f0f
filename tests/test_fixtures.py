"""Warm-state fixture validity (VERDICT r3 weak #8).

``tests/data/example_full_solved.npz`` is load-bearing far beyond the test
suite: the multichip dryrun (``__graft_entry__.dryrun_multichip``) and the
dispersion-batch bench warm-start every lane from it, and both *silently
fall back to a cold start* when the stored state no longer matches the
current problem — a cold dryrun then times out the driver artifact
(round-3 rc=124 pathology).  The tiny2/demo fixtures are already guarded by
the e2e re-convergence tests; this file guards the full-mesh state the same
way but cheaply: shape match + near-feasibility + bound/dual sanity at the
stored point, with no solve.

Regenerate with ``python -m gelato_tpu.run <example-settings> --cpu
--save-state tests/data/example_full_solved.npz`` after solver changes.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"
STATE = os.path.join(os.path.dirname(__file__), "data",
                     "example_full_solved.npz")

pytestmark = [
    pytest.mark.skipif(not os.path.exists(SETTINGS),
                       reason="no reference data"),
    pytest.mark.skipif(not os.path.exists(STATE),
                       reason="full warm state not built"),
]


@pytest.fixture(scope="module")
def problem():
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem

    return Problem(load_mission(SETTINGS))


@pytest.fixture(scope="module")
def warm():
    from gelato_tpu.solver.warm_start import load_state

    return load_state(STATE)


def test_state_loads_and_matches_problem_shapes(problem, warm):
    """The exact check the dryrun/bench make before warm-starting: a shape
    mismatch there silently degrades to a cold start (the rc=124 path)."""
    assert warm is not None, "example_full_solved.npz unreadable"
    lb, _ = problem.bounds()
    assert warm["z"].shape == np.asarray(lb).shape, (
        warm["z"].shape, np.asarray(lb).shape)
    iq = problem.ineq_constraints(jnp.asarray(warm["z"]))
    assert warm["s"].shape == iq.shape
    eq = problem.eq_constraints(jnp.asarray(warm["z"]))
    assert warm["yE"].shape == eq.shape
    assert warm["lam"].shape == warm["s"].shape
    for k in ("zL", "zU"):
        assert warm[k].shape == warm["z"].shape


def test_state_is_still_a_solution_of_the_current_problem(problem, warm):
    """Near-feasibility + strict interior at the stored point.  Catches a
    constraint/scaling change that moved the problem out from under the
    fixture (the failure the shape check cannot see)."""
    z = jnp.asarray(warm["z"])
    eq = np.asarray(problem.eq_constraints(z))
    assert np.abs(eq).max() < 1e-6, np.abs(eq).max()
    iq = np.asarray(problem.ineq_constraints(z))
    assert iq.min() > -1e-7, iq.min()  # feasible (small AD/fp slop)
    lb, ub = problem.bounds()
    lb, ub = np.asarray(lb), np.asarray(ub)
    zn = np.asarray(warm["z"])
    assert (zn > lb).all() and (zn < ub).all(), "state not strictly interior"
    # duals positive and moderate (push_warm's preconditions)
    for k in ("lam", "zL", "zU"):
        v = np.asarray(warm[k])
        assert (v > 0).all(), k
        assert np.isfinite(v).all(), k
    # the stored barrier must be a *converged* one — a mid-solve save here
    # would make every dryrun/bench warm start subtly wrong
    assert float(warm["mu"]) < 1e-6, float(warm["mu"])


def test_payload_in_certified_basin(problem, warm):
    """The stored solution's figure of merit stays in the certified basin
    (BASELINE.md: 238.6 kg ± spread across acceptable-tol solutions)."""
    payload = (float(warm["z"][0]) * problem.units.mass
               - problem.mission.m_init - 140.0)
    assert 236.0 < payload < 241.0, payload
