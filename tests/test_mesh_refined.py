"""Mesh-refinement scaling: 4x collocation nodes per phase (BASELINE.md #4).

Validates that the transcription, constraint assembly, and KKT direction
computation scale to the refined mesh with static shapes — the full solve at
this size is a benchmark, not a unit test.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem  # noqa: E402
from gelato_tpu import initial_guess as ig  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"

pytestmark = [
    pytest.mark.skipif(not os.path.exists(SETTINGS),
                       reason="reference example data not available"),
    # >30 s on the 1-vCPU host (measured: per-file timing, PERF.md round 4)
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def refined_problem():
    mission = load_mission(SETTINGS)
    mission.events.num_nodes = mission.events.num_nodes * 4
    return Problem(mission)


class TestMeshRefined:
    def test_sizes(self, refined_problem):
        p = refined_problem
        assert p.N == 264  # 4 * 66
        assert p.M == 276
        assert p.n_z == 11 * 276 + 2 * 264 + 13  # 3577

    def test_residuals_and_jacobian_shapes(self, refined_problem):
        p = refined_problem
        z0 = jnp.asarray(ig.initial_guess(p))
        ce = np.asarray(p.eq_constraints(z0))
        ci = np.asarray(p.ineq_constraints(z0))
        assert np.all(np.isfinite(ce)) and np.all(np.isfinite(ci))
        # defect row counts scale with N
        ge, gi = p.group_sizes(z0)
        assert ge["dyn_mass"] == 264
        assert ge["dyn_vel"] == 3 * 264
        assert gi["qalpha"] == 4 * 16 + 1  # ZEROLIFT_START "all" rows

    def test_warm_seed_transfer(self, refined_problem):
        """The mesh4 driver's seeding path (scripts/run_mesh4.py): the
        nominal converged solution transferred onto the 4x mesh must be
        far closer to feasible than the cold initial guess — that is what
        makes the refined full solve warm-startable."""
        from gelato_tpu.config import load_mission
        from gelato_tpu.refine import interp_solution

        warm_path = os.path.join(os.path.dirname(__file__), "data",
                                 "example_full_solved.npz")
        if not os.path.exists(warm_path):
            pytest.skip("nominal converged state not built")
        p4 = refined_problem
        nominal = Problem(load_mission(SETTINGS))
        z_star = np.load(warm_path)["z"]
        assert z_star.shape == (nominal.n_z,)

        z_seed = interp_solution(nominal, z_star, p4)
        z_cold = np.asarray(ig.initial_guess(p4))
        r_seed = np.abs(np.asarray(p4.eq_constraints(jnp.asarray(z_seed))))
        r_cold = np.abs(np.asarray(p4.eq_constraints(jnp.asarray(z_cold))))
        assert np.all(np.isfinite(r_seed))
        assert r_seed.sum() < 0.1 * r_cold.sum(), \
            (r_seed.sum(), r_cold.sum())

    def test_direction_computes(self, refined_problem):
        """One KKT factorization + direction at the refined size."""
        from gelato_tpu.solver import ip

        p = refined_problem
        z0 = ig.initial_guess(p)
        funcs = {"obj": p.objective, "eq": p.eq_constraints,
                 "ineq": p.ineq_constraints}
        sf, _ = ip.scale_funcs(funcs, z0)
        opts = ip.IPOptions(mu_init=1e-3)
        lb, ub = p.bounds()
        lbr, ubr = ip.relaxed_bounds(lb, ub, opts)
        pieces = ip.make_pieces(sf, lbr, ubr, opts)
        st = ip.init_state(sf, z0, lbr, ubr, opts)
        f, g, cE, cI, JE, JI = pieces["eval_point"](st.z, ())
        W = jnp.eye(p.n_z)
        d = pieces["direction"](st, g, cE, cI, JE, JI, W, st.mu)
        assert bool(d["solve_ok"])
        assert np.all(np.isfinite(np.asarray(d["dz"])))
