"""Problem-assembly tests against the bundled reference example mission.

Uses the reference's example data files read-only (schema parity); skipped if
the reference checkout is absent.
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

pytestmark = pytest.mark.skipif(
    not os.path.exists(SETTINGS), reason="reference example data not available"
)


@pytest.fixture(scope="module")
def problem():
    return Problem(load_mission(SETTINGS))


@pytest.fixture(scope="module")
def z0(problem):
    return jnp.asarray(ig.initial_guess(problem))


class TestLayout:
    def test_sizes_match_reference(self, problem):
        # example: 13 events / 12 sections, N=66, M=78, 1003 variables
        # (BASELINE.md problem-size row)
        assert problem.S == 12
        assert problem.N == 66
        assert problem.M == 78
        assert problem.n_z == 1003

    def test_group_row_counts(self, problem, z0):
        ge, gi = problem.group_sizes(z0)
        assert ge["init"] == 10  # Payload mode: no mass row
        assert ge["time"] == 10  # 1 pinned + 9 chained knots
        assert ge["dyn_mass"] == 66
        assert ge["dyn_pos"] == 198
        assert ge["dyn_vel"] == 198
        assert ge["dyn_quat"] == 264
        assert ge["knot"] == 121  # 2 stage rows + 9 mass + 11*(3+3+4)
        # circular target -> full-rank 3-row terminal form (see
        # Problem._build_terminal); the reference's degenerate pair has 2
        assert ge["terminal"] == 3
        assert ge["rate"] == 93
        assert ge["posLLH"] == 1  # FAIRING altitude exact
        assert gi["alpha"] == 1  # MECO initial
        assert gi["qalpha"] == 17  # ZEROLIFT_START all (16+1)
        assert gi["iip"] == 1  # FAIRING lon_IIP min
        assert gi["mass"] == 2
        assert gi["kickturn"] == 5
        assert gi["time"] == 5
        assert gi["antenna"] == 1

    def test_pack_unpack_roundtrip(self, problem, z0):
        v = problem.unpack(z0)
        z2 = problem.pack(v.mass, v.pos, v.vel, v.quat, v.u, v.t)
        np.testing.assert_array_equal(np.asarray(z2), np.asarray(z0))


class TestResiduals:
    def test_finite_at_guess(self, problem, z0):
        ce = problem.eq_constraints(z0)
        ci = problem.ineq_constraints(z0)
        assert np.all(np.isfinite(np.asarray(ce)))
        assert np.all(np.isfinite(np.asarray(ci)))

    def test_fixed_time_sections_nearly_converged(self, problem, z0):
        """The bundled init file is a near-converged solution; sections whose
        both knots chain to LIFTOFF must have small velocity defects."""
        v = problem.unpack(z0)
        t_x, dt = problem._time_grids(v.t)
        half = dt * problem.units.t / 2.0
        lh = jnp.einsum("sij,sjk->sik", problem.D, v.vel_s)
        rh = problem._node_accel(v) * half[:, None, None]
        res = np.asarray(lh - rh)
        mask = np.asarray(problem.node_mask)
        for sec in (0, 1, 2):  # LIFTOFF, KICKTURN, ZEROLIFT_START
            # tolerance covers the bounded C1 table-smoothing deviation
            assert np.abs(res[sec][mask[sec]]).max() < 3e-3, sec

    def test_objective_is_payload_mass(self, problem, z0):
        # file mass[0] = 28053.49 kg -> obj = -mass0/m_init
        obj = float(problem.objective(z0))
        np.testing.assert_allclose(obj, -28053.4855 / 27442.0, rtol=1e-5)


class TestJacobians:
    # ~51 s on the 1-vCPU host (PERF.md round-4 per-test timing)
    @pytest.mark.slow
    def test_ad_matches_fd(self, problem, z0):
        """jacfwd vs central finite differences on random variable subsets
        (replaces the reference's FD machinery as ground truth check)."""
        rng = np.random.default_rng(1)
        cols = rng.choice(problem.n_z, size=25, replace=False)

        for fn in (problem.eq_constraints, problem.ineq_constraints):
            J = jax.jacfwd(fn)(z0)
            J = np.asarray(J)
            z_np = np.asarray(z0)
            for j in cols:
                h = 1e-6 * max(1.0, abs(z_np[j]))
                zp = z_np.copy(); zp[j] += h
                zm = z_np.copy(); zm[j] -= h
                fd = (np.asarray(fn(jnp.asarray(zp)))
                      - np.asarray(fn(jnp.asarray(zm)))) / (2 * h)
                np.testing.assert_allclose(
                    J[:, j], fd, rtol=2e-4, atol=5e-6,
                    err_msg=f"{fn.__name__} col {j}",
                )

    def test_objective_gradient(self, problem, z0):
        g = np.asarray(jax.grad(problem.objective)(z0))
        assert g[0] == -1.0  # payload mode: d(-mass0)/dmass0
        assert np.count_nonzero(g) == 1


class TestInitialGuess:
    def test_simulated_guess_runs(self, problem):
        z = ig.from_simulation(problem, dt=0.5)
        assert z.shape == (problem.n_z,)
        assert np.all(np.isfinite(z))
        v = problem.unpack(jnp.asarray(z))
        # quaternions stay ~unit-norm (interpolation between unit-norm
        # samples undershoots slightly, same as the reference's guess)
        qn = np.linalg.norm(np.asarray(v.quat), axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-4)
        # mass decreases during burns, starts at m_init
        mass = np.asarray(v.mass) * problem.units.mass
        np.testing.assert_allclose(mass[0], problem.mission.m_init, rtol=1e-12)
        assert mass[-1] < mass[0]

    def test_sim_guess_satisfies_dynamics_loosely(self):
        """RK4 trajectory interpolated on LGR nodes has small defects.

        Uses the in-repo demo mission: its nominal schedule is
        propellant-consistent, unlike the reference example whose nominal
        burn exceeds the stage budget (the simulator flames out there).
        """
        import os

        demo = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "demo-settings.json")
        p_demo = Problem(load_mission(demo))
        z = jnp.asarray(ig.from_simulation(p_demo, dt=0.1))
        ce = np.asarray(p_demo.eq_constraints(z))
        ge, _ = p_demo.group_sizes(z)
        off = ge["init"] + ge["time"]
        dyn = ce[off:off + ge["dyn_mass"] + ge["dyn_pos"] + ge["dyn_vel"]]
        assert np.abs(dyn).max() < 0.5

    def test_sim_guess_mass_stays_positive(self, problem):
        """Flame-out floor: over-demanding schedules cannot drive the mass
        negative (the reference integrator does, initialize.py:147-163)."""
        z = jnp.asarray(ig.from_simulation(problem, dt=0.5))
        v = problem.unpack(z)
        assert float(jnp.min(v.mass)) > 0.0
