"""Reference user_constraints.py compatibility (gelato_tpu.compat).

The reference's own example plug-in (4-argument NumPy xdict API with
``lib.*_c`` imports, /root/reference/example/user_constraints.py) must run
unmodified and produce the same constraint rows as the natively-ported
version in examples/parity/user_constraints.py.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem, UserContext  # noqa: E402
from gelato_tpu import initial_guess as ig  # noqa: E402
from gelato_tpu import compat  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"
REF_PLUGIN = "/root/reference/example/user_constraints.py"
PORTED = os.path.join(os.path.dirname(__file__), "..", "examples", "parity",
                      "user_constraints.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PLUGIN), reason="reference example not available")


@pytest.fixture(scope="module")
def setup():
    problem = Problem(load_mission(SETTINGS))
    z0 = jnp.asarray(ig.initial_guess(problem))
    return problem, z0


def test_reference_plugin_loads_and_runs(setup):
    problem, z0 = setup
    eq, ineq = compat.adapt_reference_user_module(REF_PLUGIN)
    assert eq is not None
    ctx = UserContext(problem, problem.unpack(z0))
    rows = eq(ctx)
    assert rows.shape == (1,)
    assert np.isfinite(float(rows[0]))
    assert ineq(ctx) is None


def test_reference_plugin_matches_ported(setup):
    """Same residual as the hand-ported plug-in: the reference computes
    a(1-e)/Re - 1 from orbital elements, the port via energy/momentum."""
    import importlib.util

    problem, z0 = setup
    ctx = UserContext(problem, problem.unpack(z0))

    eq_ref, _ = compat.adapt_reference_user_module(REF_PLUGIN)
    spec = importlib.util.spec_from_file_location("ported_uc", PORTED)
    ported = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ported)

    r_ref = float(eq_ref(ctx)[0])
    r_port = float(jnp.atleast_1d(ported.equality_user(ctx))[0])
    np.testing.assert_allclose(r_ref, r_port, rtol=1e-10)


def test_reference_plugin_is_differentiable(setup):
    """AD must flow through the adapted plug-in (replaces the reference's
    dense-FD jac_fd, lib/con_user.py:33-42)."""
    problem, z0 = setup
    eq, _ = compat.adapt_reference_user_module(REF_PLUGIN)

    def resid(z):
        return eq(UserContext(problem, problem.unpack(z)))[0]

    g = jax.grad(resid)(z0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.count_nonzero(g) > 0


def test_problem_accepts_adapted_plugin(setup):
    """End-to-end: Problem(user_equality=...) adds exactly the plug-in row."""
    problem, z0 = setup
    eq, ineq = compat.adapt_reference_user_module(REF_PLUGIN)
    mission = load_mission(SETTINGS)
    p2 = Problem(mission, user_equality=eq, user_inequality=ineq)
    ge0, _ = problem.group_sizes(z0)
    ge2, _ = p2.group_sizes(z0)
    assert ge2.get("user", 0) == 1
    assert sum(ge2.values()) == sum(ge0.values()) + 1
