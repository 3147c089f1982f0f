"""h-refinement machinery tests (gelato_tpu/refine.py).

Fast checks: barycentric interpolation exactness, refinement policy, the
defect-error estimator on the converged tiny state, and solution transfer
identity/consistency.  The full solve→refine→re-solve loop (which is what
actually shows the defect error *decreasing*) runs in the slow suite /
scripts/run_h_refine.py since it needs a re-solve per round.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.refine import (lagrange_interp_matrix, refine_num_nodes,
                               section_defect_errors, interp_solution)
from gelato_tpu.transcription.lgr import lgr_nodes  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"
WARM = os.path.join(os.path.dirname(__file__), "data", "tiny2_warm.npz")
needs_ref = pytest.mark.skipif(not os.path.exists(SETTINGS),
                               reason="no reference data")


def test_interp_matrix_reproduces_polynomials():
    sup = np.concatenate(([-1.0], lgr_nodes(5)))
    x = np.linspace(-1.0, 1.0, 17)
    L = lagrange_interp_matrix(sup, x)
    for deg in range(sup.size):  # exact up to the basis degree
        np.testing.assert_allclose(L @ sup**deg, x**deg, atol=1e-12)
    # support points are reproduced exactly (including the hit branch)
    Lh = lagrange_interp_matrix(sup, sup[2:4])
    np.testing.assert_allclose(Lh, np.eye(sup.size)[2:4], atol=1e-14)


def test_refine_policy():
    nn = refine_num_nodes([2, 2, 4], [1e-3, 1e-9, 1e-2], tol=1e-6,
                          factor=2, cap=6)
    assert nn.tolist() == [4, 2, 6]  # refine, keep, cap


@needs_ref
@pytest.mark.skipif(not os.path.exists(WARM), reason="warm state not built")
def test_defect_errors_on_converged_state():
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem

    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    problem = Problem(mission)
    z = np.load(WARM)["z"]
    errors = section_defect_errors(problem, z)
    assert errors.shape == (problem.S,)
    assert np.all(np.isfinite(errors)) and np.all(errors >= 0.0)
    # a converged 2-node solution satisfies the defects *at* collocation
    # points but not between them — a coarse mesh must show real
    # interpolation error somewhere (that is what drives refinement)
    assert errors.max() > 1e-7, errors
    # the hold/coast sections with trivial dynamics interpolate much better
    # than the worst powered section
    assert errors.min() < 0.3 * errors.max(), errors


@needs_ref
@pytest.mark.skipif(not os.path.exists(WARM), reason="warm state not built")
def test_interp_solution_identity_and_refined_transfer():
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem

    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    p_old = Problem(mission)
    z = np.load(WARM)["z"]

    # same-mesh transfer is the identity (up to quaternion renormalization)
    z_same = interp_solution(p_old, z, p_old)
    np.testing.assert_allclose(z_same, z, atol=1e-9)

    # 2 → 4 node transfer: state values at the old support points are
    # reproduced by the refined vector's interpolant (polynomial nesting)
    import copy

    mission4 = load_mission(SETTINGS)
    mission4.events.num_nodes = np.full_like(mission4.events.num_nodes, 4)
    p_new = Problem(mission4)
    z4 = interp_solution(p_old, z, p_new)
    v_old = p_old.unpack(jnp.asarray(z))
    v_new = p_new.unpack(jnp.asarray(z4))
    # knot times identical; section-start states identical
    np.testing.assert_allclose(np.asarray(v_new.t), np.asarray(v_old.t),
                               atol=1e-14)
    for i in range(p_old.S):
        xa_o = p_old.ps.get_index(i)[2]
        xa_n = p_new.ps.get_index(i)[2]
        np.testing.assert_allclose(np.asarray(v_new.pos[xa_n]),
                                   np.asarray(v_old.pos[xa_o]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(v_new.mass[xa_n]),
                                   np.asarray(v_old.mass[xa_o]), atol=1e-12)
