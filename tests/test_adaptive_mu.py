"""Adaptive barrier schedule (IPOptions.mu_strategy="adaptive").

The reference runs IPOPT with its default monotone Fiacco-McCormick ladder
(example-settings.json passes no mu_strategy); the rebuild's adaptive mode
is a perf lever on top: when the subproblem-solved trigger fires, mu jumps
to the LOQO centrality target sigma*avg(compl) instead of descending one
rung, skipping the remaining ladder.  These tests pin (1) the centrality
rule's limiting behaviour, (2) that adaptive still converges the
warm-started tiny mission to the same answer, in no more chunks than
monotone.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver.ip import IPOptions, IPState, make_pieces  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"

# >30 s on the 1-vCPU host (measured: per-file timing, PERF.md round 4)
pytestmark = pytest.mark.slow
needs_ref = pytest.mark.skipif(not os.path.exists(SETTINGS),
                               reason="no reference data")


def _state(z, s, lam, zL, zU):
    n, m = z.size, s.size
    return IPState(
        z=jnp.asarray(z), s=jnp.asarray(s), yE=jnp.zeros(0),
        lam=jnp.asarray(lam), zL=jnp.asarray(zL), zU=jnp.asarray(zU),
        mu=jnp.asarray(1e-3), delta_w=jnp.asarray(0.0),
        nu=jnp.asarray(0.0), err0=jnp.asarray(1.0),
        it=jnp.asarray(0), alpha=jnp.asarray(1.0),
        converged=jnp.asarray(False))


def _mu_target_fn():
    n = 4
    lb, ub = -np.ones(n), np.ones(n)
    funcs = {"obj": lambda z: jnp.sum(z ** 2),
             "eq": lambda z: jnp.zeros(0),
             "ineq": lambda z: z[:2] + 2.0}
    pieces = make_pieces(funcs, jnp.asarray(lb), jnp.asarray(ub),
                         IPOptions(mu_strategy="adaptive"))
    return pieces["raw"]["mu_target"], lb, ub


def test_mu_target_centered_iterate_drops_hard():
    """Perfectly centered complementarity (all products equal) => xi = 1 =>
    sigma = 0 => the adaptive target clears the whole remaining ladder."""
    mu_target, lb, ub = _mu_target_fn()
    z = np.zeros(4)
    mu = 1e-3
    s = np.full(2, 0.1)
    st = _state(z, s, mu / s, mu / (z - lb), mu / (ub - z))
    assert float(mu_target(st)) < 1e-12


def test_mu_target_uncentered_iterate_stays_bounded():
    """Badly centered iterate: sigma caps at 0.1*2^3 = 0.8, so the target
    never drops below ~avg complementarity — no premature barrier kill."""
    mu_target, lb, ub = _mu_target_fn()
    z = np.zeros(4)
    s = np.array([1.0, 1e-6])
    lam = np.array([1.0, 1e-6])  # products 1 and 1e-12: xi ~ 0
    st = _state(z, s, lam, np.full(4, 1.0), np.full(4, 1.0))
    t = float(mu_target(st))
    avg = float(np.mean(np.concatenate([s * lam, np.ones(8)])))
    assert 0.1 * avg < t <= 0.8 * avg * 1.01


@needs_ref
def test_adaptive_converges_tiny_warm_no_slower():
    """Warm-started tiny mission: adaptive mu must converge to the same
    payload as monotone (which test_struct_warm_convergence pins) without
    more iterations."""
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig
    from gelato_tpu.solver import solve_device
    from gelato_tpu.solver.warm_start import load_state

    warm_path = os.path.join(os.path.dirname(__file__), "data",
                             "tiny2_warm.npz")
    if not os.path.exists(warm_path):
        pytest.skip("warm state not built")
    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem, dt=2.0))
    lb, ub = problem.bounds()
    funcs = problem.solver_funcs()
    warm = load_state(warm_path)

    its = {}
    for strat in ("monotone", "adaptive"):
        st, info = solve_device(
            funcs, z0, lb, ub,
            IPOptions(max_iter=80, mu_init=1e-3, mu_strategy=strat),
            chunk=20, warm=warm)
        assert info["converged"], (strat, info)
        payload = (float(st.z[0]) * problem.units.mass
                   - problem.mission.m_init - 140.0)
        assert abs(payload - 377.7) < 4.0, (strat, payload)
        its[strat] = info["iterations"]
    assert its["adaptive"] <= its["monotone"], its
