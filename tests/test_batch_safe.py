"""Batch-safe device control flow (IPOptions.batch_safe_loops).

Every batched ``lax.scan(vmap(step))`` program faults the TPU worker at its
first dispatch, while all of the step's *pieces* run fine vmapped in
isolation (PERF.md round-4 bisect).  The remaining structural difference is
the step's ``lax.while_loop``s / ``lax.cond``s, which lower to
batched-predicate whiles and select-both-branches under vmap.  With
``batch_safe_loops=True`` (+ ``max_soc=0``, ``max_inertia_retries=1``) the
fused step must be pure scan+dataflow — these tests pin that structural
property and the path's convergence semantics on CPU before any TPU trial.

Reference analogue: the dispersion batch replaces run_batch.sh:75-79.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gelato_tpu import initial_guess as ig
from gelato_tpu.batch import (dispersion_cases, make_batch_step,
                              overlay_warm_batch)
from gelato_tpu.config import load_mission
from gelato_tpu.problem import Problem
from gelato_tpu.solver.ip import IPOptions
from gelato_tpu.solver.warm_start import load_state, push_warm

SETTINGS = "/root/reference/example/example-settings.json"
WARM = os.path.join(os.path.dirname(__file__), "data", "tiny2_warm.npz")

pytestmark = [
    pytest.mark.skipif(not os.path.exists(SETTINGS),
                       reason="reference example data not available"),
    # ~2-4 min on the 1-vCPU host (vmapped fused-step compile)
    pytest.mark.slow,
]

BATCH_SAFE = dict(kkt_method="struct", hessian="lbfgs",
                  batch_safe_loops=True, max_soc=0, max_inertia_retries=1)


def tiny_problem():
    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    return Problem(mission)


@pytest.fixture(scope="module")
def setup():
    problem = tiny_problem()
    z0 = np.asarray(ig.initial_guess(problem, dt=2.0))
    batch = 4
    zb = np.tile(z0, (batch, 1))
    cases = dispersion_cases(problem, batch, sigma_wind=2.0, sigma_ca=0.02,
                             seed=0)
    return problem, zb, cases


def test_batch_safe_step_has_no_while_or_cond(setup):
    """The vmapped batch-safe step must lower to pure scan+dataflow: no
    while_loop (batched predicate) and no cond (select-both-branches) —
    the constructs the TPU-worker fault bisect left as suspects."""
    problem, zb, cases = setup
    opts = IPOptions(**BATCH_SAFE)
    step, state0 = make_batch_step(problem, opts)
    states = jax.vmap(state0)(jnp.asarray(zb), cases)
    jaxpr = jax.make_jaxpr(
        lambda s, c: jax.vmap(step)(s, c))(states, cases)
    text = str(jaxpr)
    assert " while[" not in text and " while " not in text, \
        "batch-safe step still contains a while_loop"
    assert " cond[" not in text and " cond " not in text, \
        "batch-safe step still contains a lax.cond"


def test_batch_safe_warm_batch_converges(setup):
    """Warm-started dispersed lanes must re-converge through the batch-safe
    step via the PRODUCTION batch path (solve_batch_scan: warm overlay +
    divergence restarts onto the conservative ladder — the same machinery
    _bench_batch uses on the chip)."""
    from gelato_tpu.batch import solve_batch_scan

    problem, zb, cases = setup
    batch = zb.shape[0]
    opts = IPOptions(max_iter=240, **BATCH_SAFE)

    warm0 = load_state(WARM)
    assert warm0 is not None and warm0["z"].shape == zb.shape[1:], \
        "tiny2_warm.npz missing or stale — regenerate (scripts/gen_tiny_warm.py)"

    states = solve_batch_scan(
        problem, zb, opts, cases=cases, chunk=20,
        warm=push_warm(warm0, mu=1.0e-5),
        warm_safe=push_warm(warm0, mu=1.0e-3))

    err_end = np.asarray(states.ip.err0)
    conv = np.asarray(states.ip.converged)
    assert np.all(np.isfinite(err_end)), err_end
    # pass bar: at least half the lanes reconverge within the 240-iteration
    # budget and nothing blows up.  Measured (CPU, 2026-08-19): 2/4 converged
    # with one straggler at 8.7e-5 (still descending) and one restarted lane
    # at 8e2 mid-recovery — batched globalization under dispersed physics is
    # chaotic (same as the r3 dryrun finding), so the semantics bar here is
    # "descending fleet", while the TPU trial owns the throughput claim.
    assert conv.sum() >= batch // 2, (conv, err_end)
    assert np.all(conv | (err_end < 1.0e6)), (err_end, conv)
