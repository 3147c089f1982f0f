"""Multi-chip sharding tests over the 8 virtual CPU devices (conftest).

The reference has no distributed story (SURVEY.md §2.3) — its batch mode is a
serial shell loop (/root/reference/run_batch.sh:75-79).  The TPU-native
equivalent shards the dispersion-batch axis of the vmapped solver across a
``jax.sharding.Mesh``; these tests assert (a) the sharded step runs over a
real Mesh and (b) it is numerically identical to the unsharded run.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gelato_tpu import initial_guess as ig
from gelato_tpu.batch import make_batch_step, solve_batch, dispersion_cases
from gelato_tpu.config import load_mission
from gelato_tpu.problem import Problem
from gelato_tpu.solver.ip import IPOptions

SETTINGS = "/root/reference/example/example-settings.json"

pytestmark = [
    pytest.mark.skipif(not os.path.exists(SETTINGS),
                       reason="reference example data not available"),
    # >30 s on the 1-vCPU host (measured: per-file timing, PERF.md round 4)
    pytest.mark.slow,
]


def tiny_problem():
    """Example mission collapsed to 2 collocation nodes per section — the
    same tiny-shape configuration the driver dry run uses."""
    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    return Problem(mission)


@pytest.fixture(scope="module")
def batch_setup():
    problem = tiny_problem()
    z0 = np.asarray(ig.initial_guess(problem, dt=2.0))
    rng = np.random.default_rng(0)
    zb = np.tile(z0, (8, 1)) + 1e-8 * rng.normal(size=(8, z0.size))
    cases = dispersion_cases(problem, 8, seed=1)
    return problem, zb, cases


def test_mesh_step_matches_unsharded(batch_setup):
    problem, zb, cases = batch_setup
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:8]), axis_names=("batch",))

    step, state0 = make_batch_step(problem)
    states = jax.vmap(state0)(jnp.asarray(zb), cases)

    # unsharded: 3 lock-step iterations on one device
    plain = states
    vstep = jax.jit(jax.vmap(step))
    for _ in range(3):
        plain = vstep(plain, cases)

    # sharded: same 3 iterations with the batch axis over the mesh
    def shard(x):
        spec = P(*(("batch",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    sharded = jax.tree.map(shard, states)
    cases_sh = jax.tree.map(shard, cases)
    for _ in range(3):
        sharded = vstep(sharded, cases_sh)

    # the batch axis must actually be distributed, one lane per device
    z_shard = sharded.ip.z.sharding
    assert isinstance(z_shard, NamedSharding)
    assert z_shard.spec[0] == "batch"
    assert len(sharded.ip.z.devices()) == 8

    # partitioned compilation may reorder reductions; agreement is to
    # rounding (measured ~1e-10 after 3 Newton steps), not bitwise
    np.testing.assert_allclose(np.asarray(sharded.ip.z),
                               np.asarray(plain.ip.z), rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sharded.ip.err0),
                               np.asarray(plain.ip.err0), rtol=1e-6)


def test_solve_batch_mesh_path(batch_setup):
    """solve_batch(mesh=..., cases=...) — the user-facing sharded entry
    point — runs per-case physics over the mesh and keeps every lane finite,
    with lanes actually differing (distinct wind tables)."""
    problem, zb, cases = batch_setup
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), axis_names=("batch",))
    # default IPOptions on purpose: the vmapped step then has the same HLO
    # as test_mesh_step_matches_unsharded, so the persistent compile cache
    # makes this test cheap
    opts = IPOptions()
    states = solve_batch(problem, zb, opts, cases=cases, mesh=mesh,
                         max_outer=3, verbose=False)
    err = np.asarray(states.ip.err0)
    assert err.shape == (8,)
    assert np.all(np.isfinite(err))
    # distinct wind tables must produce distinct iterates
    z = np.asarray(states.ip.z)
    assert np.abs(z - z[0]).max() > 1e-10
