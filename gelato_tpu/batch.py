"""Batched dispersion studies: vmapped solves sharded over a device mesh.

TPU-native replacement for the reference's serial shell loop
(/root/reference/run_batch.sh:75-79): a stack of perturbed cases (wind,
payload, initial-guess dispersions over one mission *structure*) advances in
lock-step — every case runs the same compiled IP iteration under ``vmap``,
and the batch axis shards across chips with ``jax.sharding`` so dispersion
studies ride ICI instead of a job queue.

Note the restriction inherited from XLA static shapes: all cases in one batch
share the mission structure (events, node counts, constraint layout); the
*data* (wind tables, payload masses, initial guesses) varies per case.  For
heterogeneous missions, run one batch per structure.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .problem import Problem
from .solver.ip import IPOptions, make_fused_step


def make_batch_step(problem: Problem, opts: IPOptions = IPOptions(),
                    z0_ref=None):
    """(step, state0): vmappable one-iteration step for this problem.

    ``z0_ref`` (optional) is the reference point for gradient-based scaling,
    shared across all batch lanes.
    """
    funcs = {"obj": problem.objective, "eq": problem.eq_constraints,
             "ineq": problem.ineq_constraints}
    lb, ub = problem.bounds()
    return make_fused_step(funcs, lb, ub, opts, z0_scale_ref=z0_ref)


def solve_batch(problem: Problem, z0_batch, opts: IPOptions = IPOptions(),
                mesh=None, max_outer=None, log_every=10, verbose=True):
    """Solve a batch of cases to convergence.

    ``z0_batch``: [B, n_z] initial guesses (e.g. one per wind/payload case).
    When ``mesh`` (a 1-axis jax.sharding.Mesh) is given, the batch axis is
    sharded across its devices.  Runs jitted vmapped IP iterations until every
    lane converges or ``opts.max_iter`` is reached.
    """
    step, state0 = make_batch_step(problem, opts)
    states = jax.vmap(state0)(jnp.asarray(z0_batch))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard(x):
            spec = P(*((mesh.axis_names[0],) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        states = jax.tree.map(shard, states)

    vstep = jax.jit(jax.vmap(step))

    max_outer = max_outer or opts.max_iter
    for k in range(max_outer):
        states = vstep(states)
        if (k + 1) % log_every == 0:
            done = np.asarray(states.ip.converged)
            if verbose:
                err = np.asarray(states.ip.err0)
                print(f"batch iter {k+1}: {done.sum()}/{done.size} converged, "
                      f"max err {np.nanmax(err):.3e}", flush=True)
            if done.all():
                break
    return states


def wind_dispersion_batch(problem: Problem, n_cases, sigma_speed=5.0, seed=0):
    """Build a wind-perturbed batch of initial guesses around the nominal.

    A light-weight stand-in for a full per-case wind table sweep: perturbs the
    nominal initial guess; per-case wind tables become per-case problem data
    once the wind table moves into the variable pytree (future work — the
    solver itself is already batch-pure).
    """
    from . import initial_guess as ig

    z0 = ig.initial_guess(problem)
    rng = np.random.default_rng(seed)
    zb = np.tile(z0, (n_cases, 1))
    # perturb initial velocity guesses slightly (dimensionless V unit = 1 km/s)
    off_v = problem.off_vel
    zb[:, off_v:off_v + 3 * problem.M] += (
        sigma_speed / problem.units.velocity
        * rng.normal(size=(n_cases, 3 * problem.M)) * 1e-2
    )
    return zb
