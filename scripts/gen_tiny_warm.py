"""Regenerate tests/data/tiny2_warm.npz — the converged primal-dual state of
the 2-node-per-section example mission that the fast default e2e test warm
starts from (tests/test_e2e.py::TestEndToEndFast).

Run on CPU (takes ~10 min on a 1-vCPU host):

    python scripts/gen_tiny_warm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem  # noqa: E402
from gelato_tpu import initial_guess as ig  # noqa: E402
from gelato_tpu.solver import solve, IPOptions  # noqa: E402
from gelato_tpu.solver.warm_start import save_state  # noqa: E402


def main():
    mission = load_mission("/root/reference/example/example-settings.json")
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem, dt=1.0))
    funcs = {"obj": problem.objective, "eq": problem.eq_constraints,
             "ineq": problem.ineq_constraints}
    lb, ub = problem.bounds()
    t0 = time.time()
    st, info = solve(funcs, z0, lb, ub, IPOptions(max_iter=1500, mu_init=1e-3))
    payload = (float(st.z[0]) * problem.units.mass
               - problem.mission.m_init - 140.0)
    viol = np.abs(np.asarray(problem.eq_constraints(jnp.asarray(st.z)))).max()
    print(f"status={info['status']} it={info['iterations']} "
          f"err={info['err']:.2e} payload={payload:.2f} kg viol={viol:.2e} "
          f"wall={time.time() - t0:.0f}s")
    assert info["converged"], "refusing to save a non-converged state"
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "tiny2_warm.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_state(out, st)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
