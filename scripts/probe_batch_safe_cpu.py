"""CPU A/B: batch-safe vs normal control flow on the tiny warm batch.

Both runs use the production batch path (solve_batch_scan, struct KKT,
L-BFGS, warm overlay + divergence restarts).  The only difference is the
device control flow: batch-safe (scan+dataflow, max_soc=0, 1 inertia trip)
vs normal (while_loop backtracking, lax.cond SOC, 3 retries).
"""

import os
import sys
import time

# CPU-only must be enforced by RE-EXEC, not in-process env surgery: the
# sitecustomize hook registers the remote-accelerator plugin at interpreter
# startup whenever PALLAS_AXON_POOL_IPS is set — before this module runs —
# and then every tiny op crawls over the tunnel (observed: 150 s of CPU in
# 21 min, zero output).  Same pattern as run.py --cpu / dryrun_multichip.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp  # noqa: F401

    from gelato_tpu import initial_guess as ig
    from gelato_tpu.batch import dispersion_cases, solve_batch_scan
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu.solver.ip import IPOptions
    from gelato_tpu.solver.warm_start import load_state, push_warm

    mission = load_mission("/root/reference/example/example-settings.json")
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem, dt=2.0))
    batch = 4
    zb = np.tile(z0, (batch, 1))
    cases = dispersion_cases(problem, batch, sigma_wind=2.0, sigma_ca=0.02,
                             seed=0)
    warm0 = load_state(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "data", "tiny2_warm.npz"))
    warm = push_warm(warm0, mu=1.0e-5)
    warm_safe = push_warm(warm0, mu=1.0e-3)

    configs = {
        "batch_safe": dict(kkt_method="struct", hessian="lbfgs",
                           batch_safe_loops=True, max_soc=0,
                           max_inertia_retries=1, max_iter=400),
        "normal": dict(kkt_method="struct", hessian="lbfgs", max_iter=400),
        # dense-Schur sweep variants (VERDICT r4 next-step #3/#4): same
        # batch-safe control flow, T̂ factored by one batched MXU Cholesky
        "dense": dict(kkt_method="struct", hessian="lbfgs",
                      batch_safe_loops=True, max_soc=0,
                      max_inertia_retries=1, max_iter=400,
                      struct_sweep="dense"),
        "dense_f32": dict(kkt_method="struct", hessian="lbfgs",
                          batch_safe_loops=True, max_soc=0,
                          max_inertia_retries=1, max_iter=400,
                          struct_sweep="dense",
                          struct_factor_dtype="float32", kkt_refine=2),
    }
    for name in sys.argv[1:] or list(configs):
        opts = IPOptions(**configs[name])
        t0 = time.time()
        states = solve_batch_scan(problem, zb, opts, cases=cases, chunk=20,
                                  warm=warm, warm_safe=warm_safe)
        err = np.asarray(states.ip.err0)
        conv = np.asarray(states.ip.converged)
        its = np.asarray(states.ip.it)
        print(f"{name}: {conv.sum()}/{batch} converged in "
              f"{time.time()-t0:.0f}s  err={np.array2string(err, precision=2)}"
              f"  it={its}", flush=True)


if __name__ == "__main__":
    main()
