"""Ground-truth payload parity: cross-check the rebuilt NLP with an
independent CPU solver (SURVEY.md §7 build-order step 5; VERDICT round-1
item 4).

The reference's figure of merit is the converged payload mass
(/root/reference/Trajectory_Optimization.py:503-509).  Round 1 observed two
candidate basins (237.3 kg vs 378.7 kg); this script pins down the
authoritative figure by solving the *same* transcribed NLP from the *same*
initial guess with scipy's trust-constr (an independent interior-point
implementation, no code shared with gelato_tpu.solver), alongside our own
host-loop solve.

Usage:  python scripts/ground_truth.py [--skip-ours] [--maxiter N]
Writes results to stdout (JSON line at the end).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS_FORCE", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--skip-scipy", action="store_true")
    ap.add_argument("--maxiter", type=int, default=3000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", cpu)

    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig

    settings = "/root/reference/example/example-settings.json"
    mission = load_mission(settings)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem))
    lb, ub = problem.bounds()
    m_unit = problem.units.mass
    m_init = problem.mission.m_init
    drop = sum(
        i["mass"] for st in mission.stages.values()
        for i in (st.get("dropMass") or {}).values()
    )
    print(f"n_z={problem.n_z}  m_init={m_init}  total dropMass={drop}")

    def report(tag, z, t, extra=""):
        z = jnp.asarray(z)
        ce = np.asarray(problem.eq_constraints(z))
        ci = np.asarray(problem.ineq_constraints(z))
        viol = max(np.abs(ce).max(), max(0.0, -ci.min()) if ci.size else 0.0)
        payload = float(z[0]) * m_unit - m_init - drop
        print(f"[{tag}] payload={payload:.3f} kg  max_viol={viol:.3e}  "
              f"wall={t:.1f}s  {extra}", flush=True)
        return dict(payload=payload, viol=float(viol), wall=t)

    results = {}

    if not args.skip_ours:
        from gelato_tpu.solver import solve, IPOptions

        funcs = {"obj": problem.objective, "eq": problem.eq_constraints,
                 "ineq": problem.ineq_constraints}
        t0 = time.time()
        st, info = solve(funcs, z0, lb, ub,
                         IPOptions(max_iter=2000, mu_init=1e-3))
        results["ours_host"] = report(
            "ours/host", st.z, time.time() - t0,
            f"status={info['status']} it={info['iterations']} "
            f"err={info['err']:.2e}")

    if not args.skip_scipy:
        from scipy.optimize import minimize, NonlinearConstraint, Bounds

        eq = jax.jit(problem.eq_constraints)
        ineq = jax.jit(problem.ineq_constraints)
        obj = jax.jit(problem.objective)
        g_obj = jax.jit(jax.grad(problem.objective))
        J_eq = jax.jit(jax.jacfwd(problem.eq_constraints))
        J_in = jax.jit(jax.jacfwd(problem.ineq_constraints))

        ncalls = {"f": 0}

        def f_np(z):
            ncalls["f"] += 1
            return float(obj(jnp.asarray(z)))

        cons = [
            NonlinearConstraint(
                lambda z: np.asarray(eq(jnp.asarray(z))), 0.0, 0.0,
                jac=lambda z: np.asarray(J_eq(jnp.asarray(z)))),
            NonlinearConstraint(
                lambda z: np.asarray(ineq(jnp.asarray(z))), 0.0, np.inf,
                jac=lambda z: np.asarray(J_in(jnp.asarray(z)))),
        ]
        t0 = time.time()
        res = minimize(
            f_np, z0, jac=lambda z: np.asarray(g_obj(jnp.asarray(z))),
            bounds=Bounds(lb, ub), constraints=cons,
            method="trust-constr",
            options=dict(maxiter=args.maxiter, gtol=1e-8, xtol=1e-12,
                         verbose=1),
        )
        results["scipy_trust_constr"] = report(
            "scipy/trust-constr", res.x, time.time() - t0,
            f"status={res.status} nit={res.nit} calls={ncalls['f']}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
