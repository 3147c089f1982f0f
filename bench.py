"""Benchmark driver: one JSON line for the round harness.

Measures the full end-to-end example-case solve (problem build + initial
guess + on-device interior-point to convergence) and reports wall-clock
against a CPU baseline of the same workload — the reference's figure of
merit is "wall-clock to converged NLP" (BASELINE.md).

Output: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time


def _build():
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig

    candidates = [
        "/root/reference/example/example-settings.json",
        os.path.join(os.path.dirname(__file__), "examples", "demo-settings.json"),
    ]
    path = next(p for p in candidates if os.path.exists(p))
    mission = load_mission(path)
    problem = Problem(mission)
    z0 = ig.initial_guess(problem)
    return problem, z0


def _solve_once(problem, z0, device=None, max_iter=2000):
    import jax
    from gelato_tpu.solver import solve_device, IPOptions

    funcs = {"obj": problem.objective, "eq": problem.eq_constraints,
             "ineq": problem.ineq_constraints}
    lb, ub = problem.bounds()
    opts = IPOptions(max_iter=max_iter, mu_init=1e-3)

    ctx = jax.default_device(device) if device is not None else _null_ctx()
    with ctx:
        # warm-up solve pays the (persistent-cached) compile; the measured
        # run reflects steady-state wall-clock
        solve_device(funcs, z0, lb, ub, opts._replace(max_iter=40), chunk=40)
        t0 = time.time()
        st, info = solve_device(funcs, z0, lb, ub, opts, chunk=40)
        wall = time.time() - t0
    return wall, info, st


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _bench_batch(problem, n_cases, max_iter=1500):
    """Dispersion-batch throughput: n_cases wind/CA-dispersed solves in
    lock-step (BASELINE target #2).  Returns (wall, n_converged, payloads)."""
    import numpy as np
    from gelato_tpu.batch import (solve_batch_scan, wind_dispersion_batch)
    from gelato_tpu.solver import IPOptions

    zb, cases = wind_dispersion_batch(problem, n_cases)
    opts = IPOptions(max_iter=max_iter, mu_init=1e-3)
    # warm-up chunk pays the (cached) compile
    solve_batch_scan(problem, zb, opts._replace(max_iter=40), cases=cases,
                     chunk=40)
    t0 = time.time()
    states = solve_batch_scan(problem, zb, opts, cases=cases, chunk=40)
    wall = time.time() - t0
    conv = np.asarray(states.ip.converged)
    drop = sum(
        i["mass"] for stg in problem.mission.stages.values()
        for i in (stg.get("dropMass") or {}).values()
    )
    payloads = (np.asarray(states.ip.z[:, 0]) * problem.units.mass
                - problem.mission.m_init - drop)
    return wall, int(conv.sum()), payloads


def main():
    import jax

    problem, z0 = _build()

    n_batch = int(os.environ.get("GELATO_BENCH_BATCH", "0"))
    if n_batch:
        wall, n_conv, payloads = _bench_batch(problem, n_batch)
        print(json.dumps({
            "metric": "dispersion_batch_wall_clock",
            "value": round(wall, 3),
            "unit": "s",
            "vs_baseline": None,
            "n_cases": n_batch,
            "n_converged": n_conv,
            "s_per_case": round(wall / n_batch, 3),
            "payload_kg_mean": round(float(payloads.mean()), 3),
            "payload_kg_std": round(float(payloads.std()), 3),
        }))
        return

    # accelerator run (default device = TPU when present)
    wall, info, st = _solve_once(problem, z0)

    # CPU baseline of the identical workload (skippable via env for speed)
    vs_baseline = 1.0
    if os.environ.get("BENCH_SKIP_CPU_BASELINE", "") != "1":
        try:
            cpu = jax.devices("cpu")[0]
            wall_cpu, info_cpu, _ = _solve_once(problem, z0, device=cpu)
            vs_baseline = wall_cpu / wall
        except Exception:
            vs_baseline = 1.0

    # payload per the reference's report: m[0] - m_init - Σ dropMass
    # (Trajectory_Optimization.py:503-509)
    drop = sum(
        i["mass"] for stg in problem.mission.stages.values()
        for i in (stg.get("dropMass") or {}).values()
    )
    payload = float(st.z[0]) * problem.units.mass - problem.mission.m_init - drop
    import numpy as np
    import jax.numpy as jnp
    viol = float(np.abs(np.asarray(
        problem.eq_constraints(jnp.asarray(st.z)))).max())
    print(json.dumps({
        "metric": "example_case_solve_wall_clock",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 3),
        "converged": bool(info["converged"]),
        "status": info["status"],
        "kkt_error": float(info["err"]),
        "max_eq_violation": viol,
        "iterations": int(info["iterations"]),
        "payload_kg": round(payload, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
