"""Full solve of the 4x mesh-refined example case (BASELINE.md target #4).

The reference takes ``num_nodes`` as free user input
(/root/reference/example/example-events.csv:1); quadrupling every section's
node count gives the 3,577-variable NLP whose full solve round 2 only
assembled (tests/test_mesh_refined.py).  This driver solves it:

1. build the nominal (66-node, 1,003-var) problem and load its converged
   primal state (tests/data/example_full_solved.npz);
2. transfer the solution to the 4x mesh by per-section barycentric
   interpolation (gelato_tpu.refine.interp_solution — the in-memory analogue
   of the reference's "Initial trajectory file" restart,
   Trajectory_Optimization.py:179-187);
3. solve the refined NLP warm-started from the transferred primal point.

Run on the host CPU (safe default; cheap compile, no TPU cache churn):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/run_mesh4.py

or on the TPU (drop the env overrides).  Writes output/mesh4_report.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem  # noqa: E402
from gelato_tpu.refine import interp_solution, section_defect_errors  # noqa: E402
from gelato_tpu.solver import IPOptions, solve_device  # noqa: E402
from gelato_tpu.solver.warm_start import load_state  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def payload_kg(problem, z):
    drop = sum(
        i["mass"] for stg in problem.mission.stages.values()
        for i in (stg.get("dropMass") or {}).values())
    return float(z[0]) * problem.units.mass - problem.mission.m_init - drop


def main():
    settings = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/example/example-settings.json"
    factor = int(os.environ.get("MESH_FACTOR", "4"))
    t0 = time.time()

    nominal = Problem(load_mission(settings))
    warm = load_state(os.path.join(REPO, "tests", "data",
                                   "example_full_solved.npz"))
    assert warm is not None and warm["z"].shape == (nominal.n_z,), \
        "nominal converged state missing/mismatched"

    mission = load_mission(settings)
    mission.events.num_nodes = mission.events.num_nodes * factor
    refined = Problem(mission)
    print(f"[{time.time()-t0:.0f}s] refined problem: {refined.n_z} vars "
          f"({nominal.n_z} nominal)", flush=True)

    z_seed = interp_solution(nominal, np.asarray(warm["z"]), refined)
    err_seed = section_defect_errors(refined, z_seed)
    print(f"[{time.time()-t0:.0f}s] transferred seed: max defect "
          f"{err_seed.max():.3e}, payload {payload_kg(refined, z_seed):.2f} kg",
          flush=True)

    opts = IPOptions(
        max_iter=int(os.environ.get("MESH_MAX_ITER", "1200")),
        mu_init=float(os.environ.get("MESH_MU", "1e-4")),
        kkt_method=os.environ.get("MESH_KKT", "chol"),
        hessian=os.environ.get("MESH_HESSIAN", "lbfgs"),
        mu_strategy=os.environ.get("MESH_MU_STRATEGY", "adaptive"),
    )
    funcs = refined.solver_funcs(structured=opts.kkt_method == "struct",
                                 z0=z_seed)
    lb, ub = refined.bounds()
    t1 = time.time()
    st, info = solve_device(funcs, z_seed, lb, ub, opts,
                            chunk=int(os.environ.get("MESH_CHUNK", "20")),
                            deadline_s=float(os.environ.get(
                                "MESH_DEADLINE", "86400")))
    wall = time.time() - t1
    z = np.asarray(st.z)
    err_final = section_defect_errors(refined, z)

    report = {
        "n_z": refined.n_z,
        "factor": factor,
        "status": info["status"],
        "iterations": info["iterations"],
        "kkt_error": info["err"],
        "wall_s": round(wall, 1),
        "payload_kg": round(payload_kg(refined, z), 3),
        "payload_kg_nominal_mesh": round(payload_kg(nominal, warm["z"]), 3),
        "max_defect_seed": float(err_seed.max()),
        "max_defect_final": float(err_final.max()),
        "config": {"kkt": opts.kkt_method, "hessian": opts.hessian,
                   "mu_strategy": opts.mu_strategy},
    }
    print(json.dumps(report), flush=True)
    os.makedirs(os.path.join(REPO, "output"), exist_ok=True)
    with open(os.path.join(REPO, "output", "mesh4_report.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
