"""h-refinement driver: refine 2 → 4 → 8 nodes on the worst sections and
show the defect error decreasing (VERDICT r2 item 8; SURVEY §5 long-context
analogue — the reference has no mesh refinement at all, num_nodes is fixed
user input at example-events.csv:1).

Run on the host CPU (cheap compiles):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/run_h_refine.py

Writes a JSON report to output/h_refine_report.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.refine import h_refine  # noqa: E402
from gelato_tpu.solver import IPOptions  # noqa: E402
from gelato_tpu.solver.warm_start import load_state  # noqa: E402


def main():
    settings = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/example/example-settings.json"
    mission = load_mission(settings)
    # start from the deliberately-coarse 2-node mesh so spectral convergence
    # under refinement is visible within a short run
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, 2)

    warm = load_state(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "tiny2_warm.npz"))
    opts = IPOptions(max_iter=1500, mu_init=1e-3, kkt_method="struct",
                     hessian="hybrid")
    report = h_refine(mission, tol=float(os.environ.get("REFINE_TOL", "1e-6")),
                      max_rounds=int(os.environ.get("REFINE_ROUNDS", "3")),
                      solve_opts=opts,
                      warm_z=warm["z"] if warm is not None else None)

    os.makedirs("output", exist_ok=True)
    path = os.path.join("output", "h_refine_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {path}")
    errs = [max(r["defect_errors"]) for r in report]
    print("max defect per round:", " -> ".join(f"{e:.3e}" for e in errs))
    if len(errs) > 1:
        assert errs[-1] < errs[0], "defect error did not decrease"
        print(f"defect error decreased {errs[0] / errs[-1]:.1f}x "
              f"over {len(errs)} rounds")


if __name__ == "__main__":
    main()
