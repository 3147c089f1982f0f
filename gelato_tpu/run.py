"""CLI driver: ``python -m gelato_tpu.run settings.json``.

End-to-end equivalent of ``python3 Trajectory_Optimization.py settings.json``
(/root/reference/Trajectory_Optimization.py): load mission, build the NLP,
generate the initial guess, solve on-device, and write
``output/<name>-optResult.txt`` + ``output/<name>-trajectoryResult.csv``.
"""

import argparse
import importlib.util
import os
import sys
import time

import numpy as np


def load_user_constraints(mission, settings_path):
    """Import user_constraints.py next to the settings file, if present.

    Two plug-in dialects are accepted:

    * **native**: JAX-traceable ``equality_user(ctx)`` /
      ``inequality_user(ctx)`` taking a
      :class:`gelato_tpu.problem.UserContext`;
    * **reference-style**: GELATO's 4-argument
      ``equality_user(xdict, pdict, unitdict, condition)`` files
      (/root/reference/example/user_constraints.py) run unmodified through
      :mod:`gelato_tpu.compat` — including their ``lib.*_c`` imports, which
      resolve to the JAX ops so the plug-in's Jacobian comes from AD.
    """
    import inspect

    from .compat import adapt_reference_user_module

    path = os.path.join(os.path.dirname(os.path.abspath(settings_path)),
                        "user_constraints.py")
    if not os.path.exists(path):
        return None, None
    try:
        spec = importlib.util.spec_from_file_location("user_constraints", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        eq = getattr(mod, "equality_user", None)
        ineq = getattr(mod, "inequality_user", None)
        n_args = max(
            (len(inspect.signature(f).parameters) for f in (eq, ineq) if f),
            default=0)
        if n_args >= 4:  # reference dialect declared via its signature
            return adapt_reference_user_module(path)
        return eq, ineq
    except Exception:  # noqa: BLE001 - e.g. a top-level `import lib.*_c`
        try:
            return adapt_reference_user_module(path)
        except Exception as e:  # noqa: BLE001
            print(f"WARNING: could not load {path} ({e}); continuing "
                  f"without user constraints.")
            return None, None


def main(argv=None):
    parser = argparse.ArgumentParser(description="GELATO-TPU trajectory optimizer")
    parser.add_argument("settings", help="mission settings JSON")
    parser.add_argument("--output-dir", default="output")
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--tol", type=float, default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--warm-start", default=None,
                        help="primal-dual state file from a previous solve")
    parser.add_argument("--colored-jacobian", action="store_true",
                        help="compress constraint Jacobians by distance-2 "
                             "column coloring (12x fewer AD tangents on the "
                             "example mission)")
    parser.add_argument("--kkt", default=None,
                        choices=["chol", "lu", "struct"],
                        help="KKT factorization: condensed dense Cholesky "
                             "(default), dense LU, or the structured "
                             "Woodbury + block-tridiagonal solver")
    parser.add_argument("--hessian", default=None,
                        choices=["lbfgs", "exact", "hybrid"],
                        help="Lagrangian Hessian mode (hybrid = L-BFGS with "
                             "an exact-Newton endgame)")
    parser.add_argument("--refine", type=int, default=0, metavar="ROUNDS",
                        help="h-refinement: after solving, estimate the "
                             "per-section defect error of the interpolant, "
                             "double the nodes of sections over --refine-tol "
                             "and re-solve (up to ROUNDS times)")
    parser.add_argument("--refine-tol", type=float, default=1e-7)
    parser.add_argument("--save-state", default=None,
                        help="write the final primal-dual state here")
    args = parser.parse_args(argv)

    if args.cpu and os.environ.get("PALLAS_AXON_POOL_IPS"):
        # remote-accelerator plugin environments hook JAX backend resolution
        # at interpreter start; a clean re-exec is the only reliable way to
        # honor --cpu there (same pattern as __graft_entry__.dryrun_multichip)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in (pkg_root, env.get("PYTHONPATH")) if p)
        os.execve(sys.executable,
                  [sys.executable, "-m", "gelato_tpu.run"] + list(sys.argv[1:]),
                  env)

    import jax

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from .config import load_mission
    from .problem import Problem
    from . import initial_guess as ig
    from .solver import solve, solve_device, IPOptions
    from .solver.linalg import runs_on_cpu
    from .solver.warm_start import load_state, save_state
    from .output import output_result, result_summary

    mission = load_mission(args.settings)
    eq_user, ineq_user = load_user_constraints(mission, args.settings)
    problem = Problem(mission, user_equality=eq_user, user_inequality=ineq_user)

    print(f"GELATO-TPU | mission: {mission.name} | sections: {mission.num_sections} "
          f"| N={problem.N} M={problem.M} vars={problem.n_z}")

    z0 = ig.initial_guess(problem)

    # solver options: accept the reference's IPOPT block for tol/max_iter
    ipopt_opts = mission.solver_options.get("IPOPT", {})
    gip_opts = mission.solver_options.get("GIP", {})
    tol = args.tol or gip_opts.get("tol") or ipopt_opts.get("tol", 1e-6)
    max_iter = args.max_iter or gip_opts.get("max_iter") or ipopt_opts.get("max_iter", 3000)
    # initial guesses (file interpolation or forward sim) are near-feasible,
    # so start with a small barrier (warm-start practice)
    opts = IPOptions(tol=tol, max_iter=int(max_iter),
                     mu_init=float(gip_opts.get("mu_init", 1e-3)),
                     lbfgs_memory=int(gip_opts.get("lbfgs_memory", 20)),
                     hessian=args.hessian or gip_opts.get("hessian", "lbfgs"),
                     kkt_method=args.kkt or gip_opts.get("kkt_method",
                                                         "chol"),
                     mu_strategy=gip_opts.get("mu_strategy", "monotone"),
                     mu_force_after=int(gip_opts.get("mu_force_after", 0)))

    funcs = problem.solver_funcs(colored=args.colored_jacobian,
                                 structured=opts.kkt_method == "struct",
                                 z0=z0)
    if args.colored_jacobian:
        ci = funcs["coloring_info"]
        print(f"colored Jacobians: eq {ci['eq']['n_colors']}/{problem.n_z} "
              f"seeds, ineq {ci['ineq']['n_colors']}/{problem.n_z}")
    lb, ub = problem.bounds()

    warm = load_state(args.warm_start) if args.warm_start else None

    t0 = time.time()
    last = [t0]

    def cb(k, st):
        if time.time() - last[0] > 5.0 or k < 3:
            last[0] = time.time()
            print(f"  it={k:4d}  mu={float(st.mu):9.2e}  err={float(st.err0):9.3e}  "
                  f"alpha={float(st.alpha):8.2e}  "
                  f"obj={float(problem.objective(st.z)):.6f}",
                  flush=True)

    if (runs_on_cpu() or warm is not None) and opts.kkt_method != "struct":
        # host-driven loop: filter memory + SOC + warm start support
        # (the structured KKT lives in the fused path only)
        st, info = solve(funcs, z0, lb, ub, opts, callback=cb, warm=warm)
    else:
        # accelerator: chunked fused iterations (one dispatch per ~40 iters)
        def cb_chunk(k, ipst):
            print(f"  chunk={k:3d}  it={int(ipst.it):5d}  mu={float(ipst.mu):9.2e}  "
                  f"err={float(ipst.err0):9.3e}", flush=True)
        st, info = solve_device(funcs, z0, lb, ub, opts, chunk=40,
                                callback=cb_chunk, warm=warm)
    info["optTime"] = time.time() - t0

    if args.refine > 0:
        # h-refinement rounds: estimate → refine → transfer → re-solve
        # (SURVEY §5 long-context analogue; the reference has no equivalent)
        from .refine import (section_defect_errors, refine_num_nodes,
                             interp_solution)

        z_cur = np.asarray(st.z)
        for rnd in range(args.refine):
            errors = section_defect_errors(problem, z_cur)
            print(f"h-refine round {rnd}: max section defect "
                  f"{errors.max():.3e} (tol {args.refine_tol:g})")
            new_nodes = refine_num_nodes(problem.ps.num_nodes, errors,
                                         args.refine_tol)
            if (new_nodes == np.asarray(problem.ps.num_nodes)).all():
                print("h-refine: mesh converged")
                break
            mission.events.num_nodes = np.append(
                new_nodes, mission.events.num_nodes[-1])
            new_problem = Problem(mission, user_equality=eq_user,
                                  user_inequality=ineq_user)
            z_cur = interp_solution(problem, z_cur, new_problem)
            problem = new_problem
            print(f"h-refine: new mesh {[int(n) for n in new_nodes]} "
                  f"({problem.n_z} vars)")
            funcs = problem.solver_funcs(
                colored=args.colored_jacobian,
                structured=opts.kkt_method == "struct", z0=z_cur)
            lb, ub = problem.bounds()
            st, info = solve_device(funcs, z_cur, lb, ub, opts, chunk=40)
            z_cur = np.asarray(st.z)
            info["optTime"] = time.time() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    if args.save_state:
        save_state(args.save_state, st)

    lines = result_summary(problem, st.z, info, args.settings)
    print("".join(lines[1:]))
    with open(os.path.join(args.output_dir, f"{mission.name}-optResult.txt"), "w") as f:
        f.write("".join(lines))

    df = output_result(problem, np.asarray(st.z))
    csv_path = os.path.join(args.output_dir, f"{mission.name}-trajectoryResult.csv")
    df.to_csv(csv_path, index=False)
    print(f"trajectory written to {csv_path}")
    return 0 if info["converged"] else 1


if __name__ == "__main__":
    sys.exit(main())
