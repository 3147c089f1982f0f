"""Per-piece timing attribution for one IP iteration (VERDICT r3 #6).

Times the solver's jitted compute pieces individually — residuals+Jacobians
(eval_point), exact Hessian, L-BFGS materialization, dense-Cholesky KKT
direction, structured (Woodbury + block-tridiagonal) KKT direction, the
line-search trial evaluation, and the KKT error — at a representative
warm-started point of the full example mesh, plus the same pieces vmapped
over a dispersion batch.  This is the table that decides whether Pallas
work on any piece is justified (TODO-NEXT #4) and what the f64-emulation
tax actually costs on the TPU.

Usage (device = whatever jax resolves; force CPU with a fresh subprocess,
see TODO-NEXT.md):

    python scripts/profile_attribution.py [--batch 32] [--reps 10]

Prints a markdown table to stdout.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def _median_time(fn, args, reps, warmups=2):
    """Median wall-clock of fn(*args) with block_until_ready, in ms."""
    for _ in range(warmups):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="also profile a B-lane vmapped iteration")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig
    from gelato_tpu.solver.ip import (IPOptions, init_state, make_pieces,
                                      relaxed_bounds, scale_funcs,
                                      _lbfgs_matrix_device)
    from gelato_tpu.solver.lowrank import lbfgs_factors
    from gelato_tpu.solver.warm_start import load_state, apply_warm

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev})", file=sys.stderr, flush=True)

    mission = load_mission("/root/reference/example/example-settings.json")
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem))
    funcs = problem.solver_funcs(structured=True, z0=z0)
    struct_meta = funcs.get("struct_meta")
    lb, ub = problem.bounds()
    opts = IPOptions(mu_init=1.0e-3, hessian="lbfgs", kkt_method="struct")
    funcs_s, _ = scale_funcs(funcs, z0, opts.scale_max, ())
    lbr, ubr = relaxed_bounds(jnp.asarray(lb), jnp.asarray(ub), opts)
    pieces = make_pieces(funcs_s, lbr, ubr, opts, struct_meta=struct_meta)

    st = init_state(funcs_s, z0, lbr, ubr, opts, ())
    warm = load_state(os.path.join(os.path.dirname(__file__), "..", "tests",
                                   "data", "example_full_solved.npz"))
    st = apply_warm(st, warm)
    aux = ()
    mu = st.mu

    n = st.z.shape[0]
    # synthetic-but-plausible L-BFGS ring (what a mid-solve iterate carries)
    mem = opts.lbfgs_memory
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.normal(size=(mem, n)) * 1e-3)
    Y = jnp.asarray(rng.normal(size=(mem, n)) * 1e-3 + 0.1 * np.asarray(S))
    count = jnp.asarray(mem, jnp.int64)

    f, g, cE, cI, JE, JI = pieces["eval_point"](st.z, aux)
    jax.block_until_ready((g, JE, JI))
    W = _lbfgs_matrix_device(S, Y, count)
    sVc = lbfgs_factors(S, Y, count)
    jax.block_until_ready((W, sVc))

    rows = []

    def add(name, fn, fargs):
        ms = _median_time(fn, fargs, args.reps)
        rows.append((name, ms))
        print(f"  {name}: {ms:.1f} ms", file=sys.stderr, flush=True)

    add("eval_point (residuals + AD Jacobians)", pieces["eval_point"],
        (st.z, aux))
    add("errors (scaled KKT norms)", pieces["errors"],
        (st, g, cE, cI, JE, JI))
    add("L-BFGS materialize (dense W)",
        jax.jit(_lbfgs_matrix_device), (S, Y, count))
    add("L-BFGS factors (sigma, V, c)", jax.jit(lbfgs_factors),
        (S, Y, count))
    add("direction: dense chol KKT", pieces["direction"],
        (st, g, cE, cI, JE, JI, W, mu))
    add("direction: struct KKT", pieces["direction_struct"],
        (st, g, cE, cI, JE, JI, sVc, mu))
    add("exact Lagrangian Hessian (AD)", pieces["eval_hess"],
        (st.z, st.yE, st.lam, aux))
    d = pieces["direction_struct"](st, g, cE, cI, JE, JI, sVc, mu)
    add("trial (one line-search point)", pieces["trial"],
        (st.z, st.s, d["dz"], d["ds"], jnp.asarray(0.5), mu, aux))
    add("apply_step", pieces["apply_step"],
        (st, {k: d[k] for k in ("dz", "ds", "dyE", "dlam", "dzL", "dzU",
                                "alpha_dual")},
         jnp.asarray(0.5), jnp.asarray(True), mu, st.err0))

    total = sum(ms for _, ms in rows[:2]) + rows[4][1] + rows[7][1] + rows[8][1]
    print(f"\n### Timing attribution ({dev.platform}, n={n}, "
          f"mE={cE.shape[0]}, mI={cI.shape[0]}, reps={args.reps})\n")
    print("| piece | median ms | % of (eval+err+chol-dir+trial+apply) |")
    print("|---|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.1f} | {100.0 * ms / total:.0f}% |")

    if args.batch:
        B = args.batch
        from gelato_tpu.batch import wind_dispersion_batch

        zb, cases = wind_dispersion_batch(problem, B)
        stb = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape) if hasattr(
                x, "shape") else x, st)
        ep_b = jax.jit(jax.vmap(pieces["raw"]["eval_point"]))
        ds_b = jax.jit(jax.vmap(
            pieces["raw"]["direction_struct"],
            in_axes=(0, 0, 0, 0, 0, 0, None, None)))
        out = ep_b(stb.z, cases)
        jax.block_until_ready(out)
        fB, gB, cEB, cIB, JEB, JIB = out
        ms_ep = _median_time(ep_b, (stb.z, cases), args.reps)
        ms_dir = _median_time(
            ds_b, (stb, gB, cEB, cIB, JEB, JIB, sVc, mu), args.reps)
        print(f"\n| batched piece (B={B}) | median ms | ms/lane |")
        print("|---|---|---|")
        print(f"| eval_point vmapped | {ms_ep:.1f} | {ms_ep / B:.2f} |")
        print(f"| direction_struct vmapped | {ms_dir:.1f} | {ms_dir / B:.2f} |")


if __name__ == "__main__":
    main()
