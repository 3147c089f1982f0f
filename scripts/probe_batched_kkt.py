"""Bisect the on-chip batch kernel fault: is vmapped KKT linalg the trigger?

Round-4 finding (PERF.md "on-chip dispersion batch"): any
``lax.scan(vmap(fused_step))`` program faults the TPU worker at its first
dispatch (B=32 dense KKT in round 2; B=32 and B=8 struct KKT in round 4),
while the SAME program runs on CPU and the unbatched scan runs fine on TPU
for hundreds of iterations.  The prime suspect is batched linalg
(``vmap(lax.linalg.cholesky / triangular_solve)`` on f64-emulated operands)
— the only structural difference between the fused step's batched and
unbatched lowerings that the small, linalg-free vmapped programs
(``state0``, the lane-θ overlay) don't contain.

This probe compiles and dispatches each piece of one IP iteration,
**vmapped at B lanes**, in isolation, cheapest first:

    python scripts/probe_batched_kkt.py [--batch 8] [--skip-dense]

Each piece prints ok/FAULT; a worker crash raises JaxRuntimeError
(UNAVAILABLE) which is caught and reported — the worker self-restarts, so
later pieces still run (after a reconnect the process must be restarted;
we therefore order pieces so the expected faulter runs LAST unless
--first is given).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pieces", default="eval,errors,trial,dir_struct",
                    help="comma list: eval,errors,trial,dir_struct,"
                         "dir_dense,dir_sdense,dir_sdense32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gelato_tpu  # noqa: F401  (x64 + compile cache config)
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig
    from gelato_tpu.solver.ip import (IPOptions, init_state, make_pieces,
                                      relaxed_bounds, scale_funcs)
    from gelato_tpu.solver.lowrank import lbfgs_factors
    from gelato_tpu.solver.warm_start import load_state, apply_warm

    dev = jax.devices()[0]
    print(f"probe: device {dev.platform} ({dev}), B={args.batch}",
          flush=True)

    mission = load_mission(
        "/root/reference/example/example-settings.json"
        if os.path.exists("/root/reference/example/example-settings.json")
        else os.path.join(os.path.dirname(__file__), "..", "examples",
                          "example-settings.json"))
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem))
    funcs = problem.solver_funcs(structured=True, z0=z0)
    lb, ub = problem.bounds()
    opts = IPOptions(mu_init=1.0e-3, hessian="lbfgs", kkt_method="struct")
    funcs_s, _ = scale_funcs(funcs, z0, opts.scale_max, ())
    lbr, ubr = relaxed_bounds(jnp.asarray(lb), jnp.asarray(ub), opts)
    pieces = make_pieces(funcs_s, lbr, ubr, opts,
                         struct_meta=funcs.get("struct_meta"))

    st = init_state(funcs_s, z0, lbr, ubr, opts, ())
    warm = load_state(os.path.join(os.path.dirname(__file__), "..", "tests",
                                   "data", "example_full_solved.npz"))
    if warm is not None:
        st = apply_warm(st, warm)
    B = args.batch
    n = st.z.shape[0]
    rng = np.random.default_rng(0)

    # batch the state by tiling + a tiny primal perturbation per lane
    def tileB(x):
        x = jnp.asarray(x)
        return jnp.broadcast_to(x, (B,) + x.shape)

    zB = jnp.asarray(np.tile(np.asarray(st.z), (B, 1))
                     + 1e-9 * rng.normal(size=(B, n)))
    aux = ()

    mem = opts.lbfgs_memory
    S = jnp.asarray(rng.normal(size=(mem, n)) * 1e-3)
    Y = jnp.asarray(rng.normal(size=(mem, n)) * 1e-3 + 0.1 * np.asarray(S))
    sVc = lbfgs_factors(S, Y, jnp.asarray(mem, jnp.int64))

    f, g, cE, cI, JE, JI = pieces["eval_point"](st.z, aux)
    gB, cEB, cIB = tileB(g), tileB(cE), tileB(cI)
    JEB, JIB = tileB(JE), tileB(JI)
    stB = jax.tree.map(tileB, st)

    def run(name, fn, fargs):
        t0 = time.time()
        try:
            out = jax.block_until_ready(fn(*fargs))
            dt = time.time() - t0
            for _ in range(args.reps - 1):
                t1 = time.time()
                out = jax.block_until_ready(fn(*fargs))
            print(f"probe: {name}: ok "
                  f"(first {dt:.1f}s incl compile, "
                  f"steady {time.time() - t1:.2f}s)", flush=True)
            return True
        except Exception as e:  # noqa: BLE001 — report the fault and stop
            print(f"probe: {name}: FAULT after {time.time() - t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            return False

    want = args.pieces.split(",")
    table = {
        "eval": ("vmap eval_point (residuals+Jacobians)",
                 jax.jit(jax.vmap(pieces["eval_point"],
                                  in_axes=(0, None))), (zB, aux)),
        "errors": ("vmap errors (KKT norms)",
                   jax.jit(jax.vmap(pieces["errors"])),
                   (stB, gB, cEB, cIB, JEB, JIB)),
        "trial": ("vmap trial (line-search point)",
                  jax.jit(jax.vmap(pieces["trial"],
                                   in_axes=(0, 0, 0, 0, None, None, None))),
                  (zB, stB.s, gB, tileB(cI) * 0, jnp.asarray(0.5), stB.mu[0],
                   aux)),
        "dir_struct": ("vmap direction_struct (block-tridiag KKT)",
                       jax.jit(jax.vmap(
                           pieces["direction_struct"],
                           in_axes=(0, 0, 0, 0, 0, 0, None, None))),
                       (stB, gB, cEB, cIB, JEB, JIB, sVc, stB.mu[0])),
        "dir_dense": ("vmap direction (dense chol KKT)",
                      jax.jit(jax.vmap(
                          pieces["direction"],
                          in_axes=(0, 0, 0, 0, 0, 0, None, None))),
                      (stB, gB, cEB, cIB, JEB, JIB,
                       tileB(jnp.zeros((n, n))), stB.mu[0])),
    }

    # dense-Schur sweep variants of the struct direction (round-5 kernel
    # work: one batched MXU Cholesky of T̂ instead of the scan-over-sections
    # sweep; optionally fp32 factor + fp64 refinement)
    pieces_sd = make_pieces(funcs_s, lbr, ubr,
                            opts._replace(struct_sweep="dense"),
                            struct_meta=funcs.get("struct_meta"))
    pieces_sd32 = make_pieces(
        funcs_s, lbr, ubr,
        opts._replace(struct_sweep="dense",
                      struct_factor_dtype="float32", kkt_refine=2),
        struct_meta=funcs.get("struct_meta"))
    table["dir_sdense"] = (
        "vmap direction_struct dense-sweep f64 (batched MXU chol)",
        jax.jit(jax.vmap(pieces_sd["raw"]["direction_struct"],
                         in_axes=(0, 0, 0, 0, 0, 0, None, None))),
        (stB, gB, cEB, cIB, JEB, JIB, sVc, stB.mu[0]))
    table["dir_sdense32"] = (
        "vmap direction_struct dense-sweep f32 factor + f64 refine",
        jax.jit(jax.vmap(pieces_sd32["raw"]["direction_struct"],
                         in_axes=(0, 0, 0, 0, 0, 0, None, None))),
        (stB, gB, cEB, cIB, JEB, JIB, sVc, stB.mu[0]))

    def retry_loop_lane(st1, g1, cE1, cI1, JE1, JI1):
        """A data-dependent bounded while_loop AROUND the struct direction —
        the same composition shape as the fused step's inertia-retry loop
        (ip.py run_retry): under vmap this lowers to a batched-predicate
        while whose body contains the linalg, a code path none of the
        isolated piece probes exercise."""
        def cond(c):
            k, nrm = c
            return (k < 3) & (nrm < 1.0e30)

        def body(c):
            k, _ = c
            d = pieces["direction_struct"](st1, g1, cE1, cI1, JE1, JI1,
                                           sVc, st1.mu)
            return k + 1, jnp.linalg.norm(d["dz"]) + 0.0 * k

        return jax.lax.while_loop(cond, body, (jnp.asarray(0), jnp.asarray(0.0)))[1]

    table["retry_loop"] = (
        "vmap while_loop(direction_struct) (inertia-retry shape)",
        jax.jit(jax.vmap(retry_loop_lane)),
        (stB, gB, cEB, cIB, JEB, JIB))
    for key in want:
        name, fn, fargs = table[key]
        if not run(name, fn, fargs):
            print("probe: stopping — worker needs a restart window",
                  flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
