"""Round-start persistent-cache integrity guard (VERDICT r4 next-step #6).

Answers, WITHOUT compiling anything: "if bench.py ran right now, would its
load-bearing jitted programs hit the committed persistent compile cache?"
Rounds 2-4 each lost the driver benchmark to a silent cache miss — the
committed cache had drifted from the current source and the first dispatch
paid a fresh ~30-70 min remote XLA compile (VERDICT r4 missing #1).  This
guard traces/lowers the exact programs bench.py dispatches (host-side only;
zero device dispatches) and classifies each against the cache via
``gelato_tpu.solver.cache_probe``.

Usage::

    python scripts/cache_guard.py            # probe single-case + batch
    python scripts/cache_guard.py --single   # single-case only
    python scripts/cache_guard.py --batch    # batch only

Exit status: 0 = every probed program is warm ("hit" or "inmem");
1 = at least one MISS (a driver bench would pay a fresh compile — re-warm
and re-commit xla_cache before round end); 2 = probe machinery error.

The reference has no analogue: its C++ is AOT-compiled once by CMake
(/root/reference/CMakeLists.txt) — this subsystem exists because the TPU
rebuild's JIT model moves the compile to first dispatch.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_cfg():
    # identical resolution order to bench._load_config (incl. env overrides)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    return bench._load_config()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--batch", action="store_true")
    args = ap.parse_args()
    do_single = args.single or not args.batch
    do_batch = args.batch or not args.single

    t0 = time.time()
    import jax

    import bench
    from gelato_tpu.solver import prebuild_device_loop
    from gelato_tpu.solver.cache_probe import abstract_state, probe_jit

    cfg = _bench_cfg()
    problem, z0, funcs = bench._build(cfg)
    lb, ub = problem.bounds()
    print(f"cache_guard: problem built in {time.time() - t0:.1f}s "
          f"(backend {jax.default_backend()})", file=sys.stderr, flush=True)

    results = {}

    if do_single:
        run_chunk, state0 = prebuild_device_loop(
            funcs, lb, ub, bench._opts(cfg), z0_scale_ref=z0,
            chunk=int(cfg["chunk"]))
        fst = abstract_state(state0, z0)
        status, key = probe_jit(run_chunk, fst, ())
        results["single_run_chunk"] = {"status": status, "key": key}

    if do_batch:
        import numpy as np

        from gelato_tpu.batch import prebuild_batch_loop, wind_dispersion_batch

        bcfg = dict(cfg)
        bcfg.update(cfg.get("batch_overrides", {}))
        lanes = int(os.environ.get("GELATO_BENCH_BATCH_LANES",
                                   bcfg.get("batch_lanes", 8)))
        bchunk = int(os.environ.get("GELATO_BENCH_BATCH_CHUNK",
                                    bcfg.get("batch_chunk", bcfg["chunk"])))
        bopts = bench._opts(bcfg,
                            max_iter=int(bcfg.get("batch_max_iter", 1500)))
        zb, cases = wind_dispersion_batch(problem, lanes)
        run_chunk_b, state0_b = prebuild_batch_loop(
            problem, bopts, chunk=bchunk, z0_ref=z0,
            colored=bool(bcfg["colored"]))
        zb_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            np.asarray(zb))
        cases_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            cases)
        states_abs = jax.eval_shape(jax.vmap(state0_b), zb_abs, cases_abs)
        status, key = probe_jit(run_chunk_b, states_abs, cases_abs)
        results["batch_run_chunk"] = {
            "status": status, "key": key, "lanes": lanes, "chunk": bchunk}

    warm = all(r["status"] in ("hit", "inmem") for r in results.values())
    err = any(r["status"] == "error" for r in results.values())
    print(json.dumps({
        "guard": "xla_cache_integrity",
        "warm": warm,
        "cache_dir": jax.config.jax_compilation_cache_dir,
        "backend": jax.default_backend(),
        "elapsed_s": round(time.time() - t0, 1),
        "programs": results,
    }), flush=True)
    return 2 if err else (0 if warm else 1)


if __name__ == "__main__":
    sys.exit(main())
