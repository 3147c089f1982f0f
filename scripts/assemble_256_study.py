"""Assemble the round-5 256-case dispersion study from its two runs.

The study ran as one deterministic dispersion set (seed 0, 256 cases)
executed in two processes: cases 0-95 (first run, killed by a tunnel-RPC
hang mid-block-4; SIGTERM partial artifact) and cases 96-255 (resume run
via GELATO_BENCH_BATCH_SKIP=96).  This script merges the two captured
`dispersion_batch_wall_clock` lines into the combined 256-case record.
Wall-clocks are SUMMED (the runs were sequential on one chip), and the
combined record keeps both sources for auditability.
"""
import json
import sys

p1 = json.load(open("output/dispersion_batch_r5_256_part1.json"))
p2 = json.load(open(sys.argv[1] if len(sys.argv) > 1
                    else "output/dispersion_batch_r5_256_part2.json"))
n = p1["n_cases"] + p2["n_cases"]
wall = p1["value"] + p2["value"]
conv = p1["n_converged"] + p2["n_converged"]
base = 510.0
rec = {
    "metric": "dispersion_batch_wall_clock",
    "value": round(wall, 3),
    "unit": "s",
    "vs_baseline": round(n * base / wall, 3),
    "baseline_source": f"{n} x recorded_cpu_fused_round2 "
                       "(BASELINE.md IPOPT caveat)",
    "n_cases": n,
    "lanes": 32,
    "n_converged": conv,
    "s_per_case": round(wall / n, 3),
    "status": "combined:2 sequential runs, one dispersion set (seed 0); "
              "parts committed alongside",
}
json.dump(rec, open("output/dispersion_batch_r5_256.json", "w"))
print(json.dumps(rec))
