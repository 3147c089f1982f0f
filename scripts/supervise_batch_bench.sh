#!/bin/bash
# Self-healing launcher for the dispersion-batch bench (BASELINE target #2).
#
# The remote-TPU tunnel can die mid-run: the client RPC never times out, so
# the bench process sleeps forever at ~0 CPU while new connections work fine
# (observed twice on 2026-08-20 alone).  This supervisor watches the bench
# log's mtime — solve_batch_scan prints a heartbeat every chunk (~70 s at
# B=8), so a silent log means a hung RPC, not slow work.  The one legitimate
# silent phase is the first warm-up dispatch (remote executable load,
# ~900 s measured), detected by the log tail still being at "loop prebuilt".
#
# Usage: scripts/supervise_batch_bench.sh [logfile] [max_attempts]
set -u
LOG="${1:-/tmp/batch_bench_supervised.log}"
MAX_ATTEMPTS="${2:-4}"
STALL_FAST=400     # s without log progress in a heartbeat phase => hung
STALL_LOAD=1200    # s allowance while the remote executable loads
PIDFILE="/tmp/batch_bench_supervised.pid"

# a cold jax init over the tunnel was measured at 132 s — a 75-s probe
# misclassifies a healthy-but-slow tunnel as down (ADVICE r4)
probe_tunnel() {
    timeout 160 python -c \
        "import jax, jax.numpy as j; j.ones(4).sum().block_until_ready()" \
        >/dev/null 2>&1
}

launch() {
    : > "$LOG"
    # inner budget stays BELOW the outer `timeout 6500` so the bench
    # self-limits and emits its final JSON line before the external
    # SIGTERM (ADVICE r4: the old 7200-s default outlived the kill)
    env GELATO_BENCH_BATCH="${GELATO_BENCH_BATCH:-8}" \
        GELATO_BENCH_BATCH_LANES="${GELATO_BENCH_BATCH_LANES:-8}" \
        GELATO_BENCH_BATCH_CHUNK="${GELATO_BENCH_BATCH_CHUNK:-10}" \
        GELATO_BENCH_TOTAL="${GELATO_BENCH_TOTAL:-6300}" \
        timeout 6500 python bench.py >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
    echo "supervisor: attempt $attempt/$MAX_ATTEMPTS at $(date +%H:%M:%S)"
    # bounded tunnel-wait: probe failures count toward the attempt budget
    # instead of spinning forever on a dead tunnel (ADVICE r4)
    tunnel_ok=0
    for probe_try in $(seq 1 12); do
        if probe_tunnel; then tunnel_ok=1; break; fi
        echo "supervisor: tunnel down (probe $probe_try/12), waiting 45s"
        sleep 45
    done
    if [ "$tunnel_ok" -ne 1 ]; then
        echo "supervisor: tunnel never came back — counting attempt $attempt"
        continue
    fi
    launch
    PID=$(cat "$PIDFILE")
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        now=$(date +%s)
        mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
        age=$((now - mt))
        # every warm-up-phase line keeps the generous allowance: the remote
        # toolchain can re-pay executable deserialization (889 s measured)
        # on a LATER warm-up dispatch, not only the first (ADVICE r4)
        if tail -1 "$LOG" | grep -Eq "loop prebuilt|warm-up chunk|cache canary"; then
            allow=$STALL_LOAD
        else
            allow=$STALL_FAST
        fi
        if [ "$age" -gt "$allow" ]; then
            echo "supervisor: log silent ${age}s (> ${allow}s) — killing $PID"
            kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
            break
        fi
    done
    wait "$PID" 2>/dev/null
    if grep -q '"metric": "dispersion_batch_wall_clock"' "$LOG"; then
        echo "supervisor: batch metric landed (attempt $attempt)"
        exit 0
    fi
    echo "supervisor: attempt $attempt ended without the batch metric"
done
echo "supervisor: exhausted $MAX_ATTEMPTS attempts"
exit 1
