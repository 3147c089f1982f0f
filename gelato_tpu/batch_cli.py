"""Batch driver: ``python -m gelato_tpu.batch_cli <dir>`` runs every
settings JSON in a directory.

Replaces /root/reference/run_batch.sh:75-79.  Unlike the reference's serial
shell loop, missions that share a structure can also be dispatched as one
vmapped on-device batch (see gelato_tpu.batch); this CLI covers the
heterogeneous case — each JSON gets its own compiled solve, continuing to the
next case on failure exactly like the reference.
"""

import argparse
import glob
import os
import sys
import traceback


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", help="directory containing *.json missions")
    parser.add_argument("--output-dir", default="output")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    from .run import main as run_one

    cases = sorted(glob.glob(os.path.join(args.directory, "*.json")))
    if not cases:
        print(f"no *.json missions found in {args.directory}")
        return 1
    failures = 0
    for case in cases:
        print(f"=== {case} ===", flush=True)
        try:
            argv_one = [case, "--output-dir", args.output_dir]
            if args.cpu:
                argv_one.append("--cpu")
            rc = run_one(argv_one)
            failures += int(rc != 0)
        except Exception:  # noqa: BLE001 - parity with run_batch.sh (continue)
            traceback.print_exc()
            failures += 1
    print(f"batch finished: {len(cases) - failures}/{len(cases)} succeeded")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
