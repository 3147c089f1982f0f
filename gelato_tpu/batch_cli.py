"""Batch driver: ``python -m gelato_tpu.batch_cli <dir-or-s3-uri>`` runs
every settings JSON in a directory.

Replaces /root/reference/run_batch.sh.  Unlike the reference's serial shell
loop, missions that share a structure can also be dispatched as one vmapped
on-device batch (see gelato_tpu.batch); this CLI covers the heterogeneous
case — each JSON gets its own compiled solve, continuing to the next case on
failure exactly like the reference (run_batch.sh:75-79).

Like the reference, the input may be an ``s3://`` URI
(run_batch.sh:36-66): inputs are staged into a temporary sandbox through
the AWS CLI (existence-checked with ``aws s3 ls``, downloaded with
``aws s3 cp --recursive --exclude "output*"``), each mission runs inside
the sandbox (so relative file pointers and a staged ``user_constraints.py``
resolve exactly as the reference's temp-dir execution does), and the
``output/`` directory is pushed back to ``<uri>/output`` afterwards.  The
transport binary defaults to ``aws`` and can be overridden with the
``GELATO_AWS_CLI`` environment variable (used by the tests to exercise the
staging protocol without network access; this zero-egress environment has
no real AWS CLI).
"""

import argparse
import glob
import os
import shutil
import subprocess
import sys
import tempfile
import traceback


class StagingError(RuntimeError):
    """Raised when an s3:// transfer fails or the transport is missing."""


def _aws_cli():
    """Resolve the S3 transport binary (override: GELATO_AWS_CLI)."""
    cli = os.environ.get("GELATO_AWS_CLI", "aws")
    path = shutil.which(cli)
    if path is None:
        raise StagingError(
            f"s3:// input requires the '{cli}' CLI, which is not on PATH "
            "(set GELATO_AWS_CLI to an alternative transport)")
    return path


def _run_aws(args, timeout=300):
    cli = _aws_cli()
    proc = subprocess.run([cli] + args, timeout=timeout,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)
    return proc


def stage_in(uri, workdir):
    """Download ``uri`` (s3://...) into ``workdir``, excluding output*.

    Mirrors run_batch.sh:36-56: existence check first (clear error instead
    of an empty sandbox), then a recursive copy that skips any previous
    results.
    """
    probe = _run_aws(["s3", "ls", uri.rstrip("/") + "/"], timeout=60)
    if probe.returncode != 0:
        raise StagingError(
            f"S3 path does not exist or is not accessible: {uri}\n"
            f"{probe.stdout}")
    pull = _run_aws(["s3", "cp", uri, workdir, "--recursive",
                     "--exclude", "output*"])
    if pull.returncode != 0:
        raise StagingError(f"download from {uri} failed:\n{pull.stdout}")


def stage_out(workdir_output, uri):
    """Upload the sandbox's output/ back to ``<uri>/output``
    (run_batch.sh:82-90)."""
    push = _run_aws(["s3", "cp", workdir_output,
                     uri.rstrip("/") + "/output", "--recursive"])
    if push.returncode != 0:
        raise StagingError(f"upload to {uri}/output failed:\n{push.stdout}")


def run_directory(directory, output_dir, cpu=False, runner=None,
                  extra_args=()):
    """Run every *.json mission in a local directory, continue-on-failure.

    Returns (n_cases, n_failures).  ``runner`` is injectable for tests.
    """
    if runner is None:
        from .run import main as runner

    cases = sorted(glob.glob(os.path.join(directory, "*.json")))
    failures = 0
    for case in cases:
        print(f"=== {case} ===", flush=True)
        try:
            argv_one = [case, "--output-dir", output_dir]
            if cpu:
                argv_one.append("--cpu")
            argv_one.extend(extra_args)
            rc = runner(argv_one)
            failures += int(rc != 0)
        except Exception:  # noqa: BLE001 - parity with run_batch.sh (continue)
            traceback.print_exc()
            failures += 1
    return len(cases), failures


def main(argv=None, runner=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("directory",
                        help="directory (or s3:// URI) containing *.json "
                             "missions")
    parser.add_argument("--output-dir", default="output")
    parser.add_argument("--cpu", action="store_true")
    args, extra = parser.parse_known_args(argv)

    if args.directory.startswith("s3://"):
        with tempfile.TemporaryDirectory(prefix="gelato_batch_") as sandbox:
            try:
                stage_in(args.directory, sandbox)
            except StagingError as exc:
                print(f"staging error: {exc}", file=sys.stderr)
                return 1
            out_dir = os.path.join(sandbox, "output")
            os.makedirs(out_dir, exist_ok=True)
            n, failures = run_directory(sandbox, out_dir, cpu=args.cpu,
                                        runner=runner, extra_args=extra)
            if n == 0:
                print(f"no *.json missions found in {args.directory}")
                return 1
            try:
                stage_out(out_dir, args.directory)
            except StagingError as exc:
                print(f"staging error: {exc}", file=sys.stderr)
                return 1
    else:
        n, failures = run_directory(args.directory, args.output_dir,
                                    cpu=args.cpu, runner=runner,
                                    extra_args=extra)
        if n == 0:
            print(f"no *.json missions found in {args.directory}")
            return 1
    print(f"batch finished: {n - failures}/{n} succeeded")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
