"""Batch CLI: local directory sweep + S3-staged sweep (run_batch.sh parity).

The reference's batch entry point pulls inputs from a local directory or an
s3:// URI, runs every settings JSON serially continuing on failure, and
pushes output/ back (/root/reference/run_batch.sh:36-99).  This environment
has no AWS CLI and no network, so the S3 protocol is exercised through a
fake ``aws`` executable (GELATO_AWS_CLI) that maps ``s3://<bucket>/<key>``
onto a local fixture tree — the staging logic under test (existence check,
recursive pull excluding output*, sandboxed run, recursive push of
output/) is exactly what would drive the real CLI.
"""

import json
import os
import stat
import sys

import pytest

from gelato_tpu import batch_cli

FAKE_AWS = r'''#!/usr/bin/env python3
"""Fake `aws` CLI: maps s3://<bucket>/<key> onto $FAKE_S3_ROOT/<bucket>/<key>.

Supports the three invocations the staging layer uses:
  aws s3 ls <uri>/
  aws s3 cp <uri> <dir> --recursive [--exclude PAT]
  aws s3 cp <dir> <uri> --recursive
"""
import fnmatch
import os
import shutil
import sys


def local(uri):
    assert uri.startswith("s3://"), uri
    return os.path.join(os.environ["FAKE_S3_ROOT"], uri[len("s3://"):])


def main():
    args = [a for a in sys.argv[1:]]
    assert args[0] == "s3", args
    cmd = args[1]
    if cmd == "ls":
        path = local(args[2].rstrip("/"))
        if not os.path.isdir(path):
            print(f"ls: not found: {args[2]}")
            return 1
        print("\n".join(sorted(os.listdir(path))))
        return 0
    assert cmd == "cp", args
    src, dst = args[2], args[3]
    assert "--recursive" in args, args
    exclude = None
    if "--exclude" in args:
        exclude = args[args.index("--exclude") + 1]
    if src.startswith("s3://"):
        src = local(src)
    if dst.startswith("s3://"):
        dst = local(dst)
    if not os.path.isdir(src):
        print(f"cp: not found: {src}")
        return 1
    for root, _dirs, files in os.walk(src):
        rel_root = os.path.relpath(root, src)
        if exclude and fnmatch.fnmatch(
                rel_root.split(os.sep)[0], exclude):
            continue
        for name in files:
            rel = os.path.normpath(os.path.join(rel_root, name))
            if exclude and fnmatch.fnmatch(rel, exclude):
                continue
            target = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            shutil.copy2(os.path.join(root, name), target)
    return 0


if __name__ == "__main__":
    sys.exit(main())
'''


@pytest.fixture
def fake_aws(tmp_path, monkeypatch):
    cli = tmp_path / "fake_aws"
    cli.write_text(FAKE_AWS)
    cli.chmod(cli.stat().st_mode | stat.S_IEXEC)
    root = tmp_path / "s3root"
    root.mkdir()
    monkeypatch.setenv("GELATO_AWS_CLI", str(cli))
    monkeypatch.setenv("FAKE_S3_ROOT", str(root))
    return root


def _toy_runner(record):
    """A runner that stands in for run.main: records calls, writes a result
    file into --output-dir, fails on missions named *bad*."""

    def runner(argv):
        settings = argv[0]
        out_dir = argv[argv.index("--output-dir") + 1]
        record.append(os.path.basename(settings))
        name = json.load(open(settings))["name"]
        with open(os.path.join(out_dir, f"{name}-optResult.txt"), "w") as f:
            f.write(f"solved {name}\n")
        return 1 if "bad" in name else 0

    return runner


def _make_missions(directory, names):
    os.makedirs(directory, exist_ok=True)
    for name in names:
        with open(os.path.join(directory, f"{name}.json"), "w") as f:
            json.dump({"name": name}, f)


def test_local_directory_continue_on_failure(tmp_path):
    missions = tmp_path / "missions"
    _make_missions(missions, ["a", "bad", "c"])
    out = tmp_path / "out"
    out.mkdir()
    calls = []
    rc = batch_cli.main([str(missions), "--output-dir", str(out)],
                        runner=_toy_runner(calls))
    # continue-on-failure: all three run, exit code reflects the failure
    assert calls == ["a.json", "bad.json", "c.json"]
    assert rc == 1
    assert (out / "a-optResult.txt").exists()
    assert (out / "c-optResult.txt").exists()


def test_s3_staged_batch_roundtrip(fake_aws):
    bucket = fake_aws / "bucket" / "missions"
    _make_missions(bucket, ["m1", "m2"])
    # a stale results dir in the bucket must NOT be pulled (exclude output*)
    (bucket / "output").mkdir()
    (bucket / "output" / "stale.txt").write_text("old")

    calls = []
    rc = batch_cli.main(["s3://bucket/missions"], runner=_toy_runner(calls))
    assert rc == 0
    assert sorted(calls) == ["m1.json", "m2.json"]
    # results pushed back to <uri>/output
    assert (bucket / "output" / "m1-optResult.txt").exists()
    assert (bucket / "output" / "m2-optResult.txt").exists()
    # the stale file was not re-run / duplicated into the sandbox results
    assert (bucket / "output" / "stale.txt").read_text() == "old"


def test_s3_missing_path_is_a_clear_error(fake_aws, capsys):
    rc = batch_cli.main(["s3://bucket/nope"], runner=_toy_runner([]))
    assert rc == 1
    assert "not" in capsys.readouterr().err.lower()


def test_s3_requires_transport(monkeypatch):
    monkeypatch.setenv("GELATO_AWS_CLI", "definitely-not-a-real-cli")
    rc = batch_cli.main(["s3://bucket/missions"], runner=_toy_runner([]))
    assert rc == 1


def test_user_constraints_staged_with_missions(fake_aws):
    """A user_constraints.py staged next to the missions is picked up by the
    per-mission loader (run.py resolves it relative to the settings file),
    matching the reference's sandbox copy (run_batch.sh:33)."""
    bucket = fake_aws / "bucket" / "m"
    _make_missions(bucket, ["u1"])
    (bucket / "user_constraints.py").write_text("MARKER = 1\n")

    seen = {}

    def runner(argv):
        settings = argv[0]
        out_dir = argv[argv.index("--output-dir") + 1]
        sandbox_dir = os.path.dirname(settings)
        seen["has_uc"] = os.path.exists(
            os.path.join(sandbox_dir, "user_constraints.py"))
        name = json.load(open(settings))["name"]
        open(os.path.join(out_dir, f"{name}-optResult.txt"), "w").close()
        return 0

    rc = batch_cli.main(["s3://bucket/m"], runner=runner)
    assert rc == 0
    assert seen["has_uc"]


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
