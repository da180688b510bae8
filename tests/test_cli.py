"""Smoke test of the `python -m raycdc` CLI (the ray-job-submit surface).

Runs in a subprocess with its own Ray instance (the CLI owns a session;
the pytest session's Ray is untouched).
"""

import json
import os
import subprocess
import sys

def test_cli_apply_and_stats(tmp_path):
    from raycdc.cdc.changelog import ChangelogSpec, generate_changelog

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_changelog(wal, ChangelogSpec(num_events=5_000, num_urls=400,
                                          num_epochs=2, seed=3))
    env = dict(os.environ, PYTHONPATH="/root/repo",
               RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "apply", "--wal", wal,
         "--lake", lake, "--partitions", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["events"] == 5_000 and m["epochs"] == [0, 1]

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "stats", "--lake", lake],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["committed"] and s["epochs_applied"] == [0, 1]


def test_cli_stream_then_compact(tmp_path):
    """`stream` (actor/LSM tail, per-epoch commits) then `compact` must
    produce a committed lake whose stats show all epochs applied — the
    full ray-job-submit surface, each subcommand a fresh process owning
    its own Ray session."""
    from raycdc.cdc.changelog import ChangelogSpec, generate_changelog

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    generate_changelog(wal, ChangelogSpec(num_events=4_000, num_urls=300,
                                          num_epochs=4, seed=11))
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "stream", "--wal", wal,
         "--lake", lake, "--partitions", "2", "--epochs-per-commit", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["events"] == 4_000

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "compact", "--lake", lake],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "stats", "--lake", lake],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["committed"] and s["epochs_applied"] == [0, 1, 2, 3]
