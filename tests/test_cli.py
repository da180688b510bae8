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
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["events"] == 5_000 and m["epochs"] == [0, 1]

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "stats", "--lake", lake],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600)
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
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["events"] == 4_000

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "compact", "--lake", lake],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, "-m", "raycdc", "stats", "--lake", lake],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["committed"] and s["epochs_applied"] == [0, 1, 2, 3]


def test_cli_export_expire_vacuum(tmp_path):
    """The lake-maintenance surface: per-epoch applies build snapshot
    history; `export --as-of-epoch` writes the prefix state; `expire` +
    `vacuum` reclaim it while the head export is unchanged."""
    import duckdb

    from raycdc.cdc.changelog import ChangelogSpec, generate_changelog

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    spec = ChangelogSpec(num_events=4_000, num_urls=300, num_epochs=2,
                         seed=5)
    generate_changelog(wal, spec)
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")

    def run(*args, ok=True):
        r = subprocess.run(
            [sys.executable, "-m", "raycdc", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=600)
        if ok:
            assert r.returncode == 0, r.stderr[-2000:]
            return json.loads(r.stdout.strip().splitlines()[-1])
        return r

    for e in range(spec.num_epochs):
        run("apply", "--wal", wal, "--lake", lake, "--partitions", "2",
            "--epochs", str(e))

    out0 = str(tmp_path / "as-of-0")
    m = run("export", "--lake", lake, "--out", out0,
            "--as-of-epoch", "0")
    want = duckdb.sql(f"""
        WITH ev AS (
            SELECT seq, op, page.url AS url, page.fetch.warc_ts AS warc_ts
            FROM read_parquet('{wal}/events-*.parquet') WHERE epoch <= 0
        ), win AS (SELECT *, row_number() OVER (
            PARTITION BY url ORDER BY warc_ts DESC, seq DESC) rn FROM ev)
        SELECT count(*) FROM win WHERE rn = 1 AND op <> 'D'
        """).fetchone()[0]
    assert m["rows"] == want

    head = str(tmp_path / "head")
    before = run("export", "--lake", lake, "--out", head)["rows"]

    # the change feed between epoch 0 and the head: row count equals the
    # url-level symmetric difference + value changes, never more than the
    # union of both states
    feed = run("changes", "--lake", lake, "--out", str(tmp_path / "feed"),
               "--from-epoch", "0")
    assert 0 < feed["rows"] <= m["rows"] + before

    expired = run("expire", "--lake", lake, "--keep-last", "1")
    assert expired["expired_versions"]
    deleted = run("vacuum", "--lake", lake)
    assert any(p.endswith(".parquet") for p in deleted["deleted"])

    head2 = str(tmp_path / "head2")
    assert run("export", "--lake", lake, "--out", head2)["rows"] == before
    r = run("export", "--lake", lake, "--out", str(tmp_path / "gone"),
            "--as-of-epoch", "0", ok=False)
    assert r.returncode != 0
