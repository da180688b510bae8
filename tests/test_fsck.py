"""Lake fsck (cdc/fsck.check_lake): a healthy lake passes shallow and deep;
every class of corruption the checker claims to catch is actually caught."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from raycdc.cdc import apply_changelog, generate_changelog, read_manifest
from raycdc.cdc.changelog import ChangelogSpec
from raycdc.cdc.fsck import check_lake
from raycdc.cdc.sink import commit_manifest, snapshot_path

SPEC = ChangelogSpec(num_events=6_000, num_urls=500, num_epochs=2, seed=17)


@pytest.fixture()
def lake(tmp_path):
    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "lake")
    for e in range(SPEC.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    return lake


def _first_file(lake):
    head = read_manifest(lake)
    for pid in sorted(head.partitions, key=int):
        files = head.partition_files(pid)
        if files:
            return files[0]
    raise AssertionError("no files")


def test_healthy_lake_passes_shallow_and_deep(lake):
    r = check_lake(lake)
    assert r["ok"], r["errors"]
    assert r["files_checked"] > 0 and r["snapshots"] == SPEC.num_epochs
    rd = check_lake(lake, deep=True)
    assert rd["ok"], rd["errors"]
    # history rewrites leave older-version files unreferenced by the HEAD
    # but snapshot-referenced — they must NOT be flagged
    assert not [w for w in rd["warnings"] if "unreferenced" in w]


def test_streaming_lake_passes(tmp_path):
    """Uncompacted L0 run sets record the newest flush's counts in the
    manifest while listing the whole run — fsck must not false-error on
    them (shallow skips the footer-sum check for multi-file partitions;
    deep still validates routing/uniqueness/sortedness)."""
    from raycdc.cdc.actors import CdcEngine

    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "slake")
    eng = CdcEngine(wal, lake, num_partitions=4)
    eng.tail(epochs_per_commit=1)
    eng.shutdown()
    r = check_lake(lake, deep=True)
    assert r["ok"], r["errors"]


def test_missing_file_is_an_error(lake):
    os.remove(os.path.join(lake, _first_file(lake)))
    r = check_lake(lake)
    assert not r["ok"] and any("missing on disk" in e for e in r["errors"])


def test_row_count_tamper_is_an_error(lake):
    rel = _first_file(lake)
    path = os.path.join(lake, rel)
    t = pq.read_table(path)
    pq.write_table(t.slice(0, t.num_rows - 1), path)
    r = check_lake(lake)
    assert not r["ok"] and any("rows" in e for e in r["errors"])


def test_unreferenced_file_is_a_warning(lake):
    head = read_manifest(lake)
    pid = next(p for p in head.partitions if head.partition_files(p))
    src = os.path.join(lake, head.partition_files(pid)[0])
    shutil.copy(src, os.path.join(os.path.dirname(src), "v9999.parquet"))
    r = check_lake(lake)
    assert r["ok"]  # warning, not error
    assert any("vacuum candidates" in w for w in r["warnings"])


def test_orphan_snapshot_is_a_warning(lake):
    head = read_manifest(lake)
    shutil.copy(snapshot_path(lake, head.version),
                snapshot_path(lake, head.version + 5))
    r = check_lake(lake)
    assert r["ok"]
    assert any("orphan" in w for w in r["warnings"])


def test_deep_catches_misrouted_rows(lake):
    """Move one partition's file into another partition's slot (manifest
    edits included): shallow passes on counts, deep catches the routing."""
    head = read_manifest(lake)
    pids = [p for p in sorted(head.partitions, key=int)
            if head.partition_files(p)]
    a, b = pids[0], pids[1]
    fa = head.partition_files(a)[0]
    # rewrite partition b's file with partition a's ROWS (counts adjusted)
    ta = pq.read_table(os.path.join(lake, fa))
    fb = head.partition_files(b)[0]
    pq.write_table(ta, os.path.join(lake, fb))
    head.partitions[str(b)]["rows"] = ta.num_rows
    head.partitions[str(b)]["bytes"] = os.path.getsize(
        os.path.join(lake, fb))
    live = int(pc.sum(pc.cast(pc.invert(ta["_deleted"]),
                              pa.int64())).as_py() or 0)
    head.partitions[str(b)]["live_rows"] = live
    commit_manifest(lake, head)
    # shallow only sees consistent metadata
    assert check_lake(lake)["ok"]
    rd = check_lake(lake, deep=True)
    assert not rd["ok"]
    assert any("hash to another partition" in e for e in rd["errors"])
