"""Round-5 hardening-wave regression tests: single-writer lake locking +
commit CAS, quiet-partition manifest preservation in the streaming engine,
exact integer (never float-degraded) LWW ordering across combiner batches,
stable_hash in every key exchange, and the degenerate single-partition
merge path."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from raycdc.cdc import apply_changelog, generate_changelog, read_lake
from raycdc.cdc.apply import _url_pid, oracle_final_state
from raycdc.cdc.changelog import ChangelogSpec, generate_events
from raycdc.cdc.fsck import check_lake
from raycdc.cdc.lww import LocalLwwCombiner, lww_dataset
from raycdc.cdc.sink import (
    LakeManifest,
    commit_manifest,
    read_manifest,
    vacuum,
    writer_lock,
)

SPEC = ChangelogSpec(num_events=4_000, num_urls=300, num_epochs=2, seed=11)


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    d = tmp_path_factory.mktemp("wal-hardening")
    generate_changelog(str(d), SPEC)
    return str(d)


# ---------------------------------------------------------------- locking


def test_writer_lock_excludes_second_writer(tmp_path):
    d = str(tmp_path / "lake")
    with writer_lock(d):
        with pytest.raises(RuntimeError, match="another writer"):
            with writer_lock(d):
                pass
    # released on exit (including after the contention error above)
    with writer_lock(d):
        pass


def test_vacuum_and_expire_blocked_while_writer_holds_lock(tmp_path):
    from raycdc.cdc.sink import expire_snapshots

    d = str(tmp_path / "lake")
    with writer_lock(d):
        with pytest.raises(RuntimeError, match="another writer"):
            vacuum(d)
        with pytest.raises(RuntimeError, match="another writer"):
            expire_snapshots(d, keep_last=1)


def test_writer_lock_excludes_across_processes(tmp_path):
    # the deployment scenario: a second driver PROCESS must be excluded
    # while the first holds the lake (flock is per open-file-description,
    # so the in-process test above alone would not prove this)
    import subprocess
    import sys
    import time

    d = str(tmp_path / "lake")
    m1, m2 = str(tmp_path / "locked"), str(tmp_path / "release")
    script = (
        "import sys, time, os\n"
        f"sys.path.insert(0, {repr('/root/repo')})\n"
        "from raycdc.cdc.sink import writer_lock\n"
        "d, m1, m2 = sys.argv[1:4]\n"
        "with writer_lock(d):\n"
        "    open(m1, 'w').close()\n"
        "    t0 = time.time()\n"
        "    while not os.path.exists(m2) and time.time() - t0 < 30:\n"
        "        time.sleep(0.02)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", script, d, m1, m2])
    try:
        t0 = time.time()
        while not os.path.exists(m1):
            assert time.time() - t0 < 30, "subprocess never took the lock"
            assert proc.poll() is None, "subprocess died before locking"
            time.sleep(0.02)
        with pytest.raises(RuntimeError, match="another writer"):
            with writer_lock(d):
                pass
    finally:
        open(m2, "w").close()
        proc.wait(timeout=30)
    assert proc.returncode == 0
    with writer_lock(d):  # released with the other process
        pass


def test_commit_manifest_cas_rejects_moved_head(tmp_path):
    d = str(tmp_path / "lake")
    m1 = LakeManifest(version=1, num_partitions=2, epochs_applied=[0],
                      watermark_seq=10, partitions={})
    commit_manifest(d, m1, expect_base=0)  # fresh lake: head "v0"
    m2 = LakeManifest(version=2, num_partitions=2, epochs_applied=[0, 1],
                      watermark_seq=20, partitions={})
    # a writer that allocated v2 while believing head was still v0 must
    # NOT clobber the committed v1
    with pytest.raises(RuntimeError, match="concurrent writer"):
        commit_manifest(d, m2, expect_base=0)
    assert read_manifest(d).version == 1
    commit_manifest(d, m2, expect_base=1)
    assert read_manifest(d).version == 2


# ------------------------------------------- quiet-partition manifest truth


def _mk_segment(path, epoch, seq_start, urls):
    n = len(urls)
    fetch = pa.StructArray.from_arrays(
        [pa.array([1_700_000_000_000_000 + 10 * (seq_start + i)
                   for i in range(n)]).cast(pa.timestamp("us")),
         pa.array([b"<html>"] * n, pa.binary())],
        ["warc_ts", "html"])
    content = pa.StructArray.from_arrays(
        [pa.array([f"text-{u}-{epoch}" for u in urls]),
         pa.array(["en"] * n),
         pa.array([seq_start + i for i in range(n)], pa.int64())],
        ["text", "lang", "score"])
    page = pa.StructArray.from_arrays(
        [pa.array(urls), fetch, content], ["url", "fetch", "content"])
    pq.write_table(pa.table({
        "seq": pa.array(range(seq_start, seq_start + n), pa.int64()),
        "epoch": pa.array([epoch] * n, pa.int32()),
        "op": pa.array(["I"] * n),
        "page": page}), path)


def test_quiet_partition_keeps_committed_manifest_entry(tmp_path):
    # An epoch that routes zero rows to a partition must leave that
    # partition's manifest entry untouched (same rows/bytes/lineage) — the
    # pre-fix flush overwrote it with rows=0 and the new epoch's lineage.
    from raycdc.cdc.actors import CdcEngine

    cands = [f"u{i:03d}" for i in range(60)]
    pid = _url_pid(pa.chunked_array([pa.array(cands)]), 2)
    p0 = [u for u, p in zip(cands, pid) if p == 0][:5]
    p1 = [u for u, p in zip(cands, pid) if p == 1][:5]
    assert len(p0) == 5 and len(p1) == 5
    wal = tmp_path / "wal"
    wal.mkdir()
    _mk_segment(str(wal / "events-00000.parquet"), 0, 0, p0 + p1)
    _mk_segment(str(wal / "events-00001.parquet"), 1, 100, p0)  # pid1 quiet

    lake = str(tmp_path / "lake")
    eng = CdcEngine(str(wal), lake, num_partitions=2)
    eng.advance(1)
    before = read_manifest(lake).partitions["1"]
    assert before["rows"] > 0
    eng.advance(1)
    eng.shutdown()
    m = read_manifest(lake)
    assert m.version == 2
    assert m.partitions["1"] == before  # quiet partition: entry unchanged
    assert 1 in m.partitions["0"]["lineage"]["epochs"] or \
        m.partitions["0"]["lineage"]["epochs"] == [1]
    r = check_lake(lake, deep=True)
    assert r["ok"], r
    # state correctness: p0 urls carry epoch-1 text, p1 urls epoch-0 text
    t = pa.concat_tables(list(
        read_lake(lake).iter_batches(batch_format="pyarrow")))
    got = dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    assert got == {**{u: f"text-{u}-1" for u in p0},
                   **{u: f"text-{u}-0" for u in p1}}


# ------------------------------------------------------ exact LWW ordering


def test_lww_combiner_keeps_exact_int64_order_across_batches():
    # ns-scale int64 timestamps (~1.7e18) exceed float64's 2^53 integer
    # range; the pre-fix NaN reindex degraded the seen-map to float64 and
    # a ~100 ns-newer row could be dropped as "beaten" by an older one.
    comb = LocalLwwCombiner()
    T = 1_700_000_000_000_000_000
    b1 = pa.table({"url": ["u"], "warc_ts": pa.array([T], pa.int64()),
                   "seq": pa.array([5], pa.int64()), "text": ["old"]})
    b2 = pa.table({"url": ["u"], "warc_ts": pa.array([T + 100], pa.int64()),
                   "seq": pa.array([1], pa.int64()), "text": ["new"]})
    assert comb(b1).num_rows == 1
    out = comb(b2)
    assert out.num_rows == 1 and out["text"].to_pylist() == ["new"]
    # and the genuinely-older row IS still dropped (combiner semantics)
    b3 = pa.table({"url": ["u"], "warc_ts": pa.array([T - 100], pa.int64()),
                   "seq": pa.array([9], pa.int64()), "text": ["stale"]})
    assert comb(b3).num_rows == 0


def test_lww_combiner_unseen_key_never_reads_beaten():
    # the int64-min sentinel must always LOSE: a first-seen key with the
    # smallest real ts/seq values still has to be emitted
    comb = LocalLwwCombiner()
    lo = np.iinfo(np.int64).min + 1
    b1 = pa.table({"url": ["a"], "warc_ts": pa.array([10], pa.int64()),
                   "seq": pa.array([0], pa.int64()), "text": ["x"]})
    b2 = pa.table({"url": ["b"], "warc_ts": pa.array([lo], pa.int64()),
                   "seq": pa.array([lo], pa.int64()), "text": ["y"]})
    assert comb(b1).num_rows == 1
    assert comb(b2)["url"].to_pylist() == ["b"]


def test_lww_dataset_nullable_int_key_one_winner(ray_session):
    # a null in one batch of a nullable-int key must not re-hash the whole
    # batch (plain to_pandas flips int64→float64): key 1 appears in both
    # batches and must reduce to ONE winner, not one per bucket
    import ray.data

    a = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "warc_ts": pa.array([10, 10, 10], pa.int64()),
                  "seq": pa.array([0, 1, 2], pa.int64())})
    b = pa.table({"k": pa.array([1, None], pa.int64()),
                  "warc_ts": pa.array([20, 5], pa.int64()),
                  "seq": pa.array([7, 0], pa.int64())})
    out = lww_dataset(ray.data.from_arrow([a, b]), key="k", ts="warc_ts",
                      seq="seq", num_partitions=4)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    ones = t.filter(pc.equal(t["k"], 1))
    assert ones.num_rows == 1
    assert ones["warc_ts"].to_pylist() == [20]


def test_url_pid_routing_unchanged_for_string_urls():
    # _url_pid moved to shuffle.stable_hash; existing lakes' file layout
    # depends on the old inline pandas hash — for string urls the values
    # must be bit-identical
    urls = pa.chunked_array([pa.array([f"https://ex.com/{i}"
                                       for i in range(257)])])
    legacy = pd.util.hash_pandas_object(
        urls.to_pandas(), index=False).to_numpy()
    got = _url_pid(urls, 8)
    assert (got == (legacy % 8).astype(np.int64)).all()


# --------------------------------------------------- degenerate / fsck path


def test_single_partition_apply_matches_oracle(changelog, tmp_path,
                                               ray_session):
    lake = str(tmp_path / "lake")
    m = apply_changelog(changelog, lake, num_partitions=1)
    assert m["events"] == SPEC.num_events
    t = pa.concat_tables(list(
        read_lake(lake).iter_batches(batch_format="pyarrow")))
    t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    expected = oracle_final_state(generate_events(SPEC))
    assert t["url"].to_pylist() == expected["url"].to_pylist()
    assert t["text"].to_pylist() == expected["text"].to_pylist()


def test_fsck_deep_green_on_multi_file_run_sets(changelog, tmp_path,
                                                ray_session):
    # deep fsck now reads only (url, warc_ts, seq, _deleted) for the LWW
    # uniqueness check on multi-file run sets — it must stay green on a
    # healthy uncompacted LSM lake
    from raycdc.cdc.actors import CdcEngine

    lake = str(tmp_path / "lake")
    eng = CdcEngine(changelog, lake, num_partitions=2, compact_threshold=99)
    eng.tail()
    eng.shutdown()
    m = read_manifest(lake)
    assert any(len(m.partition_files(pid)) > 1 for pid in m.partitions)
    r = check_lake(lake, deep=True)
    assert r["ok"], r

    # the per-file uniqueness check must actually FIRE: duplicate one row
    # inside a delta file of a multi-file run set (the former whole-run-set
    # check re-reduced first, so it could never detect this)
    pid = next(p for p in m.partitions if len(m.partition_files(p)) > 1)
    rel = m.partition_files(pid)[-1]
    path = os.path.join(lake, rel)
    t = pq.read_table(path)
    pq.write_table(pa.concat_tables([t.slice(0, 1), t]), path)
    bad = check_lake(lake, deep=True)
    assert not bad["ok"]
    assert any("duplicate urls within one file" in e for e in bad["errors"])
