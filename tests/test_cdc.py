"""CDC engine tests: replay correctness, idempotence, crash-resume, schema
evolution, parallelism invariance (BASELINE.json north_star gates)."""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycdc.cdc import apply_changelog, generate_changelog, read_lake
from raycdc.cdc.apply import oracle_final_state
from raycdc.cdc.changelog import ChangelogSpec, generate_events
from raycdc.cdc.lww import lww_reduce

SPEC = ChangelogSpec(num_events=20_000, num_urls=1_500, num_epochs=5, seed=7)


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    d = tmp_path_factory.mktemp("wal")
    generate_changelog(str(d), SPEC)
    return str(d)


def lake_state(lake_dir) -> pa.Table:
    ds = read_lake(lake_dir)
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def url_text_digest(t: pa.Table) -> str:
    h = hashlib.sha256()
    for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
        h.update(url.encode())
        h.update(b"\x00")
        h.update((text or "").encode())
        h.update(b"\x01")
    return h.hexdigest()


def test_generator_deterministic():
    a = generate_events(SPEC)
    b = generate_events(SPEC)
    assert a.equals(b)


def test_lww_reduce_orders_by_ts_then_seq():
    t = pa.table({
        "url": ["u", "u", "u", "v"],
        "warc_ts": pa.array([5, 5, 3, 1], pa.int64()),
        "seq": pa.array([1, 2, 9, 0], pa.int64()),
        "text": ["a", "b", "c", "d"],
    })
    out = lww_reduce(t)
    got = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
    # (ts=5, seq=2) beats (ts=5, seq=1) and (ts=3, seq=9)
    assert got == {"u": "b", "v": "d"}


def test_full_replay_matches_oracle(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    metrics = apply_changelog(changelog, lake, num_partitions=4)
    assert metrics["events"] == SPEC.num_events
    got = lake_state(lake)
    expected = oracle_final_state(generate_events(SPEC))
    assert got.num_rows == expected.num_rows
    assert got["url"].to_pylist() == expected["url"].to_pylist()
    # byte-identical per-url text — the north-star correctness invariant
    assert got["text"].to_pylist() == expected["text"].to_pylist()
    assert got["html"].to_pylist() == expected["html"].to_pylist()


def test_epoch_by_epoch_equals_one_shot(changelog, tmp_path):
    one = str(tmp_path / "one")
    inc = str(tmp_path / "inc")
    apply_changelog(changelog, one, num_partitions=4)
    for e in range(SPEC.num_epochs):
        m = apply_changelog(changelog, inc, num_partitions=4, epochs=[e])
        assert m["epochs"] == [e]
    assert url_text_digest(lake_state(one)) == url_text_digest(lake_state(inc))


def test_reapply_is_noop(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4)
    before = url_text_digest(lake_state(lake))
    m = apply_changelog(changelog, lake, num_partitions=4)
    assert m["events"] == 0  # all epochs already committed
    assert url_text_digest(lake_state(lake)) == before


def test_crash_before_commit_then_resume(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4, epochs=[0, 1])
    # crash: epoch 2's files hit disk but the manifest is never published
    apply_changelog(changelog, lake, num_partitions=4, epochs=[2],
                    crash_before_commit=True)
    from raycdc.cdc import read_manifest
    assert read_manifest(lake).epochs_applied == [0, 1]
    # resume: replays epoch 2 (and the rest), converging to the oracle
    apply_changelog(changelog, lake, num_partitions=4)
    got = lake_state(lake)
    expected = oracle_final_state(generate_events(SPEC))
    assert got["url"].to_pylist() == expected["url"].to_pylist()
    assert got["text"].to_pylist() == expected["text"].to_pylist()


def test_partitioning_invariance(changelog, tmp_path):
    # Different partition counts must converge to identical logical state —
    # the LWW reduction is associative/commutative over any grouping.
    a = str(tmp_path / "p4")
    b = str(tmp_path / "p16")
    apply_changelog(changelog, a, num_partitions=4)
    apply_changelog(changelog, b, num_partitions=16)
    assert url_text_digest(lake_state(a)) == url_text_digest(lake_state(b))


def test_merge_task_retry_is_idempotent(changelog, tmp_path):
    # A re-executed merge task (Ray may retry tasks) rewrites the identical
    # partition file: content-addressed name + deterministic merge.
    import pyarrow.parquet as pq
    from raycdc.cdc.apply import MergePartition, PID_COL
    import numpy as np

    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4, epochs=[0])
    ev = generate_events(SPEC)
    from raycdc.record_flatten import flatten_record_table
    from raycdc.cdc.lww import to_versioned_rows
    flat = flatten_record_table(ev.slice(0, 500))
    flat = flat.rename_columns([c.split(".")[-1] for c in flat.column_names])
    flat = to_versioned_rows(flat.drop_columns(["epoch"]))
    group = flat.append_column(
        PID_COL, pa.array(np.zeros(flat.num_rows, dtype=np.int64)))
    merge = MergePartition(lake, version=99, base_files={}, epochs=[1])
    r1 = merge(group)
    data1 = pq.read_table(f"{lake}/{r1['file'][0].as_py()}")
    r2 = merge(group)  # retry
    data2 = pq.read_table(f"{lake}/{r2['file'][0].as_py()}")
    assert r1["file"][0].as_py() == r2["file"][0].as_py()
    assert data1.equals(data2)


def test_partition_lineage_surface(changelog, tmp_path):
    from raycdc.cdc.metrics import lake_stats, partition_lineage

    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4, epochs=[0, 1])
    lin = partition_lineage(lake)
    assert len(lin) == 4
    assert all(l["epochs"] == [0, 1] for l in lin)
    stats = lake_stats(lake)
    assert stats["committed"] and stats["files"] == 4
    assert stats["skew"]["max_rows"] >= stats["skew"]["min_rows"]
    assert stats["snapshots"] == [1]  # one commit → one retained snapshot


def test_partition_count_change_rejected(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4, epochs=[0])
    with pytest.raises(ValueError, match="partitions"):
        apply_changelog(changelog, lake, num_partitions=8, epochs=[1])


def test_deleted_urls_absent(changelog, tmp_path):
    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4)
    full = read_lake(lake, include_deleted=True)
    t = pa.concat_tables(list(full.iter_batches(batch_format="pyarrow")))
    n_tombstones = pc.sum(pc.cast(t["_deleted"], pa.int64())).as_py()
    assert n_tombstones and n_tombstones > 0  # spec has deletes
    live = lake_state(lake)
    assert live.num_rows == t.num_rows - n_tombstones


def test_streaming_actor_engine_matches_batch(changelog, tmp_path):
    # The stateful merge-actor engine (LSM memtable per partition) must
    # converge to the identical lake state as the batch apply path.
    from raycdc.cdc.actors import CdcEngine

    batch_lake = str(tmp_path / "batch")
    apply_changelog(changelog, batch_lake, num_partitions=4)
    stream_lake = str(tmp_path / "stream")
    eng = CdcEngine(changelog, stream_lake, num_partitions=4,
                    memtable_budget_rows=2_000)
    m = eng.tail()
    assert m["epochs"] == list(range(SPEC.num_epochs))
    eng.shutdown()
    assert url_text_digest(lake_state(stream_lake)) == \
        url_text_digest(lake_state(batch_lake))


def test_streaming_engine_resumes_from_manifest(changelog, tmp_path):
    from raycdc.cdc.actors import CdcEngine

    lake = str(tmp_path / "lake")
    eng = CdcEngine(changelog, lake, num_partitions=4)
    eng.advance(2)
    eng.shutdown()
    # new engine instance picks up from the committed manifest
    eng2 = CdcEngine(changelog, lake, num_partitions=4)
    eng2.tail()
    eng2.shutdown()
    expected = oracle_final_state(generate_events(SPEC))
    got = lake_state(lake)
    assert got["url"].to_pylist() == expected["url"].to_pylist()
    assert got["text"].to_pylist() == expected["text"].to_pylist()


def test_lsm_delta_runs_and_compaction(changelog, tmp_path):
    # Streaming flushes write L0 delta files; reads LWW-merge the run set;
    # crossing the threshold compacts to a single base; vacuum GCs orphans.
    from raycdc.cdc.actors import CdcEngine
    from raycdc.cdc import read_manifest
    from raycdc.cdc.sink import vacuum

    lake = str(tmp_path / "lake")
    eng = CdcEngine(changelog, lake, num_partitions=4, compact_threshold=3)
    eng.advance(1)
    eng.advance(1)
    m = read_manifest(lake)
    # after two epochs, partitions hold two delta runs (below threshold)
    assert any(len(m.partition_files(pid)) == 2 for pid in m.partitions)
    # the merged read view at this point must already be LWW-correct
    mid = lake_state(lake)
    expected_mid = oracle_final_state(
        generate_events(SPEC).filter(
            pa.compute.less(generate_events(SPEC)["epoch"], 2)))
    assert mid["url"].to_pylist() == expected_mid["url"].to_pylist()
    assert mid["text"].to_pylist() == expected_mid["text"].to_pylist()
    eng.tail()
    eng.shutdown()
    got = lake_state(lake)
    expected = oracle_final_state(generate_events(SPEC))
    assert got["text"].to_pylist() == expected["text"].to_pylist()
    # superseded runs stay vacuum-protected while snapshot history retains
    # them (time travel); expiring history makes them collectable
    from raycdc.cdc.sink import expire_snapshots

    assert [p for p in vacuum(lake) if p.endswith(".parquet")] == []
    expire_snapshots(lake, keep_last=1)
    removed = vacuum(lake)
    assert removed
    assert url_text_digest(lake_state(lake)) == url_text_digest(got)


def test_schema_evolution_column_add(tmp_path):
    spec = ChangelogSpec(num_events=5_000, num_urls=400, num_epochs=4, seed=11,
                         evolve_from_epoch=2)
    wal = str(tmp_path / "wal")
    generate_changelog(wal, spec)
    lake = str(tmp_path / "lake")
    # apply pre-evolution epochs first, then evolved ones against the old base
    apply_changelog(wal, lake, num_partitions=4, epochs=[0, 1])
    apply_changelog(wal, lake, num_partitions=4, epochs=[2, 3])
    got = lake_state(lake)
    assert "title" in got.column_names
    expected = oracle_final_state(generate_events(spec))
    assert got["url"].to_pylist() == expected["url"].to_pylist()
    assert got["text"].to_pylist() == expected["text"].to_pylist()
    assert got["title"].to_pylist() == expected["title"].to_pylist()


def test_compact_lake_collapses_run_sets(changelog, tmp_path):
    # Maintenance compaction: streaming L0 run sets collapse to one base
    # file per partition; the visible state is unchanged; version bumps.
    from raycdc.cdc import compact_lake, read_manifest
    from raycdc.cdc.actors import CdcEngine

    lake = str(tmp_path / "lake")
    eng = CdcEngine(changelog, lake, num_partitions=4, compact_threshold=10)
    eng.advance(1)
    eng.advance(1)
    eng.advance(1)
    eng.shutdown()
    before = read_manifest(lake)
    assert any(len(before.partition_files(pid)) > 1
               for pid in before.partitions)
    state_before = lake_state(lake)

    m = compact_lake(lake)
    assert m["partitions_compacted"] >= 1

    after = read_manifest(lake)
    assert after.version == before.version + 1
    assert all(len(after.partition_files(pid)) == 1 for pid in after.partitions)
    assert after.epochs_applied == before.epochs_applied
    state_after = lake_state(lake)
    assert state_before["url"].to_pylist() == state_after["url"].to_pylist()
    assert state_before["text"].to_pylist() == state_after["text"].to_pylist()
    # idempotent when already compacted
    assert compact_lake(lake)["partitions_compacted"] == 0


def _mk_widen_segment(path, epoch, seq_start, urls, score_type):
    import pyarrow.parquet as pq

    n = len(urls)
    seqs = pa.array(range(seq_start, seq_start + n), pa.int64())
    fetch = pa.StructArray.from_arrays(
        [pa.array([1_700_000_000_000_000 + 10 * (seq_start + i)
                   for i in range(n)]).cast(pa.timestamp("us")),
         pa.array([b"<html>"] * n, pa.binary())],
        ["warc_ts", "html"])
    content = pa.StructArray.from_arrays(
        [pa.array([f"text-{u}-{epoch}" for u in urls]),
         pa.array(["en"] * n),
         pa.array([seq_start + i for i in range(n)], score_type)],
        ["text", "lang", "score"])
    page = pa.StructArray.from_arrays(
        [pa.array(urls), fetch, content], ["url", "fetch", "content"])
    t = pa.table({"seq": seqs,
                  "epoch": pa.array([epoch] * n, pa.int32()),
                  "op": pa.array(["I"] * n),
                  "page": page})
    pq.write_table(t, path)


def test_schema_evolution_type_widen(tmp_path):
    # A later segment widens a numeric column (int32 -> int64); merge must
    # unify to the wide type without rewriting the old segment.
    wal = tmp_path / "wal"
    wal.mkdir()
    _mk_widen_segment(str(wal / "events-00000.parquet"), 0, 0,
                      ["a", "b", "c"], pa.int32())
    _mk_widen_segment(str(wal / "events-00001.parquet"), 1, 100,
                      ["b", "d"], pa.int64())
    lake = str(tmp_path / "lake")
    apply_changelog(str(wal), lake, num_partitions=2)
    t = lake_state(lake)
    assert t.schema.field("score").type == pa.int64()
    got = dict(zip(t["url"].to_pylist(), t["score"].to_pylist()))
    # b was updated by the later (wide) segment; a and c keep narrow values
    assert got == {"a": 0, "b": 100, "c": 2, "d": 101}


def test_tree_fanin_merge_matches_oracle(changelog, tmp_path, monkeypatch):
    # Force the tree-reduce merge layer (fan-in width 2 over many tiny map
    # blocks) and check the final state is still exactly the LWW oracle —
    # the interleaved combine layer must be invisible (associativity).
    from raycdc.cdc import apply as A

    monkeypatch.setattr(A, "_FANIN", 2)
    lake = str(tmp_path / "lake")
    apply_changelog(changelog, lake, num_partitions=4, batch_size=512)
    expected = oracle_final_state(generate_events(SPEC))
    got = lake_state(lake)
    assert got["url"].to_pylist() == expected["url"].to_pylist()
    assert got["text"].to_pylist() == expected["text"].to_pylist()
