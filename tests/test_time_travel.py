"""Lake time travel: every manifest commit retains an immutable snapshot
under _manifests/, read_lake(as_of_epoch=k) reproduces exactly the state a
replay of the WAL prefix (epochs <= k) would build, and history is
reclaimable via expire_snapshots + vacuum without touching the head."""

import pyarrow.compute as pc
import pytest

from raycdc.cdc import (apply_changelog, expire_snapshots, generate_changelog,
                        list_snapshots, read_lake, read_manifest, vacuum)
from raycdc.cdc.apply import oracle_final_state
from raycdc.cdc.changelog import ChangelogSpec, generate_events

from tests.test_cdc import lake_state, url_text_digest

SPEC = ChangelogSpec(num_events=8_000, num_urls=600, num_epochs=4, seed=13)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, SPEC)
    lake = str(tmp_path_factory.mktemp("tt") / "lake")
    for e in range(SPEC.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    return lake


def as_of_table(lake, **kw):
    ds = read_lake(lake, **kw)
    import pyarrow as pa

    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def oracle_prefix(k: int):
    ev = generate_events(SPEC)
    return oracle_final_state(ev.filter(pc.less_equal(ev["epoch"], k)))


def test_as_of_epoch_matches_prefix_replay(lake):
    for k in range(SPEC.num_epochs):
        got = as_of_table(lake, as_of_epoch=k)
        want = oracle_prefix(k)
        assert got["url"].to_pylist() == want["url"].to_pylist(), k
        assert got["text"].to_pylist() == want["text"].to_pylist(), k


def test_head_read_is_final_state(lake):
    assert url_text_digest(lake_state(lake)) \
        == url_text_digest(oracle_prefix(SPEC.num_epochs - 1))


def test_as_of_version_reads_named_snapshot(lake):
    head = read_manifest(lake)
    versions = [v for v in list_snapshots(lake) if v <= head.version]
    assert len(versions) == SPEC.num_epochs
    first = as_of_table(lake, as_of_version=versions[0])
    want = oracle_prefix(0)
    assert first["url"].to_pylist() == want["url"].to_pylist()
    assert first["text"].to_pylist() == want["text"].to_pylist()
    # head version resolves without a snapshot lookup
    assert url_text_digest(as_of_table(lake, as_of_version=head.version)) \
        == url_text_digest(lake_state(lake))


def test_as_of_argument_validation(lake):
    with pytest.raises(ValueError, match="not both"):
        read_lake(lake, as_of_version=1, as_of_epoch=1)
    with pytest.raises(ValueError, match="not committed"):
        read_lake(lake, as_of_version=10_000)
    with pytest.raises(ValueError, match="at or before epoch"):
        read_lake(lake, as_of_epoch=-1)


def test_future_epoch_resolves_to_head(lake):
    assert url_text_digest(as_of_table(lake, as_of_epoch=99)) \
        == url_text_digest(lake_state(lake))


def test_vacuum_retains_snapshot_referenced_files(lake):
    # nothing live is collectable: every data file is referenced by the
    # head or by a retained snapshot, so time travel survives a vacuum
    removed = [p for p in vacuum(lake) if p.endswith(".parquet")]
    assert removed == []
    got = as_of_table(lake, as_of_epoch=0)
    want = oracle_prefix(0)
    assert got["text"].to_pylist() == want["text"].to_pylist()


def test_expire_then_vacuum_frees_history(tmp_path):
    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "lake")
    for e in range(SPEC.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    head_digest = url_text_digest(lake_state(lake))
    old_versions = list_snapshots(lake)[:-1]
    expired = expire_snapshots(lake, keep_last=1)
    assert expired == old_versions
    freed = [p for p in vacuum(lake) if p.endswith(".parquet")]
    assert freed  # superseded partition files are gone
    # the head is untouched; expired history reads fail cleanly
    assert url_text_digest(lake_state(lake)) == head_digest
    with pytest.raises(ValueError, match="no retained snapshot"):
        read_lake(lake, as_of_version=old_versions[0])
    with pytest.raises(ValueError, match="at or before epoch"):
        read_lake(lake, as_of_epoch=0)


def test_streaming_engine_commits_snapshots(tmp_path):
    from raycdc.cdc.actors import CdcEngine

    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(wal, lake, num_partitions=4)
    eng.advance(1)
    eng.advance(1)
    eng.shutdown()
    head = read_manifest(lake)
    assert [v for v in list_snapshots(lake) if v <= head.version]
    got = as_of_table(lake, as_of_epoch=0)
    want = oracle_prefix(0)
    assert got["url"].to_pylist() == want["url"].to_pylist()
    assert got["text"].to_pylist() == want["text"].to_pylist()


def test_time_travel_across_schema_evolution(tmp_path):
    """An as-of read resolves files through the OLD manifest, so a read
    before the column-add shows the pre-evolution schema; a later as-of
    carries the added column with nulls backfilled on old rows."""
    spec = ChangelogSpec(num_events=5_000, num_urls=400, num_epochs=4,
                         seed=11, evolve_from_epoch=2)
    wal = str(tmp_path / "wal")
    generate_changelog(wal, spec)
    lake = str(tmp_path / "lake")
    apply_changelog(wal, lake, num_partitions=4, epochs=[0, 1])
    apply_changelog(wal, lake, num_partitions=4, epochs=[2, 3])

    ev = generate_events(spec)
    pre = as_of_table(lake, as_of_epoch=1)
    assert "title" not in pre.column_names
    want_pre = oracle_final_state(ev.filter(pc.less_equal(ev["epoch"], 1)))
    assert pre["url"].to_pylist() == want_pre["url"].to_pylist()
    assert pre["text"].to_pylist() == want_pre["text"].to_pylist()

    post = as_of_table(lake, as_of_epoch=3)
    want_post = oracle_final_state(ev)
    assert post["title"].to_pylist() == want_post["title"].to_pylist()


# ---------------------------------------------------------- change data feed
def _expected_changes(ev, k_old, k_new):
    """Reference I/U/D set from the two LWW prefix states (pandas)."""
    old = oracle_final_state(
        ev.filter(pc.less_equal(ev["epoch"], k_old))).to_pandas()
    new = oracle_final_state(
        ev.filter(pc.less_equal(ev["epoch"], k_new))).to_pandas()
    cols = ["warc_ts", "seq", "text", "lang"]
    m = old.merge(new, on="url", how="outer", suffixes=("_o", "_n"),
                  indicator=True)
    out = {}
    for _, r in m.iterrows():
        if r["_merge"] == "right_only":
            out[r["url"]] = "I"
        elif r["_merge"] == "left_only":
            out[r["url"]] = "D"
        elif any(not (r[f"{c}_o"] == r[f"{c}_n"]) for c in cols):
            out[r["url"]] = "U"
    return out


def test_lake_changes_matches_prefix_diff(lake):
    from raycdc.cdc import lake_changes

    ev = generate_events(SPEC)
    feed = lake_changes(lake, from_epoch=1, to_epoch=3,
                        compare_cols=["warc_ts", "seq", "text", "lang"],
                        num_partitions=4).to_pandas()
    got = dict(zip(feed["url"], feed["op"]))
    assert got == _expected_changes(ev, 1, 3)
    # I/U rows carry the NEW state's values
    new = oracle_final_state(ev).to_pandas().set_index("url")
    iu = feed[feed["op"].isin(["I", "U"])]
    assert list(iu["text"]) == list(new.loc[iu["url"], "text"])


def test_lake_changes_same_version_is_empty(lake):
    from raycdc.cdc import lake_changes, read_manifest

    head = read_manifest(lake)
    feed = lake_changes(lake, from_version=head.version,
                        to_version=head.version, num_partitions=2)
    assert feed.count() == 0
    assert "op" in feed.schema().names  # typed empty, not schema-less


def test_changed_pids_prunes_identical_partitions():
    from raycdc.cdc.apply import _changed_pids
    from raycdc.cdc.sink import LakeManifest

    def mk(files_by_pid, version):
        return LakeManifest(
            version=version, num_partitions=4, epochs_applied=[0],
            watermark_seq=1,
            partitions={str(p): {"files": fs, "rows": 1, "bytes": 1,
                                 "lineage": []}
                        for p, fs in files_by_pid.items()})

    a = mk({0: ["p0/v1.parquet"], 1: ["p1/v1.parquet"],
            2: ["p2/v1.parquet"]}, 1)
    b = mk({0: ["p0/v1.parquet"], 1: ["p1/v2.parquet"],
            2: ["p2/v1.parquet"], 3: ["p3/v2.parquet"]}, 2)
    assert _changed_pids(a, b) == [1, 3]


def test_orphan_snapshot_beyond_head_is_ignored(tmp_path):
    """A crash between the snapshot write and the head replace leaves an
    orphan snapshot with version > head. It is NOT committed truth:
    as-of-epoch resolution must never pick it, version reads must refuse
    it, and vacuum must still protect its files (the re-run rewrites them
    idempotently)."""
    import json
    import os

    from raycdc.cdc.sink import snapshot_path

    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "lake")
    for e in range(2):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    head = read_manifest(lake)
    orphan = snapshot_path(lake, head.version + 1)
    body = json.loads(head.to_json())
    body["version"] = head.version + 1
    body["epochs_applied"] = [0, 1, 2]
    with open(orphan, "w") as f:
        json.dump(body, f)

    # epoch resolution clamps to committed versions
    m = __import__("raycdc.cdc.apply", fromlist=["_resolve_manifest"]) \
        ._resolve_manifest(lake, None, 99)
    assert m.version == head.version
    with pytest.raises(ValueError, match="not committed"):
        read_lake(lake, as_of_version=head.version + 1)
    # vacuum keeps the orphan's files (they are the head's files here)
    assert [p for p in vacuum(lake) if p.endswith(".parquet")] == []
    assert url_text_digest(lake_state(lake)) \
        == url_text_digest(oracle_prefix(1))
