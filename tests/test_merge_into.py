"""MERGE INTO (cdc/apply.merge_into): general snapshot upsert. The merged
lake must equal the LWW reduction of (WAL events ∪ source rows) — stale
source rows lose, newer ones win, delete_col rows tombstone, new columns
evolve the schema, and re-merging the same source is a state no-op."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.cdc import (apply_changelog, generate_changelog, merge_into,
                        read_lake, read_manifest)
from raycdc.cdc.changelog import ChangelogSpec, generate_events
from raycdc.cdc.evolve import concat_evolved
from raycdc.cdc.lww import DELETED_COL, lww_reduce, to_versioned_rows
from raycdc.record_flatten import flatten_record_table

from tests.test_cdc import lake_state, url_text_digest

SPEC = ChangelogSpec(num_events=6_000, num_urls=500, num_epochs=2, seed=11)
TS_HI = pa.scalar(np.datetime64("2031-01-01", "us"), pa.timestamp("us"))
TS_LO = pa.scalar(np.datetime64("1999-01-01", "us"), pa.timestamp("us"))


@pytest.fixture()
def lake(tmp_path):
    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "lake")
    apply_changelog(wal, lake, num_partitions=4)
    return lake


def _flat_wal_rows() -> pa.Table:
    flat = flatten_record_table(generate_events(SPEC))
    flat = flat.rename_columns([c.split(".")[-1] for c in flat.column_names])
    return to_versioned_rows(flat.drop_columns(["epoch"]))


def oracle_state(source: pa.Table) -> pa.Table:
    """Expected live lake state after merging ``source`` (already carrying
    the _deleted column) into the replayed WAL."""
    win = lww_reduce(concat_evolved([_flat_wal_rows(), source]))
    win = win.filter(pc.invert(win[DELETED_COL]))
    return win.take(pc.sort_indices(win, sort_keys=[("url", "ascending")]))


def _src(urls, ts, seq, deleted=False, **payload) -> pa.Table:
    n = len(urls)
    cols = {"url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([ts.as_py()] * n, pa.timestamp("us")),
            "seq": pa.array([seq] * n, pa.int64())}
    for k, v in payload.items():
        cols[k] = pa.array(v)
    cols[DELETED_COL] = pa.array([deleted] * n)
    return pa.table(cols)


def test_merge_wins_and_loses_by_lww(lake):
    live = lake_state(lake)
    urls = sorted(live["url"].to_pylist())
    fresh = _src(urls[:5], TS_HI, 1, text=["new"] * 5)
    stale = _src(urls[5:10], TS_LO, 1, text=["old"] * 5)
    src = concat_evolved([fresh, stale])
    m = merge_into(lake, ray.data.from_arrow(src.drop_columns([DELETED_COL])))
    assert m["version"] == read_manifest(lake).version
    got = lake_state(lake)
    assert url_text_digest(got) == url_text_digest(oracle_state(src))
    by_url = dict(zip(got["url"].to_pylist(), got["text"].to_pylist()))
    assert all(by_url[u] == "new" for u in urls[:5])      # fresh rows won
    assert all(by_url[u] != "old" for u in urls[5:10])    # stale rows lost


def test_delete_col_tombstones(lake):
    live = lake_state(lake)
    victims = sorted(live["url"].to_pylist())[:3]
    src = _src(victims, TS_HI, 1)
    ds = ray.data.from_arrow(
        src.rename_columns([c if c != DELETED_COL else "drop_it"
                            for c in src.column_names]))
    # the source marks every row as a delete
    ds = ds.map_batches(
        lambda t: t.set_column(t.column_names.index("drop_it"), "drop_it",
                               pa.array([True] * t.num_rows)),
        batch_format="pyarrow")
    merge_into(lake, ds, delete_col="drop_it")
    got = lake_state(lake)
    assert not set(victims) & set(got["url"].to_pylist())
    assert got.num_rows == live.num_rows - 3
    # tombstones persist in the files (replay idempotence invariant)
    full = pa.concat_tables(list(read_lake(lake, include_deleted=True)
                                 .iter_batches(batch_format="pyarrow")))
    assert full.num_rows >= got.num_rows + 3


def test_new_column_evolves_schema(lake):
    live = lake_state(lake)
    urls = sorted(live["url"].to_pylist())[:4]
    src = _src(urls, TS_HI, 1, title=[f"T:{u}" for u in urls])
    merge_into(lake, ray.data.from_arrow(src.drop_columns([DELETED_COL])))
    got = lake_state(lake)
    assert "title" in got.column_names
    titles = dict(zip(got["url"].to_pylist(), got["title"].to_pylist()))
    assert all(titles[u] == f"T:{u}" for u in urls)
    n_titled = sum(v is not None for v in titles.values())
    assert n_titled == 4  # everyone else is null


def test_remerge_is_state_noop(lake):
    urls = sorted(lake_state(lake)["url"].to_pylist())[:5]
    src = _src(urls, TS_HI, 7, text=["x"] * 5).drop_columns([DELETED_COL])
    merge_into(lake, ray.data.from_arrow(src))
    d1 = url_text_digest(lake_state(lake))
    v1 = read_manifest(lake).version
    merge_into(lake, ray.data.from_arrow(src))
    assert url_text_digest(lake_state(lake)) == d1
    assert read_manifest(lake).version == v1 + 1  # version moves, state not


def test_bootstrap_empty_lake(tmp_path):
    lake = str(tmp_path / "new_lake")
    src = _src(["https://a.example/1", "https://b.example/2"], TS_HI, 1,
               text=["p", "q"]).drop_columns([DELETED_COL])
    m = merge_into(lake, ray.data.from_arrow(src), num_partitions=2)
    assert m["version"] == 1
    got = lake_state(lake)
    assert got["url"].to_pylist() == sorted(src["url"].to_pylist())


def test_missing_order_columns_raise(lake):
    src = pa.table({"url": pa.array(["u"]), "text": pa.array(["x"])})
    with pytest.raises(ValueError, match="warc_ts"):
        merge_into(lake, ray.data.from_arrow(src))


def test_wrong_partition_count_raises(lake):
    src = _src(["https://a.example/1"], TS_HI, 1).drop_columns([DELETED_COL])
    with pytest.raises(ValueError, match="repartition_lake"):
        merge_into(lake, ray.data.from_arrow(src), num_partitions=8)


def test_source_with_deleted_col_is_implicit_delete_col(lake):
    """A source already carrying _deleted (e.g. a read_lake
    include_deleted=True export) with delete_col=None must treat it as the
    tombstone column instead of duplicating it (ADVICE r4)."""
    live = lake_state(lake)
    urls = sorted(live["url"].to_pylist())
    src = concat_evolved([_src(urls[:2], TS_HI, 1, deleted=True),
                          _src(urls[2:4], TS_HI, 1, deleted=False)])
    merge_into(lake, ray.data.from_arrow(src))  # no delete_col passed
    got = lake_state(lake)
    assert not set(urls[:2]) & set(got["url"].to_pylist())
    assert set(urls[2:4]) <= set(got["url"].to_pylist())


def test_deleted_col_collision_with_other_delete_col_raises(lake):
    src = _src(["https://a.example/1"], TS_HI, 1)  # carries _deleted
    src = src.append_column("drop_it", pa.array([False]))
    with pytest.raises(ValueError, match="_deleted"):
        merge_into(lake, ray.data.from_arrow(src), delete_col="drop_it")
