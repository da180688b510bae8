"""Global sort (sample-sort range exchange) and the ordered parquet
writer — order compared against DuckDB ORDER BY / row_number()."""

import glob
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from raycdc.ops.sort import (read_sorted_parquet, sort_dataset,
                             write_sorted_parquet)


def _mk_events(n=5000, seed=7, with_nulls=False):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 10_000, n)
    val = rng.integers(-500, 500, n)
    name = np.array([f"u{int(x):04d}" for x in rng.integers(0, 400, n)])
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64)),
        "val": pa.array(val.astype(np.int64)),
        "name": pa.array(name),
    })
    if with_nulls:
        mask = rng.random(n) < 0.05
        ts_null = pa.array(
            [None if m else int(v) for m, v in zip(mask, ts)], pa.int64())
        t = t.set_column(1, "ts", ts_null)
    return t


def _duck_order(t: pa.Table, order_by: str) -> pa.Table:
    con = duckdb.connect()
    con.register("t", t)
    out = con.execute(
        f"SELECT *, row_number() OVER (ORDER BY {order_by}) AS rank "
        f"FROM t ORDER BY {order_by}").arrow()
    con.close()
    return out.cast(out.schema.set(
        out.schema.get_field_index("rank"),
        pa.field("rank", pa.int64())))


def test_global_sort_matches_duckdb_order():
    t = _mk_events()
    ds = ray.data.from_arrow(t).repartition(13)
    res = sort_dataset(ds, ["ts", "event_id"], num_partitions=8,
                       sample_per_block=32, rank_col="rank")
    got = res.to_table()
    want = _duck_order(t, "ts, event_id")
    assert got.select(want.column_names).equals(want)
    # blocks really are range-ordered: partition row counts sum to n
    assert sum(res.partition_rows) == t.num_rows


def test_global_sort_descending_and_string_key():
    t = _mk_events(n=3000, seed=11)
    ds = ray.data.from_arrow(t).repartition(7)
    res = sort_dataset(ds, [("name", "descending"), ("event_id", "ascending")],
                       num_partitions=6, sample_per_block=64,
                       rank_col="rank")
    got = res.to_table()
    want = _duck_order(t, "name DESC, event_id")
    assert got.select(want.column_names).equals(want)


def test_global_sort_nulls_last_matches_duckdb():
    t = _mk_events(n=2000, seed=3, with_nulls=True)
    ds = ray.data.from_arrow(t).repartition(5)
    res = sort_dataset(ds, ["ts", "event_id"], num_partitions=4,
                       sample_per_block=32, rank_col="rank")
    got = res.to_table()
    want = _duck_order(t, "ts NULLS LAST, event_id")
    assert got.select(want.column_names).equals(want)


def test_global_sort_single_partition_and_empty():
    t = _mk_events(n=50)
    res = sort_dataset(ray.data.from_arrow(t), ["val", "event_id"],
                       num_partitions=1, rank_col="rank")
    got = res.to_table()
    want = _duck_order(t, "val, event_id")
    assert got.select(want.column_names).equals(want)

    empty = ray.data.from_arrow(t.slice(0, 0))
    res = sort_dataset(empty, ["val"], num_partitions=4, rank_col="rank")
    out = res.to_table()
    assert out.num_rows == 0
    assert "rank" in out.column_names


def test_global_sort_skewed_hot_key_stays_total():
    # one value dominates: every copy must land in ONE partition and the
    # order must still be total via the tiebreak column
    n = 4000
    ts = np.zeros(n, dtype=np.int64)
    ts[: n // 4] = np.arange(n // 4)
    t = pa.table({"ts": pa.array(ts),
                  "event_id": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(t).repartition(9)
    res = sort_dataset(ds, ["ts", "event_id"], num_partitions=8,
                       sample_per_block=16, rank_col="rank")
    got = res.to_table()
    want = _duck_order(t, "ts, event_id")
    assert got.select(want.column_names).equals(want)


def test_write_sorted_parquet_ordered_and_resumable(tmp_path):
    t = _mk_events(n=3000, seed=5)
    ds = ray.data.from_arrow(t).repartition(6)
    res = sort_dataset(ds, ["ts", "event_id"], num_partitions=5,
                       sample_per_block=64)
    out = str(tmp_path / "lake")
    manifest = write_sorted_parquet(res, out)
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert [m["file"] for m in manifest] == files
    assert all(not m["skipped"] for m in manifest)

    # lexicographic file order IS global order
    back = pa.concat_tables([pq.read_table(f) for f in files])
    want = _duck_order(t, "ts, event_id").drop_columns(["rank"])
    assert back.equals(want.select(back.column_names))

    # resume: delete one part, re-run — only that part is rewritten
    os.remove(files[2])
    manifest2 = write_sorted_parquet(res, out)
    assert [m["skipped"] for m in manifest2].count(False) == 1
    assert not manifest2[2]["skipped"]
    back2 = pa.concat_tables([pq.read_table(f) for f in files])
    assert back2.equals(back)


def test_read_sorted_parquet_prunes_and_filters(tmp_path):
    t = _mk_events(n=4000, seed=13)
    res = sort_dataset(ray.data.from_arrow(t).repartition(8),
                       ["ts", "event_id"], num_partitions=6,
                       sample_per_block=64)
    out = str(tmp_path / "lake")
    write_sorted_parquet(res, out)

    lo, hi = 2000, 4000
    got = pa.concat_tables(read_sorted_parquet(
        out, "ts", lo=lo, hi=hi).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    want = t.filter(pc.and_(pc.greater_equal(t["ts"], lo),
                            pc.less_equal(t["ts"], hi)))
    gs = got.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    ws = want.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    assert gs.equals(ws[gs.columns.tolist()])

    # pruning really happened: a narrow range opens fewer part files than
    # exist (the middle partitions cover disjoint ts ranges)
    import raycdc.ops.sort as sort_mod
    files = sorted(os.listdir(out))
    narrow = read_sorted_parquet(out, "ts", lo=0, hi=100)
    n_narrow = sum(b.num_rows for b in narrow.iter_batches(
        batch_size=None, batch_format="pyarrow"))
    assert n_narrow == sum(1 for v in t["ts"].to_pylist() if 0 <= v <= 100)
    assert len(files) == 6

    # out-of-range → empty with schema
    empty = read_sorted_parquet(out, "ts", lo=10_000_000, hi=20_000_000)
    assert empty.count() == 0

    # columns excluding the key is rejected when a bound is set
    import pytest
    with pytest.raises(ValueError):
        read_sorted_parquet(out, "ts", lo=0, hi=1, columns=["event_id"])
