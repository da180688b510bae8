"""Round-5 second review wave: sort-key type edges (decimal/binary/date32
keys must route in the SAME order the partitions sort in), stale ordered-
lake parts, table_diff key widening + nested rejection, and view output-name
collisions."""

import datetime
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.cdc.diff import table_diff
from raycdc.cdc.views import count_view
from raycdc.ops.sort import (
    read_sorted_parquet,
    sort_dataset,
    write_sorted_parquet,
)


def _arrow(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def test_sort_decimal_key_routes_numerically():
    # decimal keys reach the router as numpy object arrays; stringifying
    # them ordered '10.00' < '9.00' while partitions sorted numerically —
    # a silently interleaved "global" order
    rng = np.random.default_rng(5)
    base = [Decimal("9.00"), Decimal("10.00"), Decimal("100.00"),
            Decimal("2.50"), Decimal("1000.25")]
    vals = [base[i] for i in rng.integers(0, len(base), 400)]
    t = pa.table({"k": pa.array(vals, pa.decimal128(10, 2)),
                  "i": pa.array(range(400), pa.int64())})
    out = sort_dataset(ray.data.from_arrow(t), ["k"], num_partitions=4)
    got = _arrow(out.dataset)["k"].to_pylist()
    assert got == sorted(vals)


def test_sort_binary_key_with_nulls():
    vals = [b"\x02", b"\x10", None, b"\x01", b"zz", None, b"a"] * 30
    t = pa.table({"k": pa.array(vals, pa.binary()),
                  "i": pa.array(range(len(vals)), pa.int64())})
    out = sort_dataset(ray.data.from_arrow(t), ["k"], num_partitions=3,
                       nulls_last=True)
    got = _arrow(out.dataset)["k"].to_pylist()
    nn = [v for v in vals if v is not None]
    assert got == sorted(nn) + [None] * (len(vals) - len(nn))


def test_sort_date32_and_time32_keys():
    days = [datetime.date(2026, 1, d) for d in (9, 3, 27, 15, 3)] * 20
    t = pa.table({"k": pa.array(days, pa.date32()),
                  "i": pa.array(range(len(days)), pa.int64())})
    out = sort_dataset(ray.data.from_arrow(t), ["k"], num_partitions=3)
    assert _arrow(out.dataset)["k"].to_pylist() == sorted(days)
    secs = [datetime.time(h, 0, 0) for h in (9, 3, 17, 3, 23)] * 20
    t2 = pa.table({"k": pa.array(secs, pa.time32("s")),
                   "i": pa.array(range(len(secs)), pa.int64())})
    out2 = sort_dataset(ray.data.from_arrow(t2), ["k"], num_partitions=3)
    assert _arrow(out2.dataset)["k"].to_pylist() == sorted(secs)


def test_write_sorted_parquet_removes_stale_parts(tmp_path):
    d = str(tmp_path / "lake")
    a = pa.table({"k": pa.array(range(1000), pa.int64())})
    write_sorted_parquet(
        sort_dataset(ray.data.from_arrow(a), ["k"], num_partitions=4), d)
    b = pa.table({"k": pa.array(range(5000, 5400), pa.int64())})
    write_sorted_parquet(
        sort_dataset(ray.data.from_arrow(b), ["k"], num_partitions=2), d)
    # a stale part-00002/3 from the first write would glob into this read
    # and pollute the row set (order-insensitive compare: Ray streams read
    # blocks in completion order — the layout contract is for pruning)
    got = _arrow(read_sorted_parquet(d, "k"))["k"].to_pylist()
    assert sorted(got) == list(range(5000, 5400))
    import os

    assert sorted(f for f in os.listdir(d) if f.endswith(".parquet")) == \
        ["part-00000.parquet", "part-00001.parquet"]


def test_table_diff_widens_mismatched_key_types():
    old = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int32()),
        "v": pa.array(["a", "b"], pa.string())}))
    new = ray.data.from_arrow(pa.table({
        "id": pa.array([2, 3], pa.int64()),
        "v": pa.array(["B", "c"], pa.string())}))
    out = _arrow(table_diff(old, new, key_cols=["id"], compare_cols=["v"],
                            num_partitions=4))
    assert out.schema.field("id").type == pa.int64()
    got = {r["id"]: r["op"] for r in out.to_pylist()}
    assert got == {1: "D", 2: "U", 3: "I"}


def test_table_diff_rejects_nested_compare_cols():
    t = pa.table({
        "id": pa.array([1], pa.int64()),
        "emb": pa.array([[1.0, 2.0]], pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="nested"):
        table_diff(ds, ds, key_cols=["id"], compare_cols=["emb"])


def test_view_output_name_colliding_with_group_col_rejected():
    live = ray.data.from_arrow(pa.table({
        "lang": ["en", "de"], "b": pa.array([1, 2], pa.int64())}))
    # the sum's output name would silently overwrite the grouping column
    with pytest.raises(ValueError, match="collide"):
        count_view(live, "lang", sums={"lang": "b"})
    with pytest.raises(ValueError, match="collide"):
        count_view(live, "lang", count_name="lang")
