"""Round-5 third review wave: timestamp-unit correctness in windows, SQL
three-valued logic under NOT, SQL null semantics in approx_distinct,
masked-dtype pandas hops in quantiles/heavy hitters, and final-shaped empty
fallbacks in grouped aggregates."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.agg import grouped_aggregate, grouped_mode, grouped_string_agg
from raycdc.expr import filter_table
from raycdc.ops.sketch import _estimate, _registers, heavy_hitters
from raycdc.ops.window import _ts_us, tumbling_window


def _arrow(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if tables:
        return pa.concat_tables(tables)
    s = ds.schema()
    assert s is not None, "zero blocks AND no schema"
    return pa.schema(
        [pa.field(n, t) for n, t in zip(s.names, s.types)]).empty_table()


# --------------------------------------------------------- timestamp units


def test_ts_us_normalizes_every_storage_unit():
    # one logical instant, four storage units — identical microsecond ticks
    us = 1_700_000_000_123_456
    cases = [(pa.timestamp("s"), us // 1_000_000),
             (pa.timestamp("ms"), us // 1_000),
             (pa.timestamp("us"), us),
             (pa.timestamp("ns"), us * 1_000)]
    for typ, tick in cases:
        got = _ts_us(pa.array([tick], typ))
        want = us if typ.unit != "s" else (us // 1_000_000) * 1_000_000
        want = want if typ.unit != "ms" else (us // 1_000) * 1_000
        assert got[0] == want, typ


def test_tumbling_window_unit_invariant():
    # the same events stored as us and as ns must produce identical windows
    # (pre-fix: ns ticks were treated as us — windows 1000x too small)
    base = 1_700_000_000_000_000  # us
    ts_us = pa.array([base + i * 30_000_000 for i in range(20)],
                     pa.timestamp("us"))
    t_us = pa.table({"ts": ts_us, "k": ["a"] * 20,
                     "v": pa.array(range(20), pa.int64())})
    t_ns = t_us.set_column(0, "ts", ts_us.cast(pa.timestamp("ns")))
    out_us = _arrow(tumbling_window(
        ray.data.from_arrow(t_us), ts_col="ts", key_cols=["k"],
        window="1m", sums={"s": "v"})).sort_by("window_start")
    out_ns = _arrow(tumbling_window(
        ray.data.from_arrow(t_ns), ts_col="ts", key_cols=["k"],
        window="1m", sums={"s": "v"})).sort_by("window_start")
    assert out_us.equals(out_ns)
    assert out_us.num_rows == 10  # 20 events, 2 per 1-minute window


# ------------------------------------------------- SQL three-valued logic


def test_not_over_like_and_in_drops_null_rows():
    t = pa.table({"u": ["apple", None, "zzz"]})
    # both spellings of the same predicate must agree and drop the null row
    assert filter_table(t, "u NOT LIKE 'a%'")["u"].to_pylist() == ["zzz"]
    assert filter_table(t, "NOT u LIKE 'a%'")["u"].to_pylist() == ["zzz"]
    assert filter_table(t, "NOT u IN ('apple')")["u"].to_pylist() == ["zzz"]
    assert filter_table(t, "u NOT IN ('apple')")["u"].to_pylist() == ["zzz"]
    # positive forms unchanged
    assert filter_table(t, "u LIKE 'a%'")["u"].to_pylist() == ["apple"]
    assert filter_table(t, "u IN ('apple')")["u"].to_pylist() == ["apple"]


# ---------------------------------------------------------- sketch nulls


def test_approx_distinct_ignores_nulls():
    with_null = pa.array([1, 2, 3, None, None], pa.int64())
    without = pa.array([1, 2, 3], pa.int64())
    assert _estimate(_registers(with_null, 12)) == \
        _estimate(_registers(without, 12))


def test_heavy_hitters_big_int64_with_nulls():
    # pre-fix: the plain to_pandas hop flipped the nullable column to
    # float64 and 2^53+3 rounded to the wrong candidate value
    heavy = 2**53 + 3
    vals = [heavy] * 80 + [None] * 10 + list(range(10))
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    out = _arrow(heavy_hitters(ds, "v", threshold_frac=0.5))
    got = dict(zip(out["v"].to_pylist(), out["n"].to_pylist()))
    assert got.get(heavy) == 80, got


def test_heavy_hitters_schema_less_empty_upstream():
    # a fully-empty MAPPED pipeline degrades to schema() None (documented
    # Ray behavior); heavy_hitters must return a typed empty, not crash
    empty = pa.schema([("v", pa.string())]).empty_table()
    ds = ray.data.from_arrow(empty).map_batches(
        lambda t: t, batch_format="pyarrow")
    out = heavy_hitters(ds, "v")
    t = _arrow(out)
    assert t.num_rows == 0 and set(t.column_names) == {"v", "n"}


# ------------------------------------------- masked-dtype quantile groups


def test_grouped_quantile_multikey_big_int64_keys_with_null():
    from raycdc.ops.ordered import grouped_quantile

    a = pa.array([2**53, 2**53 + 1] * 10 + [None], pa.int64())
    b = pa.array(["x"] * 21, pa.string())
    v = pa.array([1.0, 100.0] * 10 + [50.0], pa.float64())
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b, "v": v}))
    out = _arrow(grouped_quantile(ds, ["a", "b"], "v", [0.5], ["med"],
                                  num_partitions=4))
    got = {r["a"]: r["med"] for r in out.to_pylist() if r["a"] is not None}
    # pre-fix both keys collapsed to one float64 group with a merged median
    assert got == {2**53: 1.0, 2**53 + 1: 100.0}


# --------------------------------------- final-shaped empty agg fallbacks


def test_grouped_aggregate_empty_input_keeps_final_schema():
    empty = pa.schema([("k", pa.string()), ("v", pa.int64())]).empty_table()
    out = grouped_aggregate(ray.data.from_arrow(empty), ["k"],
                            sums={"s": "v"}, means={"avg": "v"},
                            count_name="n", exchange="partition")
    s = out.schema()
    assert s is not None and s.names == ["k", "s", "avg", "n"]
    assert _arrow(out).num_rows == 0


def test_grouped_mode_all_null_values_keeps_contract_schema():
    t = pa.table({"k": ["a", "b"], "v": pa.array([None, None], pa.int64())})
    out = grouped_mode(ray.data.from_arrow(t), ["k"], "v",
                       num_partitions=4)
    got = _arrow(out)
    assert got.num_rows == 0
    assert got.column_names == ["k", "mode", "mode_n"]
    assert got.schema.field("mode").type == pa.int64()


def test_grouped_string_agg_empty_input_keeps_contract_schema():
    empty = pa.schema([("k", pa.string()), ("o", pa.int64()),
                       ("v", pa.string())]).empty_table()
    out = grouped_string_agg(ray.data.from_arrow(empty), ["k"], "v",
                             order_by=["o"], num_partitions=4)
    got = _arrow(out)
    assert got.num_rows == 0
    assert got.column_names == ["k", "agg"]
