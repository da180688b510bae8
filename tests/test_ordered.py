"""Ordered-window functions, grouped quantiles, rollup, hash sampling,
PII redaction — each compared against DuckDB computing the same thing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from raycdc.agg import hash_sample, rollup_aggregate
from raycdc.ops.ordered import grouped_quantile, ordered_window
from raycdc.ops.text import redact_pii


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        s = ds.schema()
        return pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)]).empty_table()
    return pa.concat_tables(tabs, promote_options="default")


def _sorted_df(t: pa.Table, by) -> pd.DataFrame:
    return (t.to_pandas().sort_values(by).reset_index(drop=True)
            .reindex(sorted(t.column_names), axis=1))


# ---------------------------------------------------------------- windows

def test_ordered_window_vs_duckdb(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    out = to_table(ordered_window(
        ev, key_col="user_id", ts_col="ts", id_col="event_id",
        lag_cols=["event_id"], lead_cols=["event_id"], num_partitions=8))
    ref = duckdb.sql(f"""
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               lag(event_id) OVER w AS prev_event_id,
               lead(event_id) OVER w AS next_event_id,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT)
                   AS gap_us
        FROM '{sf_dir}/events.parquet'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).arrow()
    a = _sorted_df(out, ["event_id"])
    b = _sorted_df(ref, ["event_id"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_ordered_window_tie_and_null_lag():
    # two rows with identical ts -> tiebreak by id; singleton key -> null lag
    t = pa.table({
        "id": pa.array([3, 1, 2, 9], pa.int64()),
        "k": ["a", "a", "a", "b"],
        "ts": pa.array([100, 100, 50, 7], pa.timestamp("us")),
    })
    out = to_table(ordered_window(
        ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
        lag_cols=["id"], lead_cols=["id"], num_partitions=2))
    rows = {r["id"]: r for r in out.to_pylist()}
    assert rows[2]["rn"] == 1 and rows[2]["prev_id"] is None
    assert rows[1]["rn"] == 2 and rows[1]["prev_id"] == 2
    assert rows[3]["rn"] == 3 and rows[3]["prev_id"] == 1  # ts tie: id order
    assert rows[3]["next_id"] is None
    assert rows[9]["rn"] == 1 and rows[9]["prev_id"] is None
    assert rows[9]["gap_us"] is None
    assert rows[1]["gap_us"] == 50 and rows[3]["gap_us"] == 0


def test_ordered_window_empty_input():
    t = pa.table({"id": pa.array([], pa.int64()),
                  "k": pa.array([], pa.string()),
                  "ts": pa.array([], pa.timestamp("us"))})
    out = to_table(ordered_window(
        ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
        lag_cols=["id"], num_partitions=2))
    assert out.num_rows == 0
    assert set(out.column_names) == {"id", "k", "rn", "prev_id", "gap_us"}


# -------------------------------------------------------------- quantiles

def test_grouped_quantile_vs_duckdb(sf_dir):
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_linestatus",
                                        "l_quantity"])
    out = to_table(grouped_quantile(
        li, ["l_returnflag", "l_linestatus"], "l_quantity",
        [0.25, 0.5, 0.9], num_partitions=4))
    ref = duckdb.sql(f"""
        SELECT l_returnflag, l_linestatus,
               quantile_disc(l_quantity, 0.25) AS q25,
               quantile_disc(l_quantity, 0.5)  AS q50,
               quantile_disc(l_quantity, 0.9)  AS q90
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
    """).arrow()
    a = _sorted_df(out, ["l_returnflag", "l_linestatus"])
    b = _sorted_df(ref, ["l_returnflag", "l_linestatus"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_grouped_quantile_nulls_and_all_null_group():
    t = pa.table({
        "g": ["a"] * 5 + ["b"] * 2,
        "x": pa.array([5.0, None, 1.0, 3.0, None, None, None]),
    })
    out = to_table(grouped_quantile(
        ray.data.from_arrow(t), ["g"], "x", [0.5], names=["med"],
        num_partitions=2))
    got = {r["g"]: r["med"] for r in out.to_pylist()}
    # group a: non-null sorted [1,3,5], median disc -> ceil(0.5*3)-1 = idx 1
    assert got == {"a": 3.0, "b": None}
    ref = duckdb.sql(
        "SELECT g, quantile_disc(x, 0.5) med FROM t GROUP BY 1").arrow()
    assert {r["g"]: r["med"] for r in ref.to_pylist()} == got


def test_grouped_quantile_single_key_int_col():
    rng = np.random.default_rng(7)
    t = pa.table({
        "g": pa.array(rng.integers(0, 5, 500), pa.int64()),
        "x": pa.array(rng.integers(0, 1000, 500), pa.int64()),
    })
    out = to_table(grouped_quantile(
        ray.data.from_arrow(t), ["g"], "x", [0.1, 0.99],
        names=["p10", "p99"], num_partitions=3))
    ref = duckdb.sql("""
        SELECT g, quantile_disc(x, 0.1) p10, quantile_disc(x, 0.99) p99
        FROM t GROUP BY 1""").arrow()
    a = _sorted_df(out, ["g"])
    b = _sorted_df(ref, ["g"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ----------------------------------------------------------------- rollup

def test_rollup_vs_duckdb(sf_dir):
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_linestatus",
                                        "l_quantity"])

    def qty_int(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        q = pc.cast(pc.floor(t["l_quantity"]), pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"], "qty": q})

    out = to_table(rollup_aggregate(
        li.map_batches(qty_int, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], sums={"sum_qty": "qty"},
        mins={"min_qty": "qty"}, maxs={"max_qty": "qty"}, count_name="n"))
    ref = duckdb.sql(f"""
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS sum_qty,
               MIN(CAST(FLOOR(l_quantity) AS BIGINT)) AS min_qty,
               MAX(CAST(FLOOR(l_quantity) AS BIGINT)) AS max_qty,
               COUNT(*) AS n
        FROM '{sf_dir}/lineitem.parquet'
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """).arrow()
    key = ["l_returnflag", "l_linestatus"]
    a = _sorted_df(out, key)
    b = _sorted_df(ref, key)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rollup_single_key_empty():
    t = pa.table({"k": pa.array([], pa.string()),
                  "v": pa.array([], pa.int64())})
    out = to_table(rollup_aggregate(
        ray.data.from_arrow(t), ["k"], sums={"s": "v"}, count_name="n"))
    # only the grand-total row survives on empty input (null sum, n = 0)
    rows = out.to_pylist()
    assert len(rows) == 1
    assert rows[0]["k"] is None and rows[0]["n"] == 0


# --------------------------------------------------------------- sampling

def test_hash_sample_vs_sql(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    out = to_table(hash_sample(ev, "event_id", 0.05))
    cut = int(0.05 * 4294967296)
    ref = duckdb.sql(f"""
        SELECT event_id, user_id FROM '{sf_dir}/events.parquet'
        WHERE (event_id * 2654435761) % 4294967296 < {cut}
    """).arrow()
    a = _sorted_df(out, ["event_id"])
    b = _sorted_df(ref, ["event_id"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # sanity: the sample is a real subset, roughly the requested fraction
    n_total = ray.data.read_parquet(f"{sf_dir}/events.parquet").count()
    assert 0 < out.num_rows < n_total
    assert abs(out.num_rows / n_total - 0.05) < 0.02


def test_hash_sample_deterministic_and_parallelism_invariant():
    t = pa.table({"id": pa.array(range(10_000), pa.int64())})
    a = to_table(hash_sample(ray.data.from_arrow(t), "id", 0.1))
    b = to_table(hash_sample(
        ray.data.from_arrow(t).repartition(7), "id", 0.1))
    assert sorted(a["id"].to_pylist()) == sorted(b["id"].to_pylist())


# ------------------------------------------------------------------- PII

def test_redact_pii_vs_duckdb():
    texts = [
        "mail me at jane.doe+spam@mail.example.org today",
        "call +1 (555) 010-4477 or 555 010 9999 now",
        "no pii here at all",
        "two mails a@b.co and c.d@e.f.museum plus 0800-123-456-789",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = to_table(redact_pii(ray.data.from_arrow(t)))
    from raycdc.ops.text import PII_EMAIL_RE, PII_PHONE_RE
    ref = duckdb.sql(f"""
        SELECT doc_id, regexp_replace(
                 regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PII_PHONE_RE}', '<PHONE>', 'g') AS text_redacted
        FROM t
    """).arrow()
    got = {r["doc_id"]: r["text_redacted"] for r in out.to_pylist()}
    want = {r["doc_id"]: r["text_redacted"] for r in ref.to_pylist()}
    assert got == want
    assert "<EMAIL>" in got[0] and "jane" not in got[0]
    assert got[1].count("<PHONE>") == 2
    assert got[2] == "no pii here at all"


def test_ordered_window_cum_sum_vs_duckdb(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])

    def add_int(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = pc.fill_null(
            pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()), 0)
        return t.append_column("value_c", v)

    out = to_table(ordered_window(
        ev.map_batches(add_int, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", id_col="event_id",
        cum_sums={"cum_value": "value_c"}, gap_name=None, num_partitions=8))
    ref = duckdb.sql(f"""
        SELECT event_id, user_id,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(SUM(COALESCE(CAST(FLOOR(value * 100) AS BIGINT), 0))
                    OVER w AS BIGINT) AS cum_value
        FROM '{sf_dir}/events.parquet'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).arrow()
    a = _sorted_df(out, ["event_id"])
    b = _sorted_df(ref, ["event_id"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_ordered_window_cum_sum_rejects_float():
    import pytest
    t = pa.table({"id": pa.array([1], pa.int64()), "k": ["a"],
                  "ts": pa.array([1], pa.timestamp("us")),
                  "v": pa.array([1.5])})
    with pytest.raises((TypeError, Exception)) as e:
        to_table(ordered_window(
            ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
            cum_sums={"cv": "v"}, num_partitions=1))
    assert "must be integer" in str(e.value)


# ------------------------------------------------------- stratified sample

def test_stratified_sample_vs_sql(sf_dir):
    from raycdc.agg import stratified_sample

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "event_type"])
    out = to_table(stratified_sample(ev, "event_type", "event_id", 50,
                                     num_partitions=4))
    ref = duckdb.sql(f"""
        SELECT event_id, user_id, event_type
        FROM '{sf_dir}/events.parquet'
        QUALIFY row_number() OVER (
            PARTITION BY event_type
            ORDER BY (event_id * 2654435761) % 4294967296, event_id) <= 50
    """).arrow()
    a = _sorted_df(out, ["event_id"])
    b = _sorted_df(ref, ["event_id"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stratified_sample_parallelism_invariant():
    from raycdc.agg import stratified_sample

    rng = np.random.default_rng(3)
    t = pa.table({
        "id": pa.array(range(5000), pa.int64()),
        "g": pa.array(rng.integers(0, 7, 5000).astype("U1")),
    })
    a = to_table(stratified_sample(
        ray.data.from_arrow(t), "g", "id", 10, num_partitions=2))
    b = to_table(stratified_sample(
        ray.data.from_arrow(t).repartition(9), "g", "id", 10,
        num_partitions=5))
    assert sorted(a["id"].to_pylist()) == sorted(b["id"].to_pylist())
    import collections
    by_g = collections.Counter(a["g"].to_pylist())
    assert all(v == 10 for v in by_g.values()) and len(by_g) == 7


# ------------------------------------------------------- approx quantiles

def test_approx_quantile_full_fidelity_is_exact(sf_dir):
    from raycdc.ops.sketch import approx_quantile

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    out = to_table(approx_quantile(ev, "value", [0.5, 0.95, 0.99],
                                   names=["q50", "q95", "q99"],
                                   m=10_000_000))
    ref = duckdb.sql(f"""
        SELECT quantile_disc(value, 0.5) q50, quantile_disc(value, 0.95) q95,
               quantile_disc(value, 0.99) q99
        FROM '{sf_dir}/events.parquet'""").arrow()
    assert out.to_pylist() == ref.to_pylist()


def test_approx_quantile_compressed_rank_error():
    from raycdc.ops.sketch import approx_quantile

    rng = np.random.default_rng(11)
    vals = rng.lognormal(0.0, 2.0, 200_000)
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(16)
    qs = [0.5, 0.9, 0.99]
    out = to_table(approx_quantile(ds, "x", qs, m=2048)).to_pylist()[0]
    sv = np.sort(vals)
    n = len(sv)
    for q in qs:
        got = out[f"q{int(q*100)}"]
        rank = np.searchsorted(sv, got, side="right")
        assert abs(rank / n - q) < 0.01, (q, got, rank / n)


def test_approx_quantile_empty_and_nulls():
    from raycdc.ops.sketch import approx_quantile

    t = pa.table({"x": pa.array([None, None], pa.float64())})
    out = to_table(approx_quantile(ray.data.from_arrow(t), "x", [0.5]))
    assert out.to_pylist() == [{"q50": None}]
    t2 = pa.table({"x": pa.array([None, 7.0, None, 3.0], pa.float64())})
    out2 = to_table(approx_quantile(ray.data.from_arrow(t2), "x", [0.5]))
    assert out2.to_pylist() == [{"q50": 3.0}]


# ------------------------------------------------------------------ pivot

def test_pivot_vs_duckdb(sf_dir):
    from raycdc.agg import pivot_aggregate

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_linestatus",
                                        "l_quantity"])

    def qty_int(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        q = pc.cast(pc.floor(t["l_quantity"]), pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"], "qty": q})

    out = to_table(pivot_aggregate(
        li.map_batches(qty_int, batch_format="pyarrow"),
        ["l_returnflag"], "l_linestatus", ["O", "F"],
        sums={"qty": "qty"}, count_prefix="n"))
    ref = duckdb.sql(f"""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(FLOOR(l_quantity) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS qty_O,
               CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT)
                    AS n_O,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(FLOOR(l_quantity) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS qty_F,
               CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT)
                    AS n_F
        FROM '{sf_dir}/lineitem.parquet' GROUP BY l_returnflag
    """).arrow()
    a = _sorted_df(out, ["l_returnflag"])
    b = _sorted_df(ref, ["l_returnflag"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pivot_null_pivot_values_contribute_zero():
    from raycdc.agg import pivot_aggregate

    t = pa.table({
        "k": ["a", "a", "b"],
        "p": pa.array(["x", None, "x"]),
        "v": pa.array([5, 7, 1], pa.int64()),
    })
    out = to_table(pivot_aggregate(
        ray.data.from_arrow(t), ["k"], "p", ["x", "y"],
        sums={"v": "v"}, count_prefix="n"))
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows["a"]["v_x"] == 5 and rows["a"]["n_x"] == 1
    assert rows["a"]["v_y"] == 0 and rows["a"]["n_y"] == 0
    assert rows["b"]["v_x"] == 1 and rows["b"]["n_x"] == 1


def test_cube_vs_duckdb(sf_dir):
    from raycdc.agg import cube_aggregate

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_linestatus",
                                        "l_quantity"])

    def qty_int(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        q = pc.cast(pc.floor(t["l_quantity"]), pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"], "qty": q})

    out = to_table(cube_aggregate(
        li.map_batches(qty_int, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], sums={"sum_qty": "qty"},
        maxs={"max_qty": "qty"}, count_name="n"))
    ref = duckdb.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               MAX(CAST(FLOOR(l_quantity) AS BIGINT)) AS max_qty,
               COUNT(*) AS n
        FROM '{sf_dir}/lineitem.parquet'
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """).arrow()
    key = ["l_returnflag", "l_linestatus"]
    a = _sorted_df(out, key)
    b = _sorted_df(ref, key)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# --------------------------------------------------------------- set ops

def test_except_intersect_vs_duckdb(sf_dir):
    from raycdc.agg import except_rows, intersect_rows

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])

    def side(et):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc
            c = t.filter(pc.equal(t["event_type"], et))
            us = c["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = pa.array((us // 3_600_000_000) * 3_600_000_000) \
                .cast(pa.timestamp("us"))
            return pa.table({"user_id": c["user_id"], "h": hour})
        return fn

    viewers = ev.map_batches(side("view"), batch_format="pyarrow")
    buyers = ev.map_batches(side("purchase"), batch_format="pyarrow")
    exc = to_table(except_rows(viewers, buyers, num_partitions=4))
    itc = to_table(intersect_rows(viewers, buyers, num_partitions=4))
    ref_exc = duckdb.sql(f"""
        SELECT user_id, date_trunc('hour', ts) AS h
        FROM '{sf_dir}/events.parquet' WHERE event_type = 'view'
        EXCEPT
        SELECT user_id, date_trunc('hour', ts)
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase'""").arrow()
    ref_itc = duckdb.sql(f"""
        SELECT user_id, date_trunc('hour', ts) AS h
        FROM '{sf_dir}/events.parquet' WHERE event_type = 'view'
        INTERSECT
        SELECT user_id, date_trunc('hour', ts)
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase'""").arrow()

    def key(t):
        return sorted(zip(t["user_id"].to_pylist(),
                          [str(v) for v in t["h"].to_pylist()]))

    assert key(exc) == key(ref_exc)
    assert key(itc) == key(ref_itc)
    assert exc.num_rows and itc.num_rows  # both sides non-trivial


def test_set_ops_null_rows_and_duplicates():
    from raycdc.agg import except_rows, intersect_rows

    l = ray.data.from_arrow(pa.table(
        {"x": pa.array([1, 1, None, 3], pa.int64())}))
    r = ray.data.from_arrow(pa.table(
        {"x": pa.array([None, 9], pa.int64())}))
    # SQL set semantics: distinct output; NULL equals NULL in set ops
    exc = sorted(to_table(except_rows(l, r, num_partitions=2))["x"]
                 .to_pylist(), key=lambda v: (v is None, v))
    itc = to_table(intersect_rows(l, r, num_partitions=2))["x"].to_pylist()
    assert exc == [1, 3]
    assert itc == [None]


# ------------------------------------------------------- unpivot/tokenize

def test_unpivot_vs_duckdb(sf_dir):
    from raycdc.agg import unpivot

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])
    out = to_table(unpivot(li, ["l_orderkey", "l_linenumber"],
                           ["l_quantity", "l_discount"]))
    ref = duckdb.sql(f"""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
               l_quantity AS value FROM '{sf_dir}/lineitem.parquet'
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM '{sf_dir}/lineitem.parquet'""").arrow()
    # the synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    # sort on every column for a deterministic comparison
    key = ["l_orderkey", "l_linenumber", "variable", "value"]
    a = _sorted_df(out, key)
    b = _sorted_df(ref, key)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_unpivot_mixed_types_promote():
    from raycdc.agg import unpivot

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "a": pa.array([1, 2], pa.int64()),
                  "b": pa.array([0.5, None], pa.float64())})
    out = to_table(unpivot(ray.data.from_arrow(t), ["id"], ["a", "b"]))
    assert out["value"].type == pa.float64()
    got = {(r["id"], r["variable"]): r["value"] for r in out.to_pylist()}
    assert got == {(1, "a"): 1.0, (2, "a"): 2.0, (1, "b"): 0.5,
                   (2, "b"): None}


def test_tokenize_explode_vs_duckdb(sf_dir):
    from raycdc.ops.text import tokenize_explode

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = to_table(tokenize_explode(docs))
    ref = duckdb.sql(rf"""
        SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
        FROM '{sf_dir}/documents.parquet'""").arrow()
    a = _sorted_df(out, ["doc_id", "token"])
    b = _sorted_df(ref, ["doc_id", "token"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tokenize_explode_empty_and_whitespace_docs():
    from raycdc.ops.text import tokenize_explode

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["  a  b ", "", "   ", None])})
    out = to_table(tokenize_explode(ray.data.from_arrow(t)))
    assert out.to_pylist() == [{"doc_id": 1, "token": "a"},
                               {"doc_id": 1, "token": "b"}]


def test_ordered_window_ntile_percent_rank_vs_duckdb(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    out = to_table(ordered_window(
        ev, key_col="user_id", ts_col="ts", id_col="event_id",
        gap_name=None, ntile=4, ntile_name="nt",
        percent_rank_name="pr", num_partitions=8))
    ref = duckdb.sql(f"""
        SELECT event_id, user_id,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(ntile(4) OVER w AS BIGINT) AS nt,
               percent_rank() OVER w AS pr
        FROM '{sf_dir}/events.parquet'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).arrow()
    a = _sorted_df(out, ["event_id"])
    b = _sorted_df(ref, ["event_id"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_ntile_small_groups():
    # 5 rows, ntile(3) -> sizes 2,2,1 (first n%k buckets get the extra row)
    t = pa.table({"id": pa.array(range(5), pa.int64()),
                  "k": ["a"] * 5,
                  "ts": pa.array(range(5), pa.timestamp("us"))})
    out = to_table(ordered_window(
        ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
        gap_name=None, ntile=3, num_partitions=2))
    got = {r["id"]: r["ntile"] for r in out.to_pylist()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3}


def test_grouped_aggregate_partition_exchange_equals_sort(sf_dir):
    from raycdc.agg import grouped_aggregate

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_linenumber",
                                        "l_quantity"])

    def run(exchange):
        return _sorted_df(to_table(grouped_aggregate(
            li, ["l_orderkey", "l_linenumber"],
            sums={"s": "l_quantity"}, maxs={"mx": "l_quantity"},
            count_name="n", exchange=exchange, num_partitions=4)),
            ["l_orderkey", "l_linenumber"])

    pd.testing.assert_frame_equal(run("sort"), run("partition"),
                                  check_dtype=False)


def test_ordered_window_and_quantile_null_keys():
    """SQL PARTITION BY / GROUP BY treat NULL keys as one group."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array(["a", None, None, "a"]),
        "ts": pa.array([10, 20, 30, 40], pa.timestamp("us")),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = to_table(ordered_window(
        ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
        cum_sums={"cv": "v"}, gap_name=None, num_partitions=2))
    rows = {r["id"]: r for r in out.to_pylist()}
    assert rows[2]["rn"] == 1 and rows[3]["rn"] == 2      # null group
    assert rows[3]["cv"] == 5                              # 2 + 3
    assert rows[1]["rn"] == 1 and rows[4]["rn"] == 2
    ref = duckdb.sql("""
        SELECT id, CAST(row_number() OVER w AS BIGINT) rn,
               CAST(SUM(v) OVER w AS BIGINT) cv
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, id)""").arrow()
    want = {r["id"]: r for r in ref.to_pylist()}
    for i in (1, 2, 3, 4):
        assert (rows[i]["rn"], rows[i]["cv"]) == \
            (want[i]["rn"], want[i]["cv"])

    q = to_table(grouped_quantile(
        ray.data.from_arrow(t), ["k"], "v", [1.0], names=["mx"],
        num_partitions=2))
    got = {r["k"]: r["mx"] for r in q.to_pylist()}
    assert got == {"a": 4, None: 3}


# --------------------------------------------------- grouped distinct count

def test_grouped_count_distinct_vs_duckdb(sf_dir):
    from raycdc.agg import grouped_count_distinct

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    out = to_table(grouped_count_distinct(ev, ["event_type"], "user_id",
                                          num_partitions=4))
    ref = duckdb.sql(f"""
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS nd
        FROM '{sf_dir}/events.parquet' GROUP BY 1""").arrow()
    a = _sorted_df(out, ["event_type"])
    b = _sorted_df(ref, ["event_type"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_approx_distinct_by_accuracy_and_layout_invariance():
    from raycdc.ops.sketch import approx_distinct_by

    rng = np.random.default_rng(13)
    n = 120_000
    groups = rng.integers(0, 6, n)
    # distinct cardinality varies per group: group g draws from g*3000+5 ids
    vals = np.array([rng.integers(0, g * 3000 + 5) for g in groups])
    t = pa.table({"g": pa.array(groups.astype("int64")),
                  "v": pa.array(vals.astype("int64"))})
    exact = {g: len(set(vals[groups == g])) for g in range(6)}
    a = to_table(approx_distinct_by(
        ray.data.from_arrow(t).repartition(8), "g", "v", num_partitions=4))
    b = to_table(approx_distinct_by(
        ray.data.from_arrow(t).repartition(3), "g", "v", num_partitions=2))
    got_a = {r["g"]: r["approx_nd"] for r in a.to_pylist()}
    got_b = {r["g"]: r["approx_nd"] for r in b.to_pylist()}
    assert got_a == got_b  # sketch is layout-invariant (elementwise max)
    for g, nd in exact.items():
        assert abs(got_a[g] - nd) / max(nd, 1) < 0.05, (g, nd, got_a[g])


def test_approx_distinct_by_null_keys_and_values():
    from raycdc.ops.sketch import approx_distinct_by

    t = pa.table({"g": pa.array(["a", None, "a", None, "b"]),
                  "v": pa.array([1, 2, None, 2, 7], pa.int64())})
    out = to_table(approx_distinct_by(ray.data.from_arrow(t), "g", "v",
                                      num_partitions=2))
    got = {r["g"]: r["approx_nd"] for r in out.to_pylist()}
    # null keys form one group (SQL); null values are not counted
    assert got == {"a": 1, None: 1, "b": 1}


def test_full_outer_join_vs_duckdb(sf_dir):
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import hash_join

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey",
                                            "o_orderpriority"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_acctbal"])

    def okey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        c = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return pa.table({"custkey": c["o_custkey"]})

    def ckey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        c = t.filter(pc.less(t["c_acctbal"], 0.0))
        return pa.table({"custkey": c["c_custkey"],
                         "c_acctbal": c["c_acctbal"]})

    left = grouped_aggregate(orders.map_batches(okey, batch_format="pyarrow"),
                             ["custkey"], count_name="n_orders")
    right = cust.map_batches(ckey, batch_format="pyarrow")
    out = to_table(hash_join(left, right, on=["custkey"],
                             join_type="full_outer", num_partitions=4))
    ref = duckdb.sql(f"""
        WITH l AS (SELECT o_custkey AS custkey, count(*) AS n_orders
                   FROM '{sf_dir}/orders.parquet'
                   WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
             r AS (SELECT c_custkey AS custkey, c_acctbal
                   FROM '{sf_dir}/customer.parquet' WHERE c_acctbal < 0)
        SELECT COALESCE(l.custkey, r.custkey) AS custkey, l.n_orders,
               r.c_acctbal
        FROM l FULL OUTER JOIN r ON l.custkey = r.custkey""").arrow()
    a = _sorted_df(out, ["custkey"])
    b = _sorted_df(ref, ["custkey"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # non-trivial on both sides: rows unmatched left AND right exist
    d = out.to_pandas()
    assert d["n_orders"].isna().any() and d["c_acctbal"].isna().any()


def test_grouped_approx_quantile_full_fidelity_is_exact(sf_dir):
    from raycdc.ops.sketch import grouped_approx_quantile

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity"])
    out = to_table(grouped_approx_quantile(
        li, "l_returnflag", "l_quantity", [0.25, 0.5, 0.9],
        names=["q25", "q50", "q90"], m=10_000_000, num_partitions=4))
    ref = duckdb.sql(f"""
        SELECT l_returnflag, quantile_disc(l_quantity, 0.25) q25,
               quantile_disc(l_quantity, 0.5) q50,
               quantile_disc(l_quantity, 0.9) q90
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1""").arrow()
    a = _sorted_df(out, ["l_returnflag"])
    b = _sorted_df(ref, ["l_returnflag"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_grouped_approx_quantile_compressed_rank_error():
    from raycdc.ops.sketch import grouped_approx_quantile

    rng = np.random.default_rng(17)
    n = 200_000
    groups = rng.integers(0, 4, n)
    vals = rng.lognormal(0.0, 2.0, n) * (groups + 1)
    t = pa.table({"g": pa.array(groups.astype("int64")),
                  "x": pa.array(vals)})
    out = to_table(grouped_approx_quantile(
        ray.data.from_arrow(t).repartition(16), "g", "x", [0.5, 0.95],
        names=["q50", "q95"], m=512, num_partitions=4))
    got = {r["g"]: r for r in out.to_pylist()}
    for g in range(4):
        gv = np.sort(vals[groups == g])
        for q, nm in [(0.5, "q50"), (0.95, "q95")]:
            rank = np.searchsorted(gv, got[g][nm], side="right")
            assert abs(rank / len(gv) - q) < 0.02, (g, q, rank / len(gv))


def test_grouped_approx_quantile_null_handling():
    from raycdc.ops.sketch import grouped_approx_quantile

    t = pa.table({"g": pa.array(["a"] * 3 + ["b"] * 2),
                  "x": pa.array([3.0, None, 1.0, None, None])})
    out = to_table(grouped_approx_quantile(
        ray.data.from_arrow(t), "g", "x", [0.5], names=["med"],
        num_partitions=2))
    got = {r["g"]: r["med"] for r in out.to_pylist()}
    assert got == {"a": 1.0, "b": None}


# ------------------------------------------------- review-fix regressions

def test_ordered_window_null_ts_matches_oracle():
    """Null timestamps sort LAST (SQL NULLS LAST) and gaps touching a null
    ts are null — regression for the NaN->int64 undefined cast."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": ["a", "a", "a", "b"],
        "ts": pa.array([100, None, 50, None], pa.timestamp("us")),
    })
    out = to_table(ordered_window(
        ray.data.from_arrow(t), key_col="k", ts_col="ts", id_col="id",
        lag_cols=["id"], num_partitions=2))
    ref = duckdb.sql("""
        SELECT id, CAST(row_number() OVER w AS BIGINT) rn,
               lag(id) OVER w AS prev_id,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT)
                   AS gap_us
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, id)""").arrow()
    got = {r["id"]: (r["rn"], r["prev_id"], r["gap_us"])
           for r in out.to_pylist()}
    want = {r["id"]: (r["rn"], r["prev_id"], r["gap_us"])
            for r in ref.to_pylist()}
    assert got == want
    assert got[2] == (3, 1, None)  # null ts last; gap through null is null


def test_grouped_count_distinct_all_null_group():
    from raycdc.agg import grouped_count_distinct

    t = pa.table({"g": ["a", "a", "b", "b"],
                  "v": pa.array([1, 1, None, None], pa.int64())})
    out = to_table(grouped_count_distinct(
        ray.data.from_arrow(t), ["g"], "v", num_partitions=2))
    got = {r["g"]: r["nd"] for r in out.to_pylist()}
    ref = duckdb.sql("SELECT g, CAST(count(DISTINCT v) AS BIGINT) nd "
                     "FROM t GROUP BY 1").arrow()
    assert got == {r["g"]: r["nd"] for r in ref.to_pylist()} == \
        {"a": 1, "b": 0}


def test_hash_samplers_reject_negative_ids():
    import pytest

    from raycdc.agg import hash_sample, stratified_sample

    t = pa.table({"id": pa.array([-1, 2], pa.int64()), "g": ["a", "a"]})
    with pytest.raises(Exception, match="non-negative"):
        to_table(hash_sample(ray.data.from_arrow(t), "id", 0.5))
    with pytest.raises(Exception, match="non-negative"):
        to_table(stratified_sample(ray.data.from_arrow(t), "g", "id", 1,
                                   num_partitions=2))


def test_roll_sums_brute_force():
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 37, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    out = to_table(ordered_window(
        ds, key_col="k", ts_col="ts", id_col="id", gap_name=None,
        roll_sums={"r3": ("v", 3), "r1": ("v", 1)},
        num_partitions=4)).to_pandas().set_index("id")
    sdf = df.sort_values(["k", "ts", "id"], kind="mergesort")
    for k, g in sdf.groupby("k"):
        vals = g["v"].to_numpy()
        ids = g["id"].to_numpy()
        for i in range(len(g)):
            expect = vals[max(0, i - 2):i + 1].sum()
            assert out.loc[ids[i], "r3"] == expect
            assert out.loc[ids[i], "r1"] == vals[i]


def test_roll_sums_rejects_bad_args():
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "k": pa.array(["a"]),
                  "ts": pa.array([0], pa.timestamp("us")),
                  "v": pa.array([1.5], pa.float64())})
    ds = ray.data.from_arrow(t)
    import pytest
    with pytest.raises(ValueError):
        ordered_window(ds, key_col="k", ts_col="ts", id_col="id",
                       roll_sums={"r": ("v", 0)})
    with pytest.raises(Exception):  # float column rejected inside the task
        to_table(ordered_window(ds, key_col="k", ts_col="ts", id_col="id",
                                roll_sums={"r": ("v", 2)}))
