"""grouped_mode / grouped_arg_extreme / grouped_string_agg vs DuckDB."""

import duckdb
import pyarrow as pa
import pytest
import ray

from raycdc.agg import grouped_arg_extreme, grouped_mode, grouped_string_agg


def to_table(ds) -> pa.Table:
    return pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
         if b.num_rows],
        promote_options="default") if ds.count() else pa.table({})


def test_grouped_mode_events(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    out = (to_table(grouped_mode(ev, ["user_id"], "event_type"))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    ref = duckdb.sql(f"""
        SELECT user_id, event_type AS mode, c AS mode_n FROM (
          SELECT user_id, event_type, count(*) c,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC, event_type) rn
          FROM '{sf_dir}/events.parquet'
          WHERE event_type IS NOT NULL GROUP BY 1, 2) WHERE rn = 1
        ORDER BY user_id""").df()
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["mode"].tolist() == ref["mode"].tolist()
    assert out["mode_n"].tolist() == ref["mode_n"].tolist()


def test_grouped_mode_ties_and_nulls():
    # k=a: b/c tie 2-2 -> min value "b" wins; k=b: all null -> absent
    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 2),
        "v": pa.array(["c", "b", "b", "c", None, None, None]),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = to_table(grouped_mode(ds, ["k"], "v")).to_pandas()
    assert out["k"].tolist() == ["a"]
    assert out["mode"].tolist() == ["b"]
    assert out["mode_n"].tolist() == [2]


def test_grouped_arg_max_events(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "event_type",
                                        "value"])
    out = (to_table(grouped_arg_extreme(
        ev, ["user_id"], "value", tie_col="event_id",
        carry=["event_type"]))
        .to_pandas().sort_values("user_id").reset_index(drop=True))
    ref = duckdb.sql(f"""
        SELECT user_id, value, event_id, event_type FROM (
          SELECT user_id, value, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) rn
          FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL)
        WHERE rn = 1 ORDER BY user_id""").df()
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["event_id"].tolist() == ref["event_id"].tolist()
    assert out["value"].tolist() == ref["value"].tolist()
    assert out["event_type"].tolist() == ref["event_type"].tolist()


def test_grouped_arg_min_ties_and_null_by():
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "by": pa.array([5, 5, 9, None, None], pa.int64()),
        "id": pa.array([30, 10, 20, 1, 2], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = (to_table(grouped_arg_extreme(ds, ["k"], "by", tie_col="id",
                                        mode="min"))
           .to_pandas().sort_values("k"))
    # k=1: min by=5 twice -> min id 10 wins; k=2 all-null by -> absent
    assert out["k"].tolist() == [1]
    assert out["id"].tolist() == [10]
    with pytest.raises(ValueError):
        grouped_arg_extreme(ds, ["k"], "by", tie_col="id", mode="best")


def test_grouped_string_agg_docs(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["lang", "source", "doc_id"])
    out = (to_table(grouped_string_agg(
        docs, ["lang", "source"], "doc_id", order_by=["doc_id"],
        name="doc_ids"))
        .to_pandas().sort_values(["lang", "source"]).reset_index(drop=True))
    ref = duckdb.sql(f"""
        SELECT lang, source,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                 AS doc_ids
        FROM '{sf_dir}/documents.parquet'
        GROUP BY 1, 2 ORDER BY lang, source""").df()
    assert out["lang"].tolist() == ref["lang"].tolist()
    assert out["source"].tolist() == ref["source"].tolist()
    assert out["doc_ids"].tolist() == ref["doc_ids"].tolist()


def test_grouped_string_agg_null_values():
    t = pa.table({
        "k": pa.array(["a", "a", "b", "b"]),
        "o": pa.array([2, 1, 1, 2], pa.int64()),
        "v": pa.array(["y", "x", None, None]),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    out = (to_table(grouped_string_agg(ds, ["k"], "v", order_by=["o"],
                                       name="s"))
           .to_pandas().sort_values("k").reset_index(drop=True))
    # nulls skipped; all-null group keeps its row with a null aggregate
    assert out["k"].tolist() == ["a", "b"]
    assert out["s"].tolist()[0] == "x,y"
    assert out["s"].isna().tolist() == [False, True]
