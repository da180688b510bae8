"""Windowed aggregation + list explode tests."""

import numpy as np
import pyarrow as pa
import ray.data

from raycdc.ops.window import session_window, sliding_window, tumbling_window
from raycdc.record_flatten import explode_list_table


def events():
    base = 1_700_000_000_000_000  # us
    ts = [base, base + 10 * 60e6, base + 70 * 60e6, base + 200 * 60e6]
    return pa.table({
        "ts": pa.array([int(t) for t in ts], pa.timestamp("us")),
        "k": ["a", "a", "a", "a"],
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    })


def to_df(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).to_pandas()


def test_tumbling_window():
    out = to_df(tumbling_window(ray.data.from_arrow(events()), ts_col="ts",
                                key_cols=["k"], window="1h",
                                maxs={"max_v": "v"}, count_name="n"))
    out = out.sort_values("window_start").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1, 1]
    assert out["max_v"].tolist() == [2.0, 3.0, 4.0]


def test_sliding_window():
    out = to_df(sliding_window(ray.data.from_arrow(events()), ts_col="ts",
                               key_cols=["k"], window="2h", slide="1h",
                               count_name="n"))
    # each event covered by exactly 2 windows
    assert out["n"].sum() == 8


def test_session_window():
    out = to_df(session_window(ray.data.from_arrow(events()), ts_col="ts",
                               key_col="k", gap="1h"))
    # gaps: 10min (merge), 60min (merge: == gap edge? 60min > gap? gap=1h ->
    # 60*60e6 not > gap_us, merge), 130min (split)
    assert len(out) == 2
    assert sorted(out["n"].tolist()) == [1, 3]


def test_explode_list_table():
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "xs": pa.array([[10, 20], [], [30]], pa.list_(pa.int64()))})
    out = explode_list_table(t, "xs", element_col="x", index_col="i")
    assert out["id"].to_pylist() == [1, 1, 3]
    assert out["x"].to_pylist() == [10, 20, 30]
    assert out["i"].to_pylist() == [0, 1, 0]
