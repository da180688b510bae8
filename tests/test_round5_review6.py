"""Round-5 sixth review wave (agg/window/sources): SQL AVG and SUM null
semantics, weighted_sample id guard, rollup empty-schema sum typing, null
timestamps in event-time windows, window-size validation, and read_csv
skip_header_only validation."""

import datetime

import pyarrow as pa
import pytest
import ray.data

from raycdc.agg import grouped_aggregate, rollup_aggregate, weighted_sample
from raycdc.ops.window import (
    _parse_window_us,
    session_window,
    sliding_window,
    tumbling_window,
)
from raycdc.sources import read_csv


def _arrow(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return (pa.concat_tables(tables, promote_options="default")
            if tables else pa.table({}))


def _ts(*seconds):
    base = datetime.datetime(2024, 1, 1)
    return pa.array(
        [None if s is None else base + datetime.timedelta(seconds=s)
         for s in seconds], pa.timestamp("us"))


# ---------------------------------------------------------------------------
# grouped_aggregate: SQL null semantics for AVG and SUM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("exchange", ["sort", "partition"])
def test_grouped_mean_ignores_null_rows(exchange):
    # SQL AVG(x) = sum / count(non-null x) — one null row must not deflate
    # the mean; an all-null group is NULL, never 0/0
    t = pa.table({
        "k": pa.array(["a", "a", "b", "b"]),
        "x": pa.array([10, None, None, None], pa.int64()),
    })
    out = _arrow(grouped_aggregate(
        ray.data.from_arrow(t), ["k"], means={"avg_x": "x"},
        exchange=exchange, num_partitions=4))
    rows = {r["k"]: r["avg_x"] for r in out.to_pylist()}
    assert rows == {"a": 10.0, "b": None}


@pytest.mark.parametrize("exchange", ["sort", "partition"])
def test_grouped_sum_all_null_group_is_null(exchange):
    t = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "x": pa.array([None, None, 5], pa.int64()),
    })
    out = _arrow(grouped_aggregate(
        ray.data.from_arrow(t), ["k"], sums={"s": "x"},
        exchange=exchange, num_partitions=4))
    rows = {r["k"]: r["s"] for r in out.to_pylist()}
    assert rows == {"a": None, "b": 5}  # SQL SUM all-null -> NULL, not 0


def test_weighted_sample_rejects_negative_ids():
    t = pa.table({"doc_id": pa.array([-1, 2], pa.int64()),
                  "w": pa.array([1.0, 1.0])})
    with pytest.raises(Exception, match="non-negative"):  # RayTaskError
        _arrow(weighted_sample(ray.data.from_arrow(t), id_col="doc_id",
                               weight_col="w"))


def test_rollup_empty_input_keeps_float_sum_type():
    t = pa.table({"k": pa.array([], pa.string()),
                  "price": pa.array([], pa.float64())})
    out = _arrow(rollup_aggregate(ray.data.from_arrow(t), ["k"],
                                  sums={"s": "price"}))
    # empty fallback must match any non-empty run's schema (float64, never
    # an unconditional int64)
    assert out.schema.field("s").type == pa.float64()


# ---------------------------------------------------------------------------
# event-time windows: null timestamps and size validation
# ---------------------------------------------------------------------------

def test_tumbling_window_null_ts_is_null_group():
    t = pa.table({"k": pa.array(["a", "a", "a"]),
                  "ts": _ts(5, 65, None),
                  "v": pa.array([1, 2, 4], pa.int64())})
    out = _arrow(tumbling_window(ray.data.from_arrow(t), ts_col="ts",
                                 key_cols=["k"], window="1m",
                                 sums={"s": "v"}, count_name="n"))
    rows = {(r["k"], r["window_start"]): (r["s"], r["n"])
            for r in out.to_pylist()}
    base = datetime.datetime(2024, 1, 1)
    assert rows[("a", base)] == (1, 1)
    assert rows[("a", base + datetime.timedelta(seconds=60))] == (2, 1)
    assert rows[("a", None)] == (4, 1)  # SQL: NULL bucket group


def test_sliding_and_session_drop_null_ts():
    t = pa.table({"k": pa.array(["a", "a"]),
                  "ts": _ts(5, None),
                  "v": pa.array([1, 2], pa.int64())})
    slid = _arrow(sliding_window(ray.data.from_arrow(t), ts_col="ts",
                                 key_cols=["k"], window="2m", slide="1m",
                                 sums={"s": "v"}))
    assert sum(r["s"] for r in slid.to_pylist()) == 2  # v=1 in 2 windows
    sess = _arrow(session_window(ray.data.from_arrow(t), ts_col="ts",
                                 key_col="k", gap="1m", num_partitions=4))
    assert [r["n"] for r in sess.to_pylist()] == [1]  # null-ts row dropped


def test_window_size_must_be_positive():
    for bad in (0, -3, "0s", "-5m"):
        with pytest.raises(ValueError, match="positive"):
            _parse_window_us(bad)


def test_read_csv_skip_header_only_requires_schema(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="declared"):
        read_csv(str(p), skip_header_only=True)
