"""Property tests: ordered_window and grouped_quantile against naive
row-at-a-time models, under adversarial small inputs (duplicate
timestamps, null values, singleton/empty groups, any partitioning)."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from raycdc.ops.ordered import grouped_quantile, ordered_window


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        s = ds.schema()
        return pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)]).empty_table()
    return pa.concat_tables(tabs, promote_options="default")


rows_strategy = st.lists(
    st.tuples(st.sampled_from("abc"),          # key
              st.integers(0, 5),               # ts (dense -> many ties)
              st.one_of(st.none(), st.integers(-100, 100))),  # value
    min_size=0, max_size=30)


def naive_window(rows):
    """Row-at-a-time model of ordered_window: per key sorted by (ts, id)."""
    out = {}
    by_key = {}
    for i, (k, ts, _v) in enumerate(rows):
        by_key.setdefault(k, []).append((ts, i))
    for k, items in by_key.items():
        items.sort()
        for rn, (ts, i) in enumerate(items, 1):
            prev_i = items[rn - 2][1] if rn > 1 else None
            next_i = items[rn][1] if rn < len(items) else None
            gap = (ts - items[rn - 2][0]) * 1_000_000 if rn > 1 else None
            out[i] = (k, rn, prev_i, next_i, gap)
    return out


@settings(max_examples=25, deadline=None)
@given(rows_strategy, st.integers(1, 4))
def test_ordered_window_matches_naive_model(rows, parts):
    ids = list(range(len(rows)))
    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "k": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    if len(rows) > 1:
        ds = ds.repartition(min(parts, len(rows)))
    out = to_table(ordered_window(
        ds, key_col="k", ts_col="ts", id_col="id",
        lag_cols=["id"], lead_cols=["id"], num_partitions=parts))
    want = naive_window(rows)
    assert out.num_rows == len(rows)
    for r in out.to_pylist():
        k, rn, prev_i, next_i, gap = want[r["id"]]
        assert (r["k"], r["rn"], r["prev_id"], r["next_id"], r["gap_us"]) \
            == (k, rn, prev_i, next_i, gap), (r, want[r["id"]])


@settings(max_examples=25, deadline=None)
@given(rows_strategy, st.sampled_from([0.01, 0.25, 0.5, 0.9, 1.0]),
       st.integers(1, 4))
def test_grouped_quantile_matches_naive_model(rows, q, parts):
    t = pa.table({
        "k": pa.array([r[0] for r in rows]),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    if len(rows) > 1:
        ds = ds.repartition(min(parts, len(rows)))
    out = to_table(grouped_quantile(ds, ["k"], "v", [q], names=["qq"],
                                    num_partitions=parts))
    # naive percentile_disc: sorted non-null values, element ceil(q*n)-1
    want = {}
    for k in set(r[0] for r in rows):
        vals = sorted(r[2] for r in rows if r[0] == k and r[2] is not None)
        if not vals:
            want[k] = None
        else:
            want[k] = vals[max(int(np.ceil(q * len(vals))) - 1, 0)]
    got = {r["k"]: r["qq"] for r in out.to_pylist()}
    assert got == want
