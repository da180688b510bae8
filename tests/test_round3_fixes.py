"""Round-3 regression tests for the ADVICE findings.

- asof/interval joins with INT by-keys containing nulls (the pandas
  int64→float64 dtype flip that made merge_asof raise MergeError)
- bloom_semi_join key-hash dtype normalization (int32 build vs int64
  probe previously produced bloom false NEGATIVES)
- hash_sample / stratified_sample null-id handling
- _grouping_sets nullable-int stability (masked dtypes, not float64)
- _et_hours null-timestamp rows (Arrow floor_temporal, no numpy hop)
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def to_table(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    return (pa.concat_tables(tables, promote_options="default")
            if tables else None)


# ------------------------------------------------- asof int by-key nulls
def test_asof_join_null_int_by_keys_never_match():
    """An int64 `by` column with a null on ONE side of a partition used to
    flip that side's pandas skeleton to float64 and crash merge_asof with
    MergeError('incompatible merge keys'); null rows must instead be
    filtered on Arrow and survive as unmatched left-outer rows."""
    from raycdc.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([20, 20, 20], pa.int64()),
        "k": pa.array([1, None, 2], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "ts": pa.array([6, 6], pa.int64()),
        "rv": pa.array([60, 70], pa.int64()),
    }))
    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=2))
    got = {r["lid"]: r["rv"] for r in out.to_pylist()}
    assert got == {1: 60, 2: None, 3: 70}


def test_asof_join_null_int_on_keys():
    """Null `on` (int64) on one side only — same dtype-flip hazard."""
    from raycdc.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, None], pa.int64()),
        "k": pa.array([1, 1], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([5], pa.int64()),
        "rv": pa.array([50], pa.int64()),
    }))
    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=1))
    got = {r["lid"]: r["rv"] for r in out.to_pylist()}
    assert got == {1: 50, 2: None}


def test_asof_join_cross_width_int_keys():
    """int32 left keys vs int64 right keys: skeletons normalize to int64
    on both sides so merge_asof never sees mismatched dtypes."""
    from raycdc.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, 10], pa.int32()),
        "k": pa.array([7, -8], pa.int32()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([7, -8], pa.int64()),
        "ts": pa.array([5, 50], pa.int64()),
        "rv": pa.array([70, 80], pa.int64()),
    }))
    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=2))
    got = {r["lid"]: r["rv"] for r in out.to_pylist()}
    assert got == {1: 70, 2: None}


def test_interval_join_null_int_by_keys():
    from raycdc.joins import interval_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([5, 5], pa.int64()),
        "k": pa.array([1, None], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()),
        "lo": pa.array([0, 0], pa.int64()),
        "hi": pa.array([10, 10], pa.int64()),
        "rv": pa.array([7, 8], pa.int64()),
    }))
    outer = to_table(interval_join(left, right, on="ts", by=["k"],
                                   lo="lo", hi="hi", join_type="left_outer",
                                   num_partitions=2))
    got = {r["lid"]: r["rv"] for r in outer.to_pylist()}
    assert got == {1: 7, 2: None}


def test_asof_join_nan_float_by_keys_never_match():
    """NaN float by-keys are excluded like nulls (the previous notna()
    semantics) — NaN != NaN in merge-key land."""
    from raycdc.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([20, 20], pa.int64()),
        "k": pa.array([1.0, float("nan")], pa.float64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1.0, float("nan")], pa.float64()),
        "ts": pa.array([6, 6], pa.int64()),
        "rv": pa.array([60, 99], pa.int64()),
    }))
    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=1))
    got = {r["lid"]: r["rv"] for r in out.to_pylist()}
    assert got == {1: 60, 2: None}


# --------------------------------------------------- bloom dtype parity
def test_bloom_key_hash_normalizes_int_widths():
    from raycdc.joins import _key_hash64

    t32 = pa.table({"k": pa.array([1, -2, 3, -2147483648], pa.int32())})
    t64 = pa.table({"k": pa.array([1, -2, 3, -2147483648], pa.int64())})
    assert np.array_equal(_key_hash64(t32, ["k"]), _key_hash64(t64, ["k"]))
    # round-4 rule: temporal keys hash as ns-equivalent ticks, so the same
    # instant hashes identically across units (us vs ns vs ms)
    ts_us = pa.table({"k": pa.array([0, 10**6], pa.timestamp("us"))})
    ts_ns = pa.table({"k": pa.array([0, 10**9], pa.timestamp("ns"))})
    ts_ms = pa.table({"k": pa.array([0, 10**3], pa.timestamp("ms"))})
    h = _key_hash64(ts_us, ["k"])
    assert np.array_equal(h, _key_hash64(ts_ns, ["k"]))
    assert np.array_equal(h, _key_hash64(ts_ms, ["k"]))


def test_bloom_semi_join_int32_vs_int64_keys():
    """int32 probe keys against an int64 build side (negatives included)
    must keep every true match — the unnormalized hash made these bloom
    false negatives, silently dropping rows."""
    from raycdc.joins import bloom_semi_join, hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, -2, 3, 4, -5], pa.int32()),
        "lv": ["a", "b", "c", "d", "e"],
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([-2, 3, -5, 9], pa.int64()),
        "rv": ["x", "y", "z", "w"],
    }))
    bloom = to_table(bloom_semi_join(left, right, on=["k"], right_on=["rk"],
                                     num_partitions=4, auto_skip=None))
    exact = to_table(hash_join(left, right, on=["k"], right_on=["rk"],
                               join_type="left_semi", num_partitions=4))
    assert set(bloom["lv"].to_pylist()) == set(exact["lv"].to_pylist()) \
        == {"b", "c", "e"}


def test_bloom_semi_join_auto_skip_unselective():
    """Every left key matches → the sampled survival rate is 1.0 and the
    probe stage is skipped; rows must be identical either way."""
    from raycdc.joins import bloom_semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(100)), pa.int64()),
        "lv": [f"v{i}" for i in range(100)],
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(list(range(100)), pa.int64()),
    }))
    out = to_table(bloom_semi_join(left, right, on=["k"], right_on=["rk"],
                                   num_partitions=4, auto_skip=0.9))
    assert out.num_rows == 100


def test_hash_join_cross_width_int_keys():
    from raycdc.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, -2, 3], pa.int32()), "lv": ["a", "b", "c"]}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([-2, 3, 5], pa.int64()), "rv": ["x", "y", "z"]}))
    out = to_table(hash_join(left, right, on=["k"], right_on=["rk"],
                             num_partitions=4))
    assert set(zip(out["lv"].to_pylist(), out["rv"].to_pylist())) == \
        {("b", "x"), ("c", "y")}


# ------------------------------------------------------- sampler nulls
def test_hash_sample_drops_null_ids():
    """Null ids behave like the SQL oracle: the WHERE predicate is NULL →
    row dropped (previously NaN.astype(uint64) kept/dropped arbitrarily)."""
    from raycdc.agg import hash_sample

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, None, 2, None, 3] + list(range(10, 200)),
                       pa.int64())}))
    out = to_table(hash_sample(ds, "id", 1.0))
    ids = out["id"].to_pylist()
    assert None not in ids
    assert len(ids) == 193  # every non-null id kept at frac=1.0


def test_hash_sample_rejects_negative_ids():
    from raycdc.agg import hash_sample

    ds = ray.data.from_arrow(pa.table({"id": pa.array([1, -2], pa.int64())}))
    with pytest.raises(Exception, match="non-negative"):
        to_table(hash_sample(ds, "id", 0.5))


def test_stratified_sample_rejects_null_ids():
    from raycdc.agg import stratified_sample

    ds = ray.data.from_arrow(pa.table({
        "g": ["a", "a", "b"], "id": pa.array([1, None, 2], pa.int64())}))
    with pytest.raises(Exception, match="non-null"):
        to_table(stratified_sample(ds, "g", "id", 1, num_partitions=2))


# -------------------------------------------- grouping sets nullable int
def test_rollup_nullable_int_keys_and_big_values():
    """A null int key plus an int value past 2^53: the driver-side coarser
    levels must round-trip through masked Int64, not float64."""
    from raycdc.agg import rollup_aggregate

    big = (1 << 53) + 1
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 1, None], pa.int64()),
        "b": pa.array([10, 20, 30], pa.int64()),
        "v": pa.array([big, 1, 2], pa.int64()),
    }))
    out = to_table(rollup_aggregate(ds, ["a", "b"], sums={"s": "v"},
                                    mins={"mn": "v"}, maxs={"mx": "v"},
                                    count_name="n")).to_pylist()
    assert out and all(isinstance(r["s"], int) for r in out)
    grand = [r for r in out if r["a"] is None and r["b"] is None
             and r["n"] == 3]
    assert grand and grand[0]["s"] == big + 3 and grand[0]["mx"] == big
    finest = {(r["a"], r["b"]): r for r in out if r["n"] == 1}
    assert finest[(1, 10)]["s"] == big
    assert finest[(None, 30)]["s"] == 2  # null key is its own group


def test_rollup_cap_raises_loudly():
    from raycdc import agg as agg_mod
    from raycdc.agg import rollup_aggregate

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(list(range(50)), pa.int64()),
        "v": pa.array([1] * 50, pa.int64()),
    }))
    old = agg_mod._GROUPING_SETS_MAX_ROWS
    agg_mod._GROUPING_SETS_MAX_ROWS = 10
    try:
        with pytest.raises(ValueError, match="finest grouping level"):
            rollup_aggregate(ds, ["a"], sums={"s": "v"})
    finally:
        agg_mod._GROUPING_SETS_MAX_ROWS = old


# ---------------------------------------------------- _et_hours null ts
def test_et_hours_null_timestamps_survive(tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    t = pa.table({
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([1_700_000_123_000_000, None, 7_200_000_000],
                       pa.timestamp("us")),
        "event_type": pa.array(["view", "view", "purchase"]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = to_table(entry._et_hours(str(tmp_path), "view")).to_pylist()
    got = {r["user_id"]: r["h"] for r in out}
    assert got[2] is None  # null ts → null hour row, like date_trunc
    assert got[1] is not None and got[1].minute == 0 and got[1].second == 0


# ---------------------------------------- temporal unit normalization
def test_asof_join_mixed_timestamp_units():
    """left on=timestamp[us] vs right on=timestamp[ms] must compare logical
    instants: the skeleton used to cast each side to int64 in its NATIVE
    unit, so ms ticks silently compared against us ticks (every left row
    matched the numerically-smaller ms value)."""
    from raycdc.joins import asof_join

    lt = pa.table({
        "k": pa.array(["a", "a", "a"]),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "lv": pa.array([1, 2, 3], pa.int64()),
    })
    rt = pa.table({
        "k": pa.array(["a", "a"]),
        "ts": pa.array([1_000, 2_500], pa.timestamp("ms")),
        "rv": pa.array([10, 25], pa.int64()),
    })
    out = to_table(asof_join(ray.data.from_arrow(lt),
                             ray.data.from_arrow(rt),
                             on="ts", by=["k"], num_partitions=2))
    got = dict(zip(out["lv"].to_pylist(), out["rv"].to_pylist()))
    # 1s -> interval starting 1s (rv=10); 2s -> still 1s; 3s -> 2.5s (25)
    assert got == {1: 10, 2: 10, 3: 25}


def test_interval_join_mixed_timestamp_units():
    from raycdc.joins import interval_join

    lt = pa.table({
        "k": pa.array(["a", "a"]),
        "ts": pa.array([1_500_000, 4_000_000], pa.timestamp("us")),
        "lv": pa.array([1, 2], pa.int64()),
    })
    rt = pa.table({
        "k": pa.array(["a"]),
        "lo": pa.array([1_000], pa.timestamp("ms")),
        "hi": pa.array([2_000], pa.timestamp("ms")),
        "rv": pa.array([10], pa.int64()),
    })
    out = to_table(interval_join(ray.data.from_arrow(lt),
                                 ray.data.from_arrow(rt),
                                 on="ts", by=["k"], lo="lo", hi="hi",
                                 num_partitions=2))
    # 1.5s inside [1s, 2s]; 4s outside
    assert out["lv"].to_pylist() == [1] and out["rv"].to_pylist() == [10]


def test_hash_join_mixed_timestamp_units_widen():
    """Same-named timestamp keys with different units now widen to us and
    join on logical instants (previously a loud dtype-incompatible error)."""
    from raycdc.joins import hash_join

    lt = pa.table({"ts": pa.array([1_000_000, 2_000_000],
                                  pa.timestamp("us")),
                   "lv": pa.array([1, 2], pa.int64())})
    rt = pa.table({"ts": pa.array([1_000, 3_000], pa.timestamp("ms")),
                   "rv": pa.array([10, 30], pa.int64())})
    out = to_table(hash_join(ray.data.from_arrow(lt),
                             ray.data.from_arrow(rt),
                             on=["ts"], num_partitions=2))
    assert out.num_rows == 1
    assert out["lv"].to_pylist() == [1] and out["rv"].to_pylist() == [10]


def test_sort_dataset_pandas_blocks_all_null_key():
    """from_pandas datasets hand out pandas blocks; the degenerate
    single-partition sort path (all-null key -> empty boundary sample)
    used to feed them straight to the Arrow-only sort task."""
    import pandas as pd

    from raycdc.ops.sort import sort_dataset

    df = pd.DataFrame({"k": [None, None, None], "v": [3, 1, 2]})
    res = sort_dataset(ray.data.from_pandas(df), ["k", "v"],
                       num_partitions=4, rank_col="rank")
    out = res.to_table()
    assert out["rank"].to_pylist() == [1, 2, 3]
    assert out["v"].to_pylist() == [1, 2, 3]
