"""hash_join / broadcast_join tests (incl. empty-partition robustness)."""

import pyarrow as pa
import pytest
import ray.data

from raycdc.joins import broadcast_join, hash_join


def to_table(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tables) if tables else None


LEFT = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                 "lv": ["a", "b", "c", "d"]})
RIGHT = pa.table({"rk": pa.array([2, 3, 5], pa.int64()),
                  "rv": ["x", "y", "z"]})


def pairs(ds, cols):
    t = to_table(ds)
    return set(zip(*(t[c].to_pylist() for c in cols)))


def test_inner_join():
    out = hash_join(ray.data.from_arrow(LEFT), ray.data.from_arrow(RIGHT),
                    on=["k"], right_on=["rk"], num_partitions=4)
    assert pairs(out, ["k", "lv", "rv"]) == {(2, "b", "x"), (3, "c", "y")}


def test_left_outer_join_with_empty_partitions():
    # num_partitions far exceeds the key count → most partitions are empty on
    # one or both sides (the case that breaks Ray's native Dataset.join).
    out = hash_join(ray.data.from_arrow(LEFT), ray.data.from_arrow(RIGHT),
                    on=["k"], right_on=["rk"], join_type="left_outer",
                    num_partitions=16)
    assert pairs(out, ["k", "rv"]) == {(1, None), (2, "x"), (3, "y"), (4, None)}


def test_semi_and_anti_join():
    semi = hash_join(ray.data.from_arrow(LEFT), ray.data.from_arrow(RIGHT),
                     on=["k"], right_on=["rk"], join_type="left_semi",
                     num_partitions=4)
    assert pairs(semi, ["k"]) == {(2,), (3,)}
    anti = hash_join(ray.data.from_arrow(LEFT), ray.data.from_arrow(RIGHT),
                     on=["k"], right_on=["rk"], join_type="left_anti",
                     num_partitions=4)
    assert pairs(anti, ["k"]) == {(1,), (4,)}


def test_null_keys_never_match():
    left = pa.table({"k": pa.array([1, None], pa.int64()), "lv": ["a", "b"]})
    right = pa.table({"rk": pa.array([None, 1], pa.int64()), "rv": ["x", "y"]})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on=["k"], right_on=["rk"], join_type="left_outer",
                    num_partitions=2)
    assert pairs(out, ["k", "rv"]) == {(1, "y"), (None, None)}


def test_overlapping_columns_rejected():
    with pytest.raises(ValueError, match="Overlapping"):
        hash_join(ray.data.from_arrow(LEFT), ray.data.from_arrow(LEFT),
                  on=["k"], num_partitions=2)


def test_broadcast_join():
    out = broadcast_join(ray.data.from_arrow(LEFT), RIGHT,
                         on=["k"], right_on=["rk"], join_type="left_outer")
    assert pairs(out, ["k", "rv"]) == {(1, None), (2, "x"), (3, "y"), (4, None)}


def test_config_from_properties_macros():
    from raycdc.schema import config_from_properties

    props = {"parentField": "${P}", "childField": "child",
             "maxDepthField": "7", "pathSeparator": "|"}
    cfg = config_from_properties(props, resolver={"P": "parent"})
    assert cfg.parent_field == "parent"
    assert cfg.max_depth == 7
    assert cfg.path_separator == "|"
    with pytest.raises(KeyError, match="Unresolved macro"):
        config_from_properties({"parentField": "${NOPE}"}, resolver={})


def test_asof_join_backward():
    import numpy as np
    from raycdc.joins import asof_join

    left = pa.table({
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([10, 20, 5, 25], pa.int64()),
        "k": ["a", "a", "b", "b"],
    })
    right = pa.table({
        "k": ["a", "a", "b"],
        "ts": pa.array([10, 15, 30], pa.int64()),
        "rv": pa.array([100, 150, 300], pa.int64()),
    })
    out = to_table(asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], num_partitions=4)).to_pandas()
    got = dict(zip(out["lid"], out["rv"]))
    # exact match counts (ts=10 -> rv=100); latest at-or-before wins
    # (ts=20 -> rv=150); no match at all -> null (b rows before ts=30)
    assert got[1] == 100 and got[2] == 150
    assert np.isnan(got[3]) and np.isnan(got[4])
    assert len(out) == 4


def test_interval_join_inner_and_outer():
    from raycdc.joins import interval_join

    left = pa.table({
        "lid": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([5, 12, 99], pa.int64()),
        "k": ["a", "a", "a"],
    })
    right = pa.table({
        "k": ["a", "a"],
        "lo": pa.array([0, 10], pa.int64()),
        "hi": pa.array([7, 20], pa.int64()),
        "tag": ["first", "second"],
    })
    inner = to_table(interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], lo="lo", hi="hi", num_partitions=2)).to_pandas()
    got = dict(zip(inner["lid"], inner["tag"]))
    assert got == {1: "first", 2: "second"}  # lid 3 outside all intervals
    outer = to_table(interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], lo="lo", hi="hi", join_type="left_outer",
        num_partitions=2)).to_pandas()
    assert len(outer) == 3
    assert outer.set_index("lid").loc[3, "tag"] is None


def test_asof_and_interval_join_null_keys():
    # null `on` keys must not crash (pd.merge_asof raises on them): a null
    # left timestamp survives as an unmatched left-outer row; null right
    # keys never match (SQL semantics)
    import numpy as np
    from raycdc.joins import asof_join, interval_join

    left = pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, None], pa.int64()),
        "k": ["a", "a"],
    })
    right = pa.table({
        "k": ["a", "a"],
        "ts": pa.array([5, None], pa.int64()),
        "rv": pa.array([50, 99], pa.int64()),
    })
    out = to_table(asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], num_partitions=2)).to_pandas()
    got = dict(zip(out["lid"], out["rv"]))
    assert got[1] == 50 and np.isnan(got[2]) and len(out) == 2

    iright = pa.table({"k": ["a"], "lo": pa.array([None], pa.int64()),
                       "hi": pa.array([20], pa.int64()), "tag": ["x"]})
    inner = to_table(interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(iright),
        on="ts", by=["k"], lo="lo", hi="hi", num_partitions=2))
    # null interval start never matches (empty result)
    assert inner is None or inner.num_rows == 0


def test_asof_join_null_by_keys_never_match():
    """SQL: NULL = NULL is not true — a null by-key row matches nothing
    (regression: pd.merge_asof happily groups None==None)."""
    import pyarrow as pa

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([20, 20], pa.int64()),
        "k": pa.array(["a", None]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None]),
        "ts": pa.array([6, 6], pa.int64()),
        "rv": pa.array([60, 99], pa.int64()),
    }))
    from raycdc.joins import asof_join

    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=2))
    got = {r["lid"]: r["rv"] for r in out.to_pylist()}
    assert got == {1: 60, 2: None}


def test_interval_join_null_by_keys_never_match():
    import pyarrow as pa

    from raycdc.joins import interval_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([5, 5], pa.int64()),
        "k": pa.array(["a", None]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None]),
        "lo": pa.array([0, 0], pa.int64()),
        "hi": pa.array([10, 10], pa.int64()),
        "rv": pa.array([7, 8], pa.int64()),
    }))
    inner = to_table(interval_join(left, right, on="ts", by=["k"],
                                   lo="lo", hi="hi", join_type="inner",
                                   num_partitions=2))
    assert inner.to_pylist() == [
        {"lid": 1, "ts": 5, "k": "a", "lo": 0, "hi": 10, "rv": 7}]
    outer = to_table(interval_join(left, right, on="ts", by=["k"],
                                   lo="lo", hi="hi", join_type="left_outer",
                                   num_partitions=2))
    got = {r["lid"]: r["rv"] for r in outer.to_pylist()}
    assert got == {1: 7, 2: None}


def test_asof_join_preserves_large_int64_and_nan_payloads():
    """Payloads are gathered from Arrow by matched index, never through
    pandas — so int64 > 2^53 stays exact even with unmatched rows in the
    same partition, and NaN float payloads stay NaN (not null)."""
    import math

    import pyarrow as pa

    from raycdc.joins import asof_join

    big = 9007199254740993  # 2^53 + 1: float64 roundtrip corrupts it
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, 1], pa.int64()),   # lid=2 unmatched
        "k": pa.array(["a", "a"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"]),
        "ts": pa.array([5], pa.int64()),
        "rv": pa.array([big], pa.int64()),
        "rf": pa.array([float("nan")], pa.float64()),
    }))
    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=1))
    got = {r["lid"]: r for r in out.to_pylist()}
    assert got[1]["rv"] == big
    assert got[2]["rv"] is None
    assert got[1]["rf"] is not None and math.isnan(got[1]["rf"])


def test_minhash_pairs_int32_ids():
    import pyarrow as pa

    from raycdc.ops.dedup import minhash_lsh_pairs

    texts = ["the quick brown fox jumps over the lazy dog today ok",
             "the quick brown fox jumps over the lazy dog today ok!",
             "completely different text with no overlap whatsoever here"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int32()),
        "text": pa.array(texts),
    }))
    out = to_table(minhash_lsh_pairs(ds, threshold=0.5, num_partitions=2))
    pairs = {(r["id_a"], r["id_b"]) for r in out.to_pylist()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_bloom_semi_join_equals_exact(sf_dir):
    from raycdc.joins import bloom_semi_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    got = (to_table(bloom_semi_join(cust, orders, on=["c_custkey"],
                                    right_on=["o_custkey"],
                                    num_partitions=4))
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    want = (to_table(hash_join(cust, orders, on=["c_custkey"],
                               right_on=["o_custkey"],
                               join_type="left_semi", num_partitions=4))
            .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["c_name"].tolist() == want["c_name"].tolist()


def test_bloom_semi_join_null_keys_and_prefilter():
    from raycdc.joins import _BloomProbe, _bloom_set, _key_hash64, \
        bloom_semi_join
    import numpy as np

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4, 5], pa.int64()),
        "v": pa.array(list("abcde")),
    })).repartition(2)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 4, None], pa.int64()),
    }))
    out = (to_table(bloom_semi_join(left, right, on=["k"], right_on=["rk"],
                                    num_bits=1 << 12, num_partitions=2))
           .to_pandas().sort_values("k"))
    # null keys never match on either side
    assert out["k"].tolist() == [2, 4]

    # no false negatives: every inserted key must pass the probe
    t = pa.table({"k": pa.array(range(10_000), pa.int64())})
    bmp = np.zeros((1 << 18) >> 6, dtype=np.uint64)
    _bloom_set(bmp, _key_hash64(t, ["k"]), 1 << 18, 4)
    probe = _BloomProbe(bmp, ["k"], 1 << 18, 4)
    assert probe(t).num_rows == 10_000
    # and a disjoint key range is mostly filtered out (fpp far below 50%)
    miss = pa.table({"k": pa.array(range(50_000, 60_000), pa.int64())})
    assert probe(miss).num_rows < 1_000


def test_hash_join_null_key_batch_dtype_stability():
    """Regression: a null in an int64 key batch used to flip the batch to
    float64 in key_hash (to_pandas), mis-bucketing every key in it —
    left [2,4] semi right [2,4,None] silently lost 2."""
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4], pa.int64()),
        "v": pa.array(["x", "y"])}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 4, None], pa.int64())}))
    for jt, expect in [("left_semi", [2, 4]), ("left_anti", []),
                       ("inner", [2, 4])]:
        out = to_table(hash_join(left, right, on=["k"], right_on=["rk"],
                                 join_type=jt, num_partitions=2))
        got = sorted(out["k"].to_pylist()) if out is not None else []
        assert got == expect, jt
    # null LEFT keys: kept by anti, dropped by semi/inner
    nleft = ray.data.from_arrow(pa.table({
        "k": pa.array([2, None], pa.int64()),
        "v": pa.array(["x", "y"])}))
    anti = to_table(hash_join(nleft, right, on=["k"], right_on=["rk"],
                              join_type="left_anti", num_partitions=2))
    assert anti["v"].to_pylist() == ["y"]


def test_hash_join_time32_vs_time64_keys():
    """Regression: time32 (s/ms) keys have no direct int64 cast, so the
    temporal hash raised ArrowNotImplementedError and, once widened, must
    still hash the same instant identically as a time64[us]/[ns] side."""
    import datetime as dt
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([3600, 7200, None], pa.time32("s")),
        "lv": ["a", "b", "c"]}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([3_600_000_000, 10_800_000_000, None],
                       pa.time64("us")),
        "rv": ["x", "y", "z"]}))
    out = to_table(hash_join(left, right, on=["k"], right_on=["rk"],
                             num_partitions=3))
    assert out.num_rows == 1
    assert out["lv"].to_pylist() == ["a"]
    assert out["rv"].to_pylist() == ["x"]
    assert out["k"].to_pylist() == [dt.time(1, 0)]
