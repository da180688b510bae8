"""Regression tests for the round-2 correctness fixes (ADVICE.md items):

- SQL three-valued logic in the predicate grammar (Kleene OR/AND, NOT IN /
  NOT LIKE on null columns)
- null warc_ts/seq must LOSE last-writer-wins (int64-min negation overflow)
- deterministic ANN top-k tie-break at the k-th place across batch splits
- frontier dedup keeps the final-dedup winner for duplicate (parent, child)
  edges with differing payloads
- session_window assigns sessions identically to a per-key pandas reference
  (bucket-partitioned vectorized rewrite)
"""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc import FlattenConfig, flatten_hierarchy
from raycdc.cdc.lww import lww_reduce
from raycdc.expr import filter_table
from raycdc.flatten import flatten_hierarchy_table
from raycdc.ops.ann import brute_force_topk
from raycdc.ops.window import session_window


def to_table(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


# ---------------------------------------------------------------- expr 3VL

NULLS = pa.table({
    "a": pa.array([1, None, 3], pa.int64()),
    "s": pa.array(["x", None, "zz"]),
})


def test_expr_true_or_null_keeps_row():
    # SQL: (a = 999 OR s = 'x') on row with a=NULL... row 1: a=1 matches
    # second branch; Kleene OR must not let a NULL comparison poison it.
    out = filter_table(NULLS, "s == 'x' OR a == 999")
    assert out["a"].to_pylist() == [1]
    # true OR null == true: row 2 has s=NULL (null cmp) but a=3 matches
    out = filter_table(NULLS, "a == 3 OR s == 'nope'")
    assert out["a"].to_pylist() == [3]


def test_expr_not_in_null_dropped():
    # SQL: NULL NOT IN (...) is NULL -> dropped, not kept
    out = filter_table(NULLS, "a not in (1, 2)")
    assert out["a"].to_pylist() == [3]
    out = filter_table(NULLS, "a in (1, 3)")
    assert out["a"].to_pylist() == [1, 3]


def test_expr_not_like_null_dropped():
    out = filter_table(NULLS, "s not like 'x%'")
    assert out["s"].to_pylist() == ["zz"]


# ------------------------------------------------------------- LWW null ts

def test_lww_null_ts_loses():
    t = pa.table({
        "url": ["u", "u", "v", "v"],
        "warc_ts": pa.array([1000, None, None, None], pa.int64()),
        "seq": pa.array([1, 2, 3, None], pa.int64()),
        "text": ["real", "null-ts", "v-seq3", "v-null"],
    })
    out = lww_reduce(t)
    got = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
    # a null warc_ts must never beat a real timestamp
    assert got["u"] == "real"
    # among null-ts rows, seq breaks the tie; null seq loses too
    assert got["v"] == "v-seq3"


# ------------------------------------------------------- ANN tie-break

def test_topk_tie_break_across_batches():
    # 6 identical vectors (cosine ties at every rank) + distractors, dataset
    # ordered so high ids come first; small batch_size forces the local
    # top-k cut to happen inside a batch of ties. The min ids must survive.
    dim = 8
    base = np.ones(dim)
    ids = [5, 4, 3, 2, 1, 0, 100, 101]
    vecs = [base] * 6 + [np.concatenate([[1.0], -np.ones(dim - 1)])] * 2
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              pa.list_(pa.float64())),
    }))
    queries = (np.array([7], dtype=np.int64), base.reshape(1, -1))
    out = to_table(brute_force_topk(ds, queries, k=3, batch_size=4,
                                    round_to=4)).to_pandas()
    out = out.sort_values("rank")
    assert out["vec_id"].tolist() == [0, 1, 2]


# --------------------------------------- frontier dedup duplicate payloads

DUP_EDGES = pa.table({
    "parent": ["r", "a", "a"],
    "child": ["a", "b", "b"],
    "d": ["x", "z", "m"],  # duplicate (a, b) edge; "m" is the min payload
})


@pytest.mark.parametrize("strategy", ["local", "broadcast", "shuffle"])
def test_duplicate_edge_payload_min_wins(strategy):
    cfg = FlattenConfig(parent_field="parent", child_field="child")
    if strategy == "local":
        out = flatten_hierarchy_table(DUP_EDGES, cfg)
    else:
        out = to_table(flatten_hierarchy(
            ray.data.from_arrow(DUP_EDGES), cfg, strategy=strategy,
            num_partitions=2))
    rows = {(r["parent"], r["child"], r["Level"]): r["d"]
            for r in out.to_pylist()}
    assert rows == {
        ("r", "a", 1): "x",
        ("a", "b", 1): "m",
        ("a", "b", 2): "m",
    }
    assert out.num_rows == 3


# ------------------------------------------------------------- sessions

def test_session_window_matches_pandas_reference():
    rng = np.random.default_rng(7)
    n = 20_000
    keys = rng.integers(0, 900, n)
    base = datetime.datetime(2025, 1, 1)
    offsets_s = rng.integers(0, 100_000, n)
    ts = pa.array(offsets_s * 1_000_000, pa.int64()).cast(pa.timestamp("us"))
    t = pa.table({"k": pa.array([f"u{v}" for v in keys]), "ts": ts})
    out = to_table(session_window(
        ray.data.from_arrow(t), ts_col="ts", key_col="k", gap="600s",
        num_partitions=8)).to_pandas()

    # reference: per-key pandas pass
    df = t.to_pandas().sort_values(["k", "ts"], kind="stable")
    gap = pd.Timedelta(seconds=600)
    new = (df["k"] != df["k"].shift()) | ((df["ts"] - df["ts"].shift()) > gap)
    sid = new.cumsum()
    ref = df.groupby(sid).agg(k=("k", "first"), session_start=("ts", "min"),
                              session_end=("ts", "max"), n=("ts", "size"))

    got = out.sort_values(["k", "session_start"]).reset_index(drop=True)
    ref = ref.sort_values(["k", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "session_start", "session_end", "n"]], ref, check_dtype=False)
    del base  # (kept for clarity of the fixture's epoch)


# --------------------------------------------------------- stable hashing
def _tt(ds) -> pa.Table:
    tabs = [b for b in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None) if b.num_rows]
    return pa.concat_tables(tabs, promote_options="default")


def test_stable_hash_null_batch_invariance():
    """A key must route identically whether its batch contains nulls or
    not (plain to_pandas used to flip int64 -> float64 and change every
    hash in the batch)."""
    import numpy as np

    from raycdc.shuffle import stable_hash

    clean = pa.table({"k": pa.array([2, 4], pa.int64())})
    dirty = pa.table({"k": pa.array([2, 4, None], pa.int64())})
    assert (stable_hash(clean, ["k"]) ==
            stable_hash(dirty, ["k"])[:2]).all()
    assert (stable_hash(clean["k"]) == stable_hash(dirty["k"])[:2]).all()


def test_distinct_and_setops_nullable_int_across_batches():
    """distinct/EXCEPT/INTERSECT with an int column that has nulls in one
    batch but not another: equal rows must still co-locate."""
    from raycdc.agg import distinct_rows, except_rows, intersect_rows

    # block 0 has a null, block 1 doesn't — the value 7 appears in both
    blocks_l = [pa.table({"k": pa.array([7, None], pa.int64())}),
                pa.table({"k": pa.array([7, 8], pa.int64())})]
    left = ray.data.from_arrow(blocks_l)
    right = ray.data.from_arrow(
        [pa.table({"k": pa.array([7], pa.int64())}),
         pa.table({"k": pa.array([9, None], pa.int64())})])
    d = sorted(_tt(distinct_rows(left, ["k"], num_partitions=4))
               ["k"].to_pylist(), key=lambda x: (x is None, x))
    assert d == [7, 8, None]
    inter = _tt(intersect_rows(left, right, num_partitions=4))
    got = sorted(inter["k"].to_pylist(), key=lambda x: (x is None, x))
    assert got == [7, None]  # SQL INTERSECT treats NULLs as equal
    exc = _tt(except_rows(left, right, num_partitions=4))
    assert exc["k"].to_pylist() == [8]


def test_grouped_aggregate_partition_nullable_key_across_batches():
    from raycdc.agg import grouped_aggregate

    blocks = [pa.table({"k": pa.array([1, None], pa.int64()),
                        "v": pa.array([10, 5], pa.int64())}),
              pa.table({"k": pa.array([1, 2], pa.int64()),
                        "v": pa.array([20, 7], pa.int64())})]
    ds = ray.data.from_arrow(blocks)
    out = _tt(grouped_aggregate(ds, ["k"], sums={"s": "v"},
                                exchange="partition",
                                num_partitions=4)).to_pandas()
    got = {(None if pd.isna(k) else int(k)): int(s)
           for k, s in zip(out["k"], out["s"])}
    assert got == {1: 30, 2: 7, None: 5}
