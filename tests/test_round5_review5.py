"""Round-5 fifth review wave (perf-core files): pandas type degrades in
exchange kernels, cross-strategy flatten dedup null ordering, value-based
stateless_stage memo keys, bloom bitmap bounds, zero-column empty-block
guards in the text kernels, and ANN empty/convention edges."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from raycdc.flatten import flatten_hierarchy
from raycdc.joins import bloom_semi_join, hash_join
from raycdc.ops.ann import ivf_topk
from raycdc.ops.dedup import exact_dedup
from raycdc.ops.text import (
    Fingerprinter,
    LangId,
    QualityScorer,
    degraded_empty,
)
from raycdc.schema import FlattenConfig
from raycdc.shuffle import stage_cache_key


def _arrow(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        schema = ds.schema()
        return pa.schema(
            [pa.field(n, t) for n, t in
             zip(schema.names, schema.types)]).empty_table()
    return pa.concat_tables(tables, promote_options="default")


# ---------------------------------------------------------------------------
# exact_dedup: pandas hop must not degrade nullable int payloads
# ---------------------------------------------------------------------------

def test_exact_dedup_nullable_int_payload_keeps_type_and_value():
    big = (1 << 60) + 1  # quantized if it ever passes through float64
    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["a", "a", "b", "b", "c", "d", "e", "f"]),
        "extra": pa.array([big, None, 7, None, None, 3, None, 9],
                          pa.int64()),
    })
    out = _arrow(exact_dedup(ray.data.from_arrow(t), num_partitions=4))
    assert out.schema.field("extra").type == pa.int64()
    rows = {r["text"]: r["extra"] for r in out.to_pylist()}
    assert rows["a"] == big  # min doc_id row survives, value exact
    assert len(rows) == 6


# ---------------------------------------------------------------------------
# flatten: broadcast and shuffle strategies must pick the SAME winner when
# duplicate-edge payloads contain nulls (nulls-first, the polars order)
# ---------------------------------------------------------------------------

def test_flatten_duplicate_edge_null_payload_cross_strategy():
    edges = pa.table({
        "parent": pa.array([1, 1, 1, 2], pa.int64()),
        "child": pa.array([2, 2, 2, 3], pa.int64()),
        "data": pa.array([None, "b", "a", "leafdata"], pa.string()),
    })
    cfg = FlattenConfig(parent_field="parent", child_field="child")
    outs = {}
    for strategy in ("broadcast", "shuffle"):
        out = _arrow(flatten_hierarchy(
            ray.data.from_arrow(edges), cfg, strategy=strategy,
            num_partitions=4))
        outs[strategy] = sorted(
            out.to_pylist(),
            key=lambda r: (r["parent"], r["child"], r["Level"]))
    assert outs["broadcast"] == outs["shuffle"]
    dup = [r for r in outs["broadcast"]
           if r["parent"] == 1 and r["child"] == 2]
    assert len(dup) == 1 and dup[0]["data"] is None  # nulls-first winner


def test_flatten_dedup_empty_seed_set_keeps_schema():
    # duplicate children force the dedup exchange; a start_with matching
    # nothing leaves every partition empty — the result must still carry
    # the output schema (repo invariant: schema-less empties crash joins)
    edges = pa.table({
        "parent": pa.array([1, 5, 2], pa.int64()),
        "child": pa.array([2, 2, 3], pa.int64()),
    })
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        start_with="parent == 999")
    out = flatten_hierarchy(ray.data.from_arrow(edges), cfg,
                            strategy="broadcast", num_partitions=4)
    schema = out.schema()
    assert schema is not None and "Level" in schema.names
    assert out.count() == 0


# ---------------------------------------------------------------------------
# stateless_stage memo keys: value-based, never id()-aliased
# ---------------------------------------------------------------------------

class _FakeStage:
    def __init__(self, *a):
        pass


def test_stage_cache_key_value_based():
    k1 = stage_cache_key(_FakeStage, ["a"], 3)
    k2 = stage_cache_key(_FakeStage, ["b"], 3)
    assert k1 != k2
    # equal values built at different times → equal keys (memo can hit)
    assert stage_cache_key(_FakeStage, list("ab")) == \
        stage_cache_key(_FakeStage, ["a", "b"])
    # ndarray keyed by content
    assert stage_cache_key(_FakeStage, np.array([1, 2])) != \
        stage_cache_key(_FakeStage, np.array([1, 3]))
    assert stage_cache_key(_FakeStage, np.array([1, 2])) == \
        stage_cache_key(_FakeStage, np.array([1, 2]))
    with pytest.raises(TypeError, match="value-based"):
        stage_cache_key(_FakeStage, {1, 2})  # no value key for sets


# ---------------------------------------------------------------------------
# bloom bitmap bounds: num_bits not a multiple of 64
# ---------------------------------------------------------------------------

def test_bloom_semi_join_odd_num_bits():
    left = pa.table({"k": pa.array(range(200), pa.int64())})
    right = pa.table({"k": pa.array([3, 5, 7, 111, 199], pa.int64())})
    got = _arrow(bloom_semi_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on=["k"], num_bits=1000, auto_skip=None, num_partitions=4))
    exact = _arrow(hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on=["k"], join_type="left_semi", num_partitions=4))
    assert sorted(got["k"].to_pylist()) == sorted(exact["k"].to_pylist())


# ---------------------------------------------------------------------------
# text kernels: zero-column EMPTY block degrade passes through
# ---------------------------------------------------------------------------

def test_text_class_kernels_tolerate_zero_column_blocks():
    empty = pa.table({})
    for kernel in (QualityScorer("text"), LangId("text"),
                   Fingerprinter("text")):
        out = kernel(empty)
        assert out.num_rows == 0
    assert degraded_empty(empty, "text")
    typed_empty = pa.table({"text": pa.array([], pa.string())})
    assert not degraded_empty(typed_empty, "text")
    nonempty = pa.table({"x": pa.array([1])})
    assert not degraded_empty(nonempty, "text")  # 1 row: real KeyError


def test_quality_scorer_escapes_stopwords():
    t = pa.table({"text": pa.array(["a.b axb"])})
    out = QualityScorer("text", stopwords=["a.b"])(t)
    # unescaped, "a.b" also matches "axb" → ratio 1.0; escaped → 0.5
    assert out["stop_ratio"].to_pylist() == [0.5]
    # regex metacharacters must not crash pattern compilation
    QualityScorer("text", stopwords=["c++", "don't"])(t)


# ---------------------------------------------------------------------------
# ANN: empty corpus must not crash ivf_topk
# ---------------------------------------------------------------------------

def test_ivf_topk_empty_corpus():
    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    })
    qids = np.array([0, 1], dtype=np.int64)
    qmat = np.eye(2, 4, dtype=np.float64)
    out = ivf_topk(ray.data.from_arrow(empty), (qids, qmat),
                   k=3, nlist=4, nprobe=2)
    assert out.count() == 0
