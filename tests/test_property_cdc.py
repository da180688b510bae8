"""Property tests for the CDC merge algebra.

Replay idempotence, crash-resume and parallelism invariance all reduce to
one algebraic fact: the LWW reduction is associative and commutative over
any grouping of the event stream. Hypothesis searches for counterexamples
over random tables with duplicate keys, (ts, seq) ties, and nulls.
"""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

from raycdc.cdc.lww import lww_reduce
from raycdc.ops.dedup import _bounded_pairs


def _canon(t: pa.Table) -> list[tuple]:
    return sorted(zip(t["url"].to_pylist(), t["warc_ts"].to_pylist(),
                      t["seq"].to_pylist(), t["payload"].to_pylist()))


rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),                                  # url id (few keys)
        st.one_of(st.none(), st.integers(0, 3)),            # warc_ts (ties!)
        st.one_of(st.none(), st.integers(0, 10 ** 12)),     # seq
    ),
    min_size=1, max_size=40,
)


def _table(rows) -> pa.Table:
    return pa.table({
        "url": pa.array([f"u{r[0]}" for r in rows]),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "payload": pa.array([f"{r[0]}|{r[1]}|{r[2]}" for r in rows]),
    })


@settings(max_examples=200, deadline=None)
@given(rows_strategy, st.integers(0, 39))
def test_lww_reduce_is_associative(rows, split_at):
    """reduce(A ++ B) == reduce(reduce(A) ++ reduce(B)) for ANY split —
    the exact property the combiner, the shuffle, the tree fan-in and the
    LSM run-set merge all rely on. Requires a TOTAL order on (ts, seq):
    with (ts, seq) ties the winner must still be the same row either way
    (ties carry identical payloads here, as in the real event stream where
    (ts, seq) is unique)."""
    split_at = min(split_at, len(rows))
    t = _table(rows)
    whole = lww_reduce(t)
    a, b = t.slice(0, split_at), t.slice(split_at)
    parts = lww_reduce(pa.concat_tables([lww_reduce(a), lww_reduce(b)]))
    assert _canon(whole) == _canon(parts)


@settings(max_examples=200, deadline=None)
@given(rows_strategy)
def test_lww_reduce_picks_max_order_and_nulls_lose(rows):
    t = _table(rows)
    out = lww_reduce(t)
    # one row per key
    urls = out["url"].to_pylist()
    assert len(urls) == len(set(urls))
    # winner == python-computed max under (ts, seq) with nulls smallest
    def order_key(r):
        ts = r[1] if r[1] is not None else -(10 ** 18)
        seq = r[2] if r[2] is not None else -(10 ** 18)
        return (ts, seq)
    expected = {}
    for r in rows:
        k = f"u{r[0]}"
        if k not in expected or order_key(r) >= order_key(expected[k]):
            if k in expected and order_key(r) == order_key(expected[k]):
                continue  # exact tie: rows are identical by construction
            expected[k] = r
    got = {u: (ts, seq) for u, ts, seq, _ in _canon(out)}
    want = {f"u{r[0]}": (r[1], r[2]) for r in expected.values()}
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2000), st.integers(1, 64), st.integers(1, 16))
def test_bounded_pairs_invariants(n, cap, window):
    ia, ib = _bounded_pairs(n, cap, window)
    assert len(ia) == len(ib)
    if n < 2:
        assert len(ia) == 0
        return
    assert (ia < ib).all() and ib.max() < n and ia.min() >= 0
    if n <= cap:
        assert len(ia) == n * (n - 1) // 2
    else:
        # bounded output; consecutive pairs present => cluster connectivity
        assert len(ia) <= n * window
        pairs = set(zip(ia.tolist(), ib.tolist()))
        assert all((i, i + 1) in pairs for i in range(n - 1))


rows_asof = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)),
                     min_size=0, max_size=25)


@settings(max_examples=50, deadline=None)
@given(rows_asof, rows_asof)
def test_asof_join_matches_brute_force(lrows, rrows):
    """Distributed as-of join == per-row brute force over random inputs —
    exercises the by-hash co-partitioning, not just the per-partition
    kernel. Right side deduped per (k, ts) for a deterministic winner."""
    import ray.data
    from raycdc.joins import asof_join

    rdedup = {}
    for i, (k, ts) in enumerate(rrows):
        rdedup[(k, ts)] = max(rdedup.get((k, ts), -1), i * 10)
    left = pa.table({
        "lid": pa.array(range(len(lrows)), pa.int64()),
        "ts": pa.array([t for _, t in lrows], pa.int64()),
        "k": pa.array([f"k{k}" for k, _ in lrows], pa.string()),
    })
    right = pa.table({
        "k": pa.array([f"k{k}" for k, _ in rdedup], pa.string()),
        "ts": pa.array([t for _, t in rdedup], pa.int64()),
        "rv": pa.array(list(rdedup.values()), pa.int64()),
    })
    out = pa.concat_tables(list(asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], num_partitions=3,
    ).iter_batches(batch_format="pyarrow"))) if lrows else None

    expected = {}
    for lid, (k, ts) in enumerate(lrows):
        best = None
        for (rk, rts), rv in rdedup.items():
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, rv)
        expected[lid] = best[1] if best else None
    if not lrows:
        return
    got = dict(zip(out["lid"].to_pylist(), out["rv"].to_pylist()))
    assert got == expected
