"""Connected components + the dedup operators built on it (keep-one
near-dedup, bloom anti join, incremental dedup-against-corpus)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from raycdc.joins import bloom_anti_join, hash_join
from raycdc.ops.components import connected_components
from raycdc.ops.dedup import dedup_against, near_dedup_keep_one


# local_threshold=0 forces the distributed min-label propagation;
# the default exercises the single-task union-find fast path
STRATS = [{}, {"local_threshold": 0}]


def _cc(edges_dict, **kw) -> dict:
    ds = ray.data.from_arrow(pa.table(edges_dict))
    df = connected_components(ds, **kw).to_pandas()
    return dict(zip(df["node"], df["component"]))


@pytest.mark.parametrize("strat", STRATS)
def test_chain_collapses_to_min(strat):
    got = _cc({"id_a": [2, 3, 4], "id_b": [1, 2, 3]}, **strat)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


@pytest.mark.parametrize("strat", STRATS)
def test_cycle_terminates_and_labels_min(strat):
    got = _cc({"id_a": [1, 2, 3], "id_b": [2, 3, 1]}, **strat)
    assert got == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("strat", STRATS)
def test_disjoint_components_and_self_loop(strat):
    got = _cc({"id_a": [5, 20, 9], "id_b": [6, 21, 9]}, **strat)
    assert got == {5: 5, 6: 5, 20: 20, 21: 20, 9: 9}


@pytest.mark.parametrize("strat", STRATS)
def test_null_endpoints_ignored(strat):
    got = _cc({"id_a": [1, None, 7], "id_b": [2, 3, None]}, **strat)
    assert got == {1: 1, 2: 1}


@pytest.mark.parametrize("strat", STRATS)
def test_matches_union_find_on_random_graph(strat):
    rng = np.random.default_rng(7)
    n, m = 200, 160
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    got = _cc({"id_a": a.tolist(), "id_b": b.tolist()},
              num_partitions=8, **strat)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        parent[find(x)] = find(y)
    nodes = set(a.tolist()) | set(b.tolist())
    want = {}
    roots = {}
    for x in sorted(nodes):
        r = find(x)
        roots.setdefault(r, x)  # min node per root (sorted iteration)
        want[x] = roots[r]
    assert got == want


def test_max_iters_guard_raises():
    edges = {"id_a": list(range(2, 12)), "id_b": list(range(1, 11))}
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(edges, max_iters=2, local_threshold=0)


def test_long_chain_converges_in_log_rounds():
    # A 10^5-node path: diameter 10^5-1, impossible for plain min-label
    # propagation inside any sane round budget; the pointer-jumping
    # shortcut covers ~2^(r+1) distance after r rounds, so 20 rounds are
    # ample (13 + slack). local_threshold=0 forces the distributed path.
    n = 100_001
    got = _cc({"id_a": list(range(1, n)), "id_b": list(range(0, n - 1))},
              num_partitions=8, max_iters=20, local_threshold=0)
    assert len(got) == n
    assert set(got.values()) == {0}


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows]}))


BASE = ("the quick brown fox jumps over the lazy dog again and again "
        "in the yard near the old barn by the river bank")


def test_near_dedup_keeps_one_per_transitive_cluster():
    docs = _docs([(1, BASE), (2, BASE + " x"), (3, BASE + " x y"),
                  (4, "entirely different text about arrow flight rpc"),
                  (5, BASE + " x y z")])
    out = near_dedup_keep_one(docs, threshold=0.7,
                              num_partitions=4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 4]


def test_near_dedup_no_pairs_is_identity():
    docs = _docs([(1, "alpha beta gamma delta epsilon zeta eta theta"),
                  (2, "one two three four five six seven eight nine"),
                  (3, "lorem ipsum dolor sit amet consectetur adipiscing")])
    out = near_dedup_keep_one(docs, threshold=0.8,
                              num_partitions=4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def _anti_frames(left, right, **kw):
    got = bloom_anti_join(left, right, on=["k"], **kw).to_pandas()
    want = hash_join(left, right, on=["k"],
                     join_type="left_anti").to_pandas()
    key = ["k", "v"]
    return (got.sort_values(key, na_position="last").reset_index(drop=True),
            want.sort_values(key, na_position="last").reset_index(drop=True))


def test_bloom_anti_matches_exact_anti_including_nulls():
    left = ray.data.from_arrow(pa.table(
        {"k": [1, 2, 3, None, 5], "v": ["a", "b", "c", "d", "e"]}))
    right = ray.data.from_arrow(pa.table({"k": [2, 5, 7]}))
    # auto_skip=None forces the two-branch bloom path even on tiny input
    got, want = _anti_frames(left, right, auto_skip=None)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["v"]) == {"a", "c", "d"}


def test_bloom_anti_auto_skip_path_matches():
    left = ray.data.from_arrow(pa.table(
        {"k": list(range(100)), "v": [str(i) for i in range(100)]}))
    right = ray.data.from_arrow(pa.table({"k": list(range(90))}))
    # 90% hit rate < default only via explicit low bar -> plain anti join
    got, want = _anti_frames(left, right, auto_skip=0.5)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 10


def test_dedup_against_drops_seen_texts_only():
    corpus = _docs([(1, "aa"), (2, "bb"), (3, "cc")])
    new = _docs([(10, "bb"), (11, "dd"), (12, "ee")])
    out = dedup_against(new, corpus, num_partitions=4).to_pandas()
    assert sorted(out["doc_id"]) == [11, 12]
    assert set(out.columns) == {"doc_id", "text"}


def test_embedding_dedup_keep_one_transitive_chain():
    from raycdc.ops.dedup import embedding_dedup_keep_one
    import math

    def rot(deg):
        a = math.radians(deg)
        # 8-dim unit vectors rotating in the first two coords
        return [math.cos(a), math.sin(a)] + [0.0] * 6

    # 1~2 and 2~3 at cosine >= cos(6deg) ~ 0.9945, but 1!~3 (cos 10deg
    # ~ 0.9848 < 0.99): the transitive cluster {1,2,3} must still
    # collapse to doc 1.
    vecs = [rot(0), rot(5), rot(10), [0.0] * 7 + [1.0]]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": [1, 2, 3, 9],
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    out = embedding_dedup_keep_one(ds, threshold=0.99,
                                   num_partitions=4).to_pandas()
    assert sorted(out["vec_id"]) == [1, 9]


def test_duplicated_passages_within_and_across_docs():
    from raycdc.ops.dedup import duplicated_passages

    boiler = "click here to subscribe now"           # 5 tokens
    docs = _docs([
        (1, boiler + " unique tail one two three"),   # window 0 = boiler+tail
        (2, boiler + " unique tail one two three"),   # exact copy of doc 1
        (3, "totally different body of text here"),
    ])
    out = duplicated_passages(docs, size=5, overlap=0,
                              num_partitions=4).to_pandas()
    # docs 1 and 2 share BOTH 5-token windows; doc 3 shares none
    got = sorted(map(tuple, out[["doc_id", "chunk_id"]].to_numpy()))
    assert got == [(1, 0), (1, 1), (2, 0), (2, 1)]
    assert (out["n_occurrences"] == 2).all()


def test_duplicated_passages_min_count_and_no_dups():
    from raycdc.ops.dedup import duplicated_passages

    docs = _docs([(1, "a b c d e f"), (2, "g h i j k l")])
    out = duplicated_passages(docs, size=3, overlap=0,
                              num_partitions=4).to_pandas()
    assert len(out) == 0


def test_scrub_duplicated_passages_keeps_one_global_occurrence():
    from raycdc.ops.dedup import scrub_duplicated_passages

    boiler = "one two three four five"
    docs = _docs([
        (1, boiler + " alpha beta gamma delta eps"),
        (2, boiler + " alpha beta gamma delta eps"),   # exact copy: all
                                                       # windows scrubbed
        (3, boiler + " zeta eta theta iota kappa"),    # shares window 0
    ])
    out = scrub_duplicated_passages(docs, size=5,
                                    num_partitions=4).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    # doc 1 keeps both windows (it is the global winner of each);
    # doc 2 loses everything and disappears; doc 3 keeps only its tail.
    assert got == {1: boiler + " alpha beta gamma delta eps",
                   3: "zeta eta theta iota kappa"}


def test_min_token_freq_filter_drops_gibberish():
    from raycdc.ops.text import min_token_freq_filter

    common = "the cat sat on the mat"
    docs = _docs([
        (1, common), (2, common), (3, common),
        (4, common + " qzxv9f8h2k"),   # one corpus-unique token
        (5, ""),                        # token-less: dropped (no minimum)
    ])
    out = min_token_freq_filter(docs, min_freq=3,
                                num_partitions=4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def test_min_token_freq_filter_bloom_fallback_matches_broadcast():
    from raycdc.ops.text import min_token_freq_filter

    common = "the cat sat on the mat"
    docs = _docs([
        (1, common), (2, common), (3, common),
        (4, common + " qzxv9f8h2k"),
        (5, None),                      # null text: dropped like empty
        (6, "   "),                     # whitespace-only: dropped
    ])
    # budget 0 forces the bloom-gated exact fallback path
    out = min_token_freq_filter(docs, min_freq=3, num_partitions=4,
                                broadcast_budget_bytes=0).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def test_table_diff_classifies_inserts_updates_deletes():
    from raycdc.cdc.diff import table_diff

    old = ray.data.from_arrow(pa.table(
        {"k": [1, 2, 3, 4], "v": ["a", "b", None, "d"]}))
    new = ray.data.from_arrow(pa.table(
        {"k": [2, 3, 4, 5], "v": ["B", None, "d", "e"]}))
    out = table_diff(old, new, key_cols=["k"], compare_cols=["v"],
                     num_partitions=4).to_pandas().sort_values("k")
    got = list(map(tuple, out[["op", "k"]].to_numpy()))
    # k=3 both-null and k=4 equal are unchanged (IS DISTINCT FROM), omitted
    assert got == [("D", 1), ("U", 2), ("I", 5)]
    assert out.set_index("k")["v"].to_dict() == {1: None, 2: "B", 5: "e"}


def test_table_diff_round_trip_reconstructs_new_snapshot():
    """Closure property: applying the diff to the old snapshot yields the
    new snapshot exactly — multi-column keys and compare columns."""
    from raycdc.cdc.diff import table_diff

    old = pa.table({"k1": [1, 1, 2, 3, 4], "k2": ["a", "b", "a", "a", "a"],
                    "v": [10, 20, 30, 40, None],
                    "w": ["x", "y", "z", "q", "r"]})
    new = pa.table({"k1": [1, 2, 3, 5, 4], "k2": ["a", "a", "a", "a", "a"],
                    "v": [10, 31, 40, 50, None],
                    "w": ["X", "z", "q", "s", "r"]})
    diff = table_diff(ray.data.from_arrow(old), ray.data.from_arrow(new),
                      key_cols=["k1", "k2"], compare_cols=["v", "w"],
                      num_partitions=4).to_pandas()

    odf = old.to_pandas()
    changed = set(map(tuple, diff[["k1", "k2"]].to_numpy()))
    untouched = odf[~odf.apply(
        lambda r: (r["k1"], r["k2"]) in changed, axis=1)]
    applied = pd.concat([
        untouched,
        diff[diff["op"].isin(["I", "U"])][["k1", "k2", "v", "w"]],
    ])
    key = ["k1", "k2"]
    a = applied.sort_values(key).reset_index(drop=True)
    b = new.to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k1", "k2", "v", "w"]].astype(str),
                                  b[["k1", "k2", "v", "w"]].astype(str))


def test_grouped_top_n_ties_and_small_groups():
    from raycdc.agg import grouped_top_n

    ds = ray.data.from_arrow(pa.table({
        "g": ["a", "a", "a", "a", "b"],
        "v": [9, 9, 9, 1, 5],
        "id": [3, 1, 2, 4, 9]}))
    out = grouped_top_n(ds, ["g"], "v", n=2, tiebreak="id",
                        num_partitions=4).to_pandas()
    got = sorted(map(tuple, out[["g", "id"]].to_numpy()))
    # tie on v=9 broken by min id (1, 2); group b smaller than n survives
    assert got == [("a", 1), ("a", 2), ("b", 9)]


def test_grouped_top_n_ascending():
    from raycdc.agg import grouped_top_n

    ds = ray.data.from_arrow(pa.table({
        "g": ["a"] * 4, "v": [4, 2, 3, 1], "id": [1, 2, 3, 4]}))
    out = grouped_top_n(ds, ["g"], "v", n=2, descending=False,
                        tiebreak="id", num_partitions=2).to_pandas()
    assert sorted(out["v"]) == [1, 2]


def test_quantile_bucket_labels_match_case_chain():
    from raycdc.pipelines.curation import quantile_bucket

    vals = [1, 2, 3, 4, 5, 6, 7, 8, None]
    ds = ray.data.from_arrow(pa.table(
        {"id": list(range(9)), "x": pa.array(vals, pa.int64())}))
    out = quantile_bucket(ds, "x", [0.25, 0.5, 0.75],
                          m=1 << 20).to_pandas().sort_values("id")
    # percentile_disc of 1..8: t=(2,4,6); buckets: <=2 -> 0, <=4 -> 1,
    # <=6 -> 2, else 3; null -> null
    want = [0, 0, 1, 1, 2, 2, 3, 3, None]
    got = [None if pd.isna(v) else int(v) for v in out["bucket"]]
    assert got == want


def test_weighted_sample_rates_and_nulls():
    from raycdc.agg import weighted_sample

    n = 4000
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(list(range(n)) + [None], pa.int64()),
        "w": pa.array([0.0] * (n // 2) + [1.0] * (n // 2) + [0.5],
                      pa.float64())}))
    out = weighted_sample(ds, "id", "w").to_pandas()
    kept = set(out["id"])
    # weight 0 -> never kept; weight 1 -> always kept; null id dropped
    assert kept == set(range(n // 2, n))

    half = ray.data.from_arrow(pa.table({
        "id": pa.array(list(range(n)), pa.int64()),
        "w": pa.array([0.5] * n, pa.float64())}))
    frac = weighted_sample(half, "id", "w").count() / n
    assert 0.45 < frac < 0.55  # deterministic, ~rate-proportional
