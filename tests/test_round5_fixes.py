"""Round-5 fixes: the two-level (√P) exchange for very large partition
counts (VERDICT r4 #7) — unchanged results, bounded driver ref counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from raycdc import shuffle
from raycdc.shuffle import last_exchange_stats, partition_map


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


def _mk_ds(P: int, n: int = 20_000, blocks: int = 32):
    rng = np.random.default_rng(5)
    k = rng.integers(0, 100_000, n).astype(np.int64)
    v = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"k": pa.array(k), "v": pa.array(v),
                  "__p": pa.array(k % P)})
    step = -(-n // blocks)
    tabs = [t.slice(i, step) for i in range(0, n, step)]
    return ray.data.from_arrow(tabs), t


def _grouped_sum(ds, P):
    return to_table(partition_map(
        ds, "__p", P,
        lambda t: t.group_by("k").aggregate([("v", "sum")])))


def _canon(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().sort_values("k").reset_index(drop=True)


@pytest.mark.parametrize("P", [1536, 1057])  # 1057: ragged tail, gs == 1
def test_two_level_exchange_matches_single_level(P, monkeypatch):
    # plan-shape test: force the full exchange even on this tiny fixture
    monkeypatch.setattr(shuffle, "_SMALL_EXCHANGE_BYTES", 0)
    ds, t = _mk_ds(P)
    got2 = _grouped_sum(ds, P)
    stats2 = dict(last_exchange_stats)
    assert stats2["level"] == "two"

    monkeypatch.setattr(shuffle, "_TWO_LEVEL_MIN_PARTITIONS", 1 << 30)
    got1 = _grouped_sum(ds, P)
    stats1 = dict(last_exchange_stats)
    assert stats1["level"] == "one"

    want = (t.to_pandas().groupby("k", as_index=False)["v"].sum()
            .rename(columns={"v": "v_sum"}))
    pd.testing.assert_frame_equal(_canon(got2), _canon(got1))
    pd.testing.assert_frame_equal(
        _canon(got2), want.sort_values("k").reset_index(drop=True))
    # the point of the plan: the driver holds ~√P-bounded split refs
    assert stats2["split_refs"] * 4 < stats1["split_refs"]


def test_two_level_ref_growth_is_sqrt_p(monkeypatch):
    """At a synthetic high P with many blocks, the two-level footprint is
    chunks×√P (level 1) + P×ceil(chunks/√P) (level 2) ≈ 2×chunks×√P —
    a √P/2 reduction over single-level's chunks×P (the VERDICT r4 #7
    10^9-ref scenario scaled down)."""
    monkeypatch.setattr(shuffle, "_SMALL_EXCHANGE_BYTES", 0)
    P = 4096  # S = 64
    ds, _ = _mk_ds(P, n=8_192, blocks=512)  # 512 blocks → 128 split chunks
    _grouped_sum(ds, P)
    stats = dict(last_exchange_stats)
    assert stats["level"] == "two"
    s, chunks = 64, 128
    expected = chunks * s + P * -(-chunks // s)  # 8,192 + 8,192
    single_level = chunks * P                    # 524,288
    assert stats["split_refs"] == expected
    assert stats["split_refs"] * (s // 2) == single_level


def test_two_level_drops_partition_col_like_single_level(monkeypatch):
    # force past the small-exchange fast path: this ~96 KB fixture would
    # otherwise collapse to one task and never exercise the two-level
    # invariant (level 1 RETAINS the partition column, level 2 drops it)
    monkeypatch.setattr(shuffle, "_SMALL_EXCHANGE_BYTES", 0)
    P = 2048
    ds, _ = _mk_ds(P, n=4_000, blocks=8)
    out = to_table(partition_map(ds, "__p", P, lambda t: t))
    assert dict(last_exchange_stats)["level"] == "two"
    assert "__p" not in out.column_names
    kept = to_table(partition_map(ds, "__p", P, lambda t: t,
                                  drop_partition_col=False))
    assert "__p" in kept.column_names
    assert out.num_rows == kept.num_rows == 4_000


def test_cdc_apply_two_level_split_matches_oracle(tmp_path):
    """The flagship merge path above the two-level threshold: replaying a
    WAL into a 1,200-partition lake must produce the exact LWW oracle
    state and a clean deep fsck (same plan family as partition_map's
    √P exchange)."""
    import pyarrow.compute as pc

    from raycdc.cdc import apply_changelog, generate_changelog
    from raycdc.cdc.apply import oracle_final_state
    from raycdc.cdc.changelog import ChangelogSpec, generate_events
    from raycdc.cdc.fsck import check_lake

    from tests.test_cdc import lake_state, url_text_digest

    spec = ChangelogSpec(num_events=6_000, num_urls=400, num_epochs=2,
                         seed=17)
    wal = str(tmp_path / "wal")
    generate_changelog(wal, spec)
    lake = str(tmp_path / "lake")
    apply_changelog(wal, lake, num_partitions=1_200)

    got = lake_state(lake)
    want = oracle_final_state(generate_events(spec))
    want = want.take(pc.sort_indices(want,
                                     sort_keys=[("url", "ascending")]))
    assert url_text_digest(got) == url_text_digest(want)
    assert got.num_rows == want.num_rows

    rep = check_lake(lake, deep=True)
    assert rep["ok"], rep["errors"][:3]


def test_grouped_stats_with_distinct_matches_composition():
    """The one-exchange combined aggregate must equal the two-exchange
    grouped_aggregate + grouped_count_distinct + join composition,
    including null distinct values (not counted, group still present)
    and null group keys."""
    from raycdc.agg import (grouped_aggregate, grouped_count_distinct,
                            grouped_stats_with_distinct)
    from raycdc.joins import hash_join

    rng = np.random.default_rng(11)
    n = 30_000
    host = pd.Series(rng.integers(0, 40, n)).map(
        lambda i: None if i == 39 else f"h{i}")
    url = pd.Series(rng.integers(0, 500, n)).map(
        lambda i: None if i % 97 == 0 else f"u{i}")
    ts = rng.integers(1_000, 9_999, n).astype(np.int64)
    t = pa.table({"host": pa.array(host, pa.string()),
                  "url": pa.array(url, pa.string()),
                  "warc_ts": pa.array(ts)})
    step = n // 16
    ds = ray.data.from_arrow([t.slice(i, step) for i in range(0, n, step)])
    ds = ds.map_batches(lambda x: x, batch_format="pyarrow")

    got = to_table(grouped_stats_with_distinct(
        ds, ["host"], "url", distinct_name="n_urls",
        maxs={"latest_ts": "warc_ts"}, count_name="n_events",
        num_partitions=8))

    # independent pandas oracle (the engine composition's sort-based
    # groupby leg cannot order null keys, so it is not usable here)
    df = t.to_pandas()
    g = df.groupby("host", dropna=False)
    want = pd.DataFrame({
        "n_events": g.size(),
        "n_urls": g["url"].nunique(dropna=True),
        "latest_ts": g["warc_ts"].max(),
    }).reset_index()

    gdf = got.to_pandas().sort_values("host", na_position="last") \
        .reset_index(drop=True)
    wdf = want.sort_values("host", na_position="last") \
        .reset_index(drop=True)
    cols = ["host", "n_events", "n_urls", "latest_ts"]
    casts = {"n_urls": "int64", "n_events": "int64", "latest_ts": "int64"}
    pd.testing.assert_frame_equal(gdf[cols].astype(casts),
                                  wdf[cols].astype(casts))

    # and against the engine composition on the null-free key subset
    nn = ds.map_batches(
        lambda x: x.filter(x["host"].is_valid()), batch_format="pyarrow")
    agg = grouped_aggregate(nn, ["host"], maxs={"latest_ts": "warc_ts"},
                            count_name="n_events", num_partitions=8)
    nd = grouped_count_distinct(nn, ["host"], "url", name="n_urls",
                                num_partitions=8)
    comp = to_table(hash_join(agg, nd, on=["host"], num_partitions=8)) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    gnn = gdf[gdf["host"].notna()].reset_index(drop=True)
    pd.testing.assert_frame_equal(gnn[cols].astype(casts),
                                  comp[cols].astype(casts))


def test_grouped_stats_with_distinct_all_null_group():
    """A group whose distinct values are ALL null appears with count 0."""
    from raycdc.agg import grouped_stats_with_distinct

    t = pa.table({"k": ["a", "a", "b"],
                  "v": pa.array([None, None, "x"], pa.string()),
                  "m": pa.array([1, 2, 3], pa.int64())})
    ds = ray.data.from_arrow(t).map_batches(lambda x: x,
                                            batch_format="pyarrow")
    out = to_table(grouped_stats_with_distinct(
        ds, ["k"], "v", distinct_name="nd", maxs={"mx": "m"},
        count_name="n", num_partitions=4)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["nd"].tolist() == [0, 1]
    assert out["n"].tolist() == [2, 1]
    assert out["mx"].tolist() == [2, 3]


def test_grouped_stats_with_distinct_empty_input():
    """Empty input with a plan-known schema (from_arrow source): the output
    is an EMPTY table with the full final schema (keys, aggs, distinct,
    count) — not a ValueError from finalize over the partials fallback.
    A fully-empty MAPPED pipeline loses its runtime schema in Ray 2.49
    (schema() -> None, the CLAUDE.md empty-block degrade), so that shape
    degrades to a schema-less empty result but must still not crash."""
    from raycdc.agg import grouped_stats_with_distinct

    t = pa.table({"k": pa.array([], pa.string()),
                  "v": pa.array([], pa.string()),
                  "m": pa.array([], pa.int64())})
    out_ds = grouped_stats_with_distinct(
        ray.data.from_arrow(t), ["k"], "v", distinct_name="nd",
        maxs={"mx": "m"}, count_name="n", num_partitions=4)
    # iter_batches drops zero-row blocks in Ray 2.49, so assert through the
    # surfaces that DO see the typed empty: block refs (what joins consume)
    # and the dataset schema
    blocks = ray.get(list(out_ds.to_arrow_refs()))
    out = pa.concat_tables(blocks, promote_options="default")
    assert out.num_rows == 0
    assert set(out.column_names) == {"k", "mx", "nd", "n"}
    assert out.schema.field("k").type == pa.string()
    assert out.schema.field("mx").type == pa.int64()
    assert out.schema.field("nd").type == pa.int64()
    assert out.schema.field("n").type == pa.int64()

    mapped = ray.data.from_arrow(t).map_batches(lambda x: x,
                                                batch_format="pyarrow")
    out2 = to_table(grouped_stats_with_distinct(
        mapped, ["k"], "v", distinct_name="nd", maxs={"mx": "m"},
        count_name="n", num_partitions=4))
    assert out2.num_rows == 0  # schema-less degrade tolerated, no crash


def test_stateless_stage_memo_evicts_one_not_all():
    """The per-worker memo is a bounded LRU: inserting past the cap evicts
    the single oldest instance; a hot key refreshed by use survives."""
    from raycdc.shuffle import _STATELESS_CACHE, stateless_stage

    _STATELESS_CACHE.clear()
    inits = []

    class Probe:
        def __init__(self, tag):
            self.tag = tag
            inits.append(tag)

        def __call__(self, t):
            return t

    t = pa.table({"x": [1]})
    fns = {i: stateless_stage(Probe, i) for i in range(9)}
    fns[0](t)
    for i in range(1, 8):        # fill to the cap of 8
        fns[i](t)
    fns[0](t)                    # refresh key 0 (now most recent)
    assert inits == list(range(8))
    fns[8](t)                    # 9th distinct key: evict ONE (oldest = 1)
    assert len(_STATELESS_CACHE) == 8
    fns[0](t)                    # still cached — no re-init
    assert inits == list(range(9))
    fns[1](t)                    # evicted one: re-init expected
    assert inits == list(range(9)) + [1]
    _STATELESS_CACHE.clear()


def test_small_exchange_fast_path_matches_full_plan(monkeypatch):
    """Under the size threshold the exchange collapses to one task; the
    per-partition results must be identical to the full split plan
    (including empty partitions skipped, stable within-pid row order,
    and drop_partition_col handling)."""
    P = 16
    ds, t = _mk_ds(P, n=5_000, blocks=8)
    got_small = _grouped_sum(ds, P)
    assert dict(last_exchange_stats)["level"] == "small"

    monkeypatch.setattr(shuffle, "_SMALL_EXCHANGE_BYTES", 0)
    got_full = _grouped_sum(ds, P)
    assert dict(last_exchange_stats)["level"] == "one"
    pd.testing.assert_frame_equal(_canon(got_small), _canon(got_full))

    # order-sensitive fn: first row per partition in arrival order
    def first_row(tab: pa.Table) -> pa.Table:
        return tab.slice(0, 1)

    small_first = to_table(partition_map(ds, "__p", P, first_row))
    monkeypatch.setattr(shuffle, "_SMALL_EXCHANGE_BYTES", 32 << 20)
    # note: monkeypatch above set 0 for the current context; re-set high
    full_first = to_table(partition_map(ds, "__p", P, first_row))
    assert dict(last_exchange_stats)["level"] == "small"
    a = small_first.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    b = full_first.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_small_exchange_tolerates_schema_less_empty_blocks():
    """Ray Data can degrade typed EMPTY blocks to zero-column blocks
    (CLAUDE.md invariant); the small-path task must skip them like
    _split_by_column does, and a fully-empty input must fall back to
    empty_schema."""
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "__p": pa.array([0, 1, 0], pa.int64())})
    empty = ray.data.from_arrow(pa.table({}))
    ds = ray.data.from_arrow(t).union(empty)
    out = to_table(partition_map(ds, "__p", 4, lambda x: x,
                                 empty_schema=t.schema))
    assert dict(last_exchange_stats)["level"] == "small"
    assert sorted(out["k"].to_pylist()) == [1, 2, 3]

    all_empty = ray.data.from_arrow(t.schema.empty_table()).union(empty)
    out2 = partition_map(all_empty, "__p", 4, lambda x: x,
                         empty_schema=t.schema)
    got = to_table(out2)
    assert got.num_rows == 0
