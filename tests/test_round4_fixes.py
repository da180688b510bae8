"""Round-4 fixes: chunked exchange splits, tree-reduced sketches, temporal
key units (ns regression from ADVICE r3), hash_join auto-broadcast, and the
vectorized feature extractor."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


# ------------------------------------------------------ shuffle internals
def test_partition_map_many_small_blocks_with_empties():
    from raycdc.shuffle import partition_map

    # 13 one-row blocks (exercises the 4-block chunking with a ragged tail)
    # plus schema-less empty blocks from an empty-filtered union branch
    parts = [ray.data.from_arrow(pa.table({
        "k": pa.array([i % 3], pa.int64()),
        "v": pa.array([i], pa.int64()),
        "__p": pa.array([i % 3], pa.int64()),
    })) for i in range(13)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    empty = ray.data.from_items([{"k": 0, "v": 0, "__p": 0}]).filter(
        lambda r: False)
    ds = ds.union(empty).map_batches(lambda t: t, batch_format="pyarrow")

    got = to_table(partition_map(
        ds, "__p", 3,
        lambda t: t.group_by("k").aggregate([("v", "sum")])))
    got_map = dict(zip(got["k"].to_pylist(), got["v_sum"].to_pylist()))
    want = {k: sum(i for i in range(13) if i % 3 == k) for k in range(3)}
    assert got_map == want


def test_tree_reduce_sums_across_fanin_layers():
    from raycdc.shuffle import tree_reduce

    parts = [ray.data.from_arrow(pa.table({"n": pa.array([i], pa.int64())}))
             for i in range(10)]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"n": pa.array([pc.sum(t["n"]).as_py() or 0],
                                       pa.int64())})

    out = tree_reduce(ds, combine, fanin=3)
    assert out["n"].to_pylist() == [sum(range(10))]
    assert tree_reduce(ray.data.from_items([]).map_batches(
        lambda t: t, batch_format="pyarrow"), combine) is None


def test_heavy_hitters_tree_many_blocks_matches_exact():
    from raycdc.ops.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.full(400, 1), np.full(300, 2), np.full(150, 3),
        rng.integers(100, 1000, size=150)])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    # many small blocks -> deep summary tree
    ds = ds.repartition(37).map_batches(lambda t: t, batch_format="pyarrow")
    out = to_table(heavy_hitters(ds, "v", threshold_frac=0.1))
    got = dict(zip(out["v"].to_pylist(), out["n"].to_pylist()))
    import collections
    counts = collections.Counter(vals.tolist())
    want = {k: c for k, c in counts.items() if c >= 0.1 * len(vals)}
    assert got == want


@pytest.mark.parametrize("seed,nblocks", [(3, 5), (11, 41), (29, 97)])
def test_heavy_hitters_tree_matches_exact_strings_and_nulls(seed, nblocks):
    import collections

    from raycdc.ops.sketch import heavy_hitters

    rng = np.random.default_rng(seed)
    vals = (["hot"] * 500 + ["warm"] * 200 + [None] * 150
            + [f"v{i}" for i in rng.integers(0, 400, size=400)])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    ds = ds.repartition(nblocks).map_batches(lambda t: t,
                                             batch_format="pyarrow")
    out = to_table(heavy_hitters(ds, "v", threshold_frac=0.08))
    got = dict(zip(out["v"].to_pylist(), out["n"].to_pylist()))
    counts = collections.Counter(vals)
    want = {k: c for k, c in counts.items() if c >= 0.08 * len(vals)}
    assert got == want  # includes the null group


@pytest.mark.parametrize("nblocks", [7, 53])
def test_approx_quantile_full_fidelity_tree_is_exact(nblocks):
    import duckdb

    from raycdc.ops.sketch import approx_quantile

    rng = np.random.default_rng(5)
    # no NaN: the engine pins "NaN sorts last" (round-3 convention) while
    # DuckDB's quantile_disc EXCLUDES NaN — cross-engine parity is only
    # defined NaN-free, which is what the oracle-checked configs see
    vals = np.concatenate([rng.lognormal(0, 2, 4000),
                           rng.integers(0, 9, 300).astype(np.float64)])
    rng.shuffle(vals)
    t = pa.table({"x": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(nblocks).map_batches(
        lambda b: b, batch_format="pyarrow")
    out = to_table(approx_quantile(ds, "x", [0.1, 0.5, 0.99],
                                   names=["q10", "q50", "q99"], m=1 << 20))
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT quantile_disc(x, 0.1), quantile_disc(x, 0.5), "
        "quantile_disc(x, 0.99) FROM t").fetchone()
    got = (out["q10"][0].as_py(), out["q50"][0].as_py(),
           out["q99"][0].as_py())
    assert got == tuple(want)


def test_approx_distinct_tree_many_blocks():
    from raycdc.ops.sketch import approx_distinct

    ds = ray.data.range(5000).map_batches(
        lambda t: pa.table({"v": t["id"]}), batch_format="pyarrow"
    ).repartition(23).map_batches(lambda t: t, batch_format="pyarrow")
    est = to_table(approx_distinct(ds, "v"))["approx_distinct"][0].as_py()
    assert abs(est - 5000) / 5000 < 0.05


# ----------------------------------------------------- temporal key units
def test_hash_join_ns_keys_with_sub_us_components():
    """ADVICE r3: ns-vs-ns joins with sub-microsecond ticks raised
    ArrowInvalid through the lossy us normalization."""
    from raycdc.joins import hash_join

    ts = [1_000_000_001, 1_000_000_501, 2_000_000_007]  # sub-us components
    left = ray.data.from_arrow(pa.table({
        "t": pa.array(ts, pa.timestamp("ns")),
        "lv": pa.array([1, 2, 3], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "t": pa.array(ts[:2], pa.timestamp("ns")),
        "rv": pa.array([10, 20], pa.int64())}))
    out = to_table(hash_join(left, right, on=["t"], num_partitions=4,
                             strategy="shuffle"))
    got = dict(zip(out["lv"].to_pylist(), out["rv"].to_pylist()))
    assert got == {1: 10, 2: 20}


def test_hash_join_cross_unit_timestamp_keys_match_instants():
    from raycdc.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "t": pa.array([10**6, 2 * 10**6, 3 * 10**6], pa.timestamp("us")),
        "lv": pa.array([1, 2, 3], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "t": pa.array([10**9, 3 * 10**9], pa.timestamp("ns")),
        "rv": pa.array([10, 30], pa.int64())}))
    for strategy in ("shuffle", "auto"):
        out = to_table(hash_join(left, right, on=["t"], num_partitions=4,
                                 strategy=strategy))
        got = dict(zip(out["lv"].to_pylist(), out["rv"].to_pylist()))
        assert got == {1: 10, 3: 30}, strategy


def test_asof_join_ns_vs_us_sides():
    from raycdc.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": ["a", "a"],
        "ts": pa.array([1_500_000_000, 2_500_000_250], pa.timestamp("ns")),
        "lid": pa.array([1, 2], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": ["a", "a"],
        "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
        "rv": pa.array([10, 20], pa.int64())}))
    out = to_table(asof_join(left, right, on="ts", by=["k"],
                             num_partitions=2))
    got = dict(zip(out["lid"].to_pylist(), out["rv"].to_pylist()))
    assert got == {1: 10, 2: 20}


def test_interval_join_cross_unit_bounds():
    from raycdc.joins import interval_join

    left = ray.data.from_arrow(pa.table({
        "k": ["a", "a", "a"],
        "at": pa.array([1_500_000_000, 3_500_000_000, 9_000_000_000],
                       pa.timestamp("ns")),
        "lid": pa.array([1, 2, 3], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": ["a", "a"],
        "lo": pa.array([1_000_000, 3_000_000], pa.timestamp("us")),
        "hi": pa.array([2_000_000, 4_000_000], pa.timestamp("us")),
        "rv": pa.array([10, 20], pa.int64())}))
    out = to_table(interval_join(left, right, on="at", by=["k"],
                                 lo="lo", hi="hi", join_type="left_outer",
                                 num_partitions=2))
    got = dict(zip(out["lid"].to_pylist(), out["rv"].to_pylist()))
    assert got == {1: 10, 2: 20, 3: None}


# ------------------------------------------------- hash_join auto strategy
JOIN_TYPES = ["inner", "left_outer", "left_semi", "left_anti"]


@pytest.mark.parametrize("join_type", JOIN_TYPES)
def test_hash_join_auto_broadcast_matches_shuffle(join_type):
    from raycdc.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, None, 5], pa.int64()),
        "lv": pa.array(list("abcdef"))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 3, None], pa.int64()),
        "rv": pa.array(["x", "y", "z", "n"])}))
    if join_type in ("left_semi", "left_anti"):
        right = ray.data.from_arrow(pa.table(
            {"k": pa.array([2, 3, 3, None], pa.int64())}))

    import collections

    def canon(t: pa.Table):
        return collections.Counter(
            map(tuple, zip(*[t[c].to_pylist()
                             for c in sorted(t.column_names)])))

    got_auto = to_table(hash_join(left, right, on=["k"],
                                  join_type=join_type, num_partitions=4))
    got_shuf = to_table(hash_join(left, right, on=["k"],
                                  join_type=join_type, num_partitions=4,
                                  strategy="shuffle"))
    assert sorted(got_auto.column_names) == sorted(got_shuf.column_names)
    assert canon(got_auto) == canon(got_shuf)


def test_hash_join_auto_large_right_falls_back_to_shuffle():
    from raycdc.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()), "lv": ["a", "b"]}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3], pa.int64()), "rv": ["x", "y"]}))
    out = to_table(hash_join(left, right, on=["k"], num_partitions=2,
                             broadcast_max_bytes=1))  # forces shuffle
    assert dict(zip(out["lv"].to_pylist(),
                    out["rv"].to_pylist())) == {"b": "x"}


def test_hash_join_auto_broadcast_widens_int_widths():
    from raycdc.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int32()), "lv": ["a", "b"]}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3], pa.int64()), "rv": ["x", "y"]}))
    out = to_table(hash_join(left, right, on=["k"], num_partitions=2))
    assert dict(zip(out["lv"].to_pylist(),
                    out["rv"].to_pylist())) == {"b": "x"}


def test_auto_broadcast_join_tolerates_schemaless_empty_left_blocks():
    """A union branch whose filter drops every row hands the probe actors
    schema-less empty blocks; the broadcast path must tolerate them like
    the shuffle path does."""
    from raycdc.joins import hash_join

    base = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()), "lv": ["a", "b", "c"]}))
    empty = ray.data.from_items([{"k": 0, "lv": "z"}]).filter(lambda r: False)
    left = base.union(empty)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3], pa.int64()), "rv": ["x", "y"]}))
    out = to_table(hash_join(left, right, on=["k"], num_partitions=2))
    assert dict(zip(out["lv"].to_pylist(),
                    out["rv"].to_pylist())) == {"b": "x", "c": "y"}


# ------------------------------------------------ vectorized fake decode
def test_feature_extractor_batch_matches_single_row_kernel():
    from raycdc.ops.multimodal import BinaryFeatureExtractor, \
        extract_features

    payloads = [b"\x01\x02\x03" * 50, b"\xff" * 10, b"", None, b"Q"]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary())}))
    out = to_table(extract_features(ds, dim=8)).sort_by("id")
    ex = BinaryFeatureExtractor(dim=8)
    for i, p in enumerate(payloads):
        want = ex._decode(p)
        got = np.asarray(out["features"].to_pylist()[i], dtype=np.float32)
        assert np.allclose(got, want), i
    # length component stays human-checkable; empty/None decode as b"\x00"
    lens = [f[0] for f in out["features"].to_pylist()]
    assert lens == [150.0, 10.0, 1.0, 1.0, 1.0]


# ------------------------------------------- pid-unique tmps + vacuum GC
def test_atomic_writers_use_pid_unique_tmps_and_vacuum_gcs_them(tmp_path):
    """Repo invariant: every atomic writer's tmp name embeds the pid so two
    processes rewriting the same artifact never interleave one shared
    inode. Orphaned tmps from crashed writers are vacuumed once stale,
    but a fresh (in-flight) tmp must survive."""
    import os
    import time

    from raycdc.cdc.sink import (LakeManifest, atomic_write_parquet,
                                 commit_manifest, manifest_path, vacuum)

    lake = str(tmp_path / "lake")
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    part = os.path.join(lake, "part-00000", "v1.parquet")
    atomic_write_parquet(t, part)
    commit_manifest(lake, LakeManifest(
        version=1, num_partitions=1, epochs_applied=[0], watermark_seq=1,
        partitions={"0": {"files": ["part-00000/v1.parquet"],
                          "rows": 2, "bytes": 1, "lineage": []}}))
    # neither writer left its tmp behind, and neither used a bare ".tmp"
    leftovers = [f for r, _, fs in os.walk(lake) for f in fs if ".tmp" in f]
    assert leftovers == []

    # a crashed writer's orphan: stale → GC'd; fresh → untouched
    stale = part + f".tmp.{os.getpid() + 1}"
    fresh = manifest_path(lake) + f".tmp.{os.getpid() + 2}"
    for p in (stale, fresh):
        with open(p, "wb") as f:
            f.write(b"partial")
    old = time.time() - 3600
    os.utime(stale, (old, old))
    removed = vacuum(lake)
    assert os.path.relpath(stale, lake) in removed
    assert os.path.exists(fresh)
    # the committed data file is still live
    assert os.path.exists(part)
