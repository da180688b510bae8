"""MIN/MAX incremental view maintenance (cdc/views.maintain_extreme_view):
the maintained view must EXACTLY equal the view recomputed from scratch at
the target version — for every hop, for chained hops, and for a
hand-crafted lake that forces each maintenance path (fold-only insert,
non-extreme retraction, extreme retraction -> dirty recompute, group death,
duplicate extremes, all-null value groups)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.cdc import (apply_changelog, extreme_view, generate_changelog,
                        maintain_extreme_view, merge_into, read_lake)
from raycdc.cdc.changelog import ChangelogSpec

SPEC = ChangelogSpec(num_events=8_000, num_urls=600, num_epochs=4, seed=31)
EXT = {"min_seq": ("seq", "min"), "max_seq": ("seq", "max")}


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, SPEC)
    lake = str(tmp_path_factory.mktemp("mmivm") / "lake")
    for e in range(SPEC.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    return lake


def collect(ds, key="lang"):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))


def recompute(lake, key="lang", ext=EXT, **kw):
    return collect(extreme_view(read_lake(lake, **kw), key, ext), key)


def test_maintained_equals_recompute_every_hop(lake):
    want = recompute(lake)
    for k in range(SPEC.num_epochs - 1):
        got = collect(maintain_extreme_view(
            lake, "lang", EXT, from_epoch=k, num_partitions=4))
        assert got.select(want.column_names).cast(want.schema).equals(want), k


def test_chained_hops_reuse_maintained_view(lake):
    view = extreme_view(read_lake(lake, as_of_epoch=0), "lang", EXT)
    view = maintain_extreme_view(lake, "lang", EXT, prior_view=view,
                                 from_epoch=0, to_epoch=2, num_partitions=4)
    view = maintain_extreme_view(lake, "lang", EXT, prior_view=view,
                                 from_epoch=2, num_partitions=4)
    got, want = collect(view), recompute(lake)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_empty_feed_is_identity(lake):
    want = recompute(lake)
    got = collect(maintain_extreme_view(
        lake, "lang", EXT, from_epoch=SPEC.num_epochs - 1,
        num_partitions=4))
    assert got.select(want.column_names).cast(want.schema).equals(want)


def _src(rows):
    schema = pa.schema([("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("seq", pa.int64()), ("g", pa.string()),
                        ("v", pa.int64()), ("_del", pa.bool_())])
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def _ts(i):
    import datetime

    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i)


def test_crafted_paths_fold_dirty_death_and_duplicates(tmp_path):
    """One lake, every maintenance path at once: v1 plants groups with
    known extremes (incl. a DUPLICATE max and an all-null group); v2
    deletes one copy of the duplicate max (dirty, extreme survives),
    deletes a group's only row (death), updates a non-extreme value
    (fold-only retraction), inserts a brand-new group and a new global
    min (fold), and moves a row across groups."""
    lake = str(tmp_path / "lake")
    v1 = [
        # group A: min 1, max 9 twice (duplicate extreme)
        dict(url="a1", warc_ts=_ts(1), seq=1, g="A", v=1, _del=False),
        dict(url="a2", warc_ts=_ts(1), seq=2, g="A", v=9, _del=False),
        dict(url="a3", warc_ts=_ts(1), seq=3, g="A", v=9, _del=False),
        dict(url="a4", warc_ts=_ts(1), seq=4, g="A", v=5, _del=False),
        # group B: single row (will die)
        dict(url="b1", warc_ts=_ts(1), seq=5, g="B", v=7, _del=False),
        # group C: all-null values (extreme NULL, count 2)
        dict(url="c1", warc_ts=_ts(1), seq=6, g="C", v=None, _del=False),
        dict(url="c2", warc_ts=_ts(1), seq=7, g="C", v=None, _del=False),
        # group D: donor for the cross-group move
        dict(url="d1", warc_ts=_ts(1), seq=8, g="D", v=4, _del=False),
        dict(url="d2", warc_ts=_ts(1), seq=9, g="D", v=2, _del=False),
    ]
    merge_into(lake, _src(v1), num_partitions=2, delete_col="_del")
    from raycdc.cdc.sink import read_manifest

    v_from = read_manifest(lake).version
    v2 = [
        dict(url="a3", warc_ts=_ts(2), seq=10, g="A", v=9, _del=True),
        dict(url="a4", warc_ts=_ts(2), seq=11, g="A", v=6, _del=False),
        dict(url="b1", warc_ts=_ts(2), seq=12, g="B", v=7, _del=True),
        dict(url="c1", warc_ts=_ts(2), seq=13, g="C", v=None, _del=True),
        dict(url="e1", warc_ts=_ts(2), seq=14, g="E", v=100, _del=False),
        dict(url="a5", warc_ts=_ts(2), seq=15, g="A", v=0, _del=False),
        # d1 moves from D to A (old extreme of D retracted -> D dirty)
        dict(url="d1", warc_ts=_ts(2), seq=16, g="A", v=4, _del=False),
    ]
    merge_into(lake, _src(v2), num_partitions=2, delete_col="_del")

    ext = {"vmin": ("v", "min"), "vmax": ("v", "max")}
    got = collect(maintain_extreme_view(
        lake, "g", ext, from_version=v_from, num_partitions=2), key="g")
    want = recompute(lake, key="g", ext=ext)
    assert got.select(want.column_names).cast(want.schema).equals(want)
    by_g = {r["g"]: r for r in got.to_pylist()}
    assert by_g["A"] == {"g": "A", "vmin": 0, "vmax": 9, "n": 5}
    assert "B" not in by_g                               # group death
    assert by_g["C"] == {"g": "C", "vmin": None, "vmax": None, "n": 1}
    assert by_g["E"] == {"g": "E", "vmin": 100, "vmax": 100, "n": 1}
    assert by_g["D"] == {"g": "D", "vmin": 2, "vmax": 2, "n": 1}


def test_null_group_rows_are_their_own_group(tmp_path):
    lake = str(tmp_path / "lake")
    v1 = [
        dict(url="x1", warc_ts=_ts(1), seq=1, g=None, v=3, _del=False),
        dict(url="x2", warc_ts=_ts(1), seq=2, g=None, v=8, _del=False),
        dict(url="y1", warc_ts=_ts(1), seq=3, g="Y", v=5, _del=False),
    ]
    merge_into(lake, _src(v1), num_partitions=2, delete_col="_del")
    from raycdc.cdc.sink import read_manifest

    v_from = read_manifest(lake).version
    v2 = [  # retract the null group's max -> dirty recompute of NULL group
        dict(url="x2", warc_ts=_ts(2), seq=4, g=None, v=8, _del=True),
        dict(url="x3", warc_ts=_ts(2), seq=5, g=None, v=1, _del=False),
    ]
    merge_into(lake, _src(v2), num_partitions=2, delete_col="_del")
    ext = {"vmin": ("v", "min"), "vmax": ("v", "max")}
    got = collect(maintain_extreme_view(
        lake, "g", ext, from_version=v_from, num_partitions=2), key="g")
    want = recompute(lake, key="g", ext=ext)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_extreme_spec_validation():
    with pytest.raises(ValueError):
        maintain_extreme_view("/nonexistent", "g", {})
    with pytest.raises(ValueError):
        maintain_extreme_view("/nonexistent", "g", {"x": ("v", "avg")})
    with pytest.raises(ValueError):
        maintain_extreme_view("/nonexistent", "g", {"g": ("v", "min")})


def test_randomized_multi_hop_merges_match_recompute(tmp_path):
    """Randomized churn: 4 sequential merge batches of inserts/updates/
    deletes over random groups and values (nulls, duplicate extremes,
    group moves included by construction), with the maintained view
    CHAINED hop to hop — must equal the recompute at every version."""
    import random

    rng = random.Random(47)
    lake = str(tmp_path / "lake")
    ext = {"vmin": ("v", "min"), "vmax": ("v", "max")}
    groups = ["A", "B", "C", None]
    live = {}  # url -> (g, v)
    seq = 0
    versions = []
    from raycdc.cdc.sink import read_manifest

    for batch_no in range(4):
        rows = []
        # inserts / upserts
        for _ in range(25):
            url = f"u{rng.randrange(40)}"
            g = rng.choice(groups)
            v = rng.choice([None, rng.randrange(5)])  # few values -> dups
            seq += 1
            rows.append(dict(url=url, warc_ts=_ts(seq), seq=seq, g=g, v=v,
                             _del=False))
            live[url] = (g, v)
        # deletes of existing urls
        for url in rng.sample(sorted(live), k=min(6, len(live))):
            seq += 1
            rows.append(dict(url=url, warc_ts=_ts(seq), seq=seq,
                             g=None, v=None, _del=True))
            live.pop(url)
        merge_into(lake, _src(rows), num_partitions=2, delete_col="_del")
        versions.append(read_manifest(lake).version)

    # maintained view chained across all hops == recompute at head
    view = extreme_view(read_lake(lake, as_of_version=versions[0]), "g", ext)
    for v_from, v_to in zip(versions, versions[1:]):
        view = maintain_extreme_view(
            lake, "g", ext, prior_view=view,
            from_version=v_from, to_version=v_to, num_partitions=2)
    got = collect(view, key="g")
    want = recompute(lake, key="g", ext=ext)
    assert got.select(want.column_names).cast(want.schema).equals(want)
    # and the python model agrees on group counts
    import collections as _c

    model = _c.Counter(g for g, _ in live.values())
    by_g = {r["g"]: r["n"] for r in got.to_pylist()}
    assert by_g == dict(model)
