"""Incremental materialized-view maintenance (cdc/views.py): the view
maintained from the change data feed must EXACTLY equal the view recomputed
from scratch at the target version — for every hop length, including chained
hops that feed the maintained view back in as the prior. Also pins the
include_old change-feed shape and the delta-rule edge cases (group change,
group death, null groups, null sum values, empty feed)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.cdc import (apply_changelog, generate_changelog, read_lake,
                        count_view, maintain_count_view, merge_view,
                        view_delta)
from raycdc.cdc.changelog import ChangelogSpec
from raycdc.cdc.diff import table_diff

SPEC = ChangelogSpec(num_events=8_000, num_urls=600, num_epochs=4, seed=29)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, SPEC)
    lake = str(tmp_path_factory.mktemp("ivm") / "lake")
    for e in range(SPEC.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    return lake


def collect(ds, key="lang"):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))


def recompute(lake, **kw):
    return collect(count_view(read_lake(lake, **kw), "lang",
                              sums={"sum_seq": "seq"}))


def test_maintained_equals_recompute_every_hop(lake):
    for k in range(SPEC.num_epochs - 1):
        got = collect(maintain_count_view(
            lake, "lang", sums={"sum_seq": "seq"},
            from_epoch=k, num_partitions=4))
        want = recompute(lake)
        assert got.select(want.column_names).cast(want.schema).equals(want), k


def test_chained_hops_reuse_maintained_view(lake):
    """epoch 0 -> 1 -> head, each hop consuming the previous maintained
    view as its prior — the steady-state usage (never recompute again)."""
    view = count_view(read_lake(lake, as_of_epoch=0), "lang",
                      sums={"sum_seq": "seq"})
    view = maintain_count_view(lake, "lang", sums={"sum_seq": "seq"},
                               prior_view=view, from_epoch=0, to_epoch=1,
                               num_partitions=4)
    view = maintain_count_view(lake, "lang", sums={"sum_seq": "seq"},
                               prior_view=view, from_epoch=1,
                               num_partitions=4)
    got, want = collect(view), recompute(lake)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_empty_feed_is_identity(lake):
    head = recompute(lake)
    got = collect(maintain_count_view(
        lake, "lang", sums={"sum_seq": "seq"},
        from_epoch=SPEC.num_epochs - 1, num_partitions=4))
    assert got.select(head.column_names).cast(head.schema).equals(head)


def _delta_from_snapshots(old_rows, new_rows, group="g", val="v"):
    """view_delta over a table_diff(include_old=True) of two tiny
    snapshots; returns {group: (sum, count)}."""
    schema = pa.schema([("id", pa.int64()), (group, pa.string()),
                        (val, pa.int64())])
    old = ray.data.from_arrow(pa.Table.from_pylist(old_rows, schema=schema))
    new = ray.data.from_arrow(pa.Table.from_pylist(new_rows, schema=schema))
    feed = table_diff(old, new, key_cols=["id"],
                      compare_cols=[group, val], num_partitions=2,
                      include_old=True)
    d = collect(view_delta(feed, group, sums={"s": val}), key=group)
    return {r[group]: (r["s"], r["n"]) for r in d.to_pylist()}


def test_delta_rules_insert_update_delete_group_change():
    old = [{"id": 1, "g": "a", "v": 10},   # unchanged
           {"id": 2, "g": "a", "v": 5},    # value update, same group
           {"id": 3, "g": "a", "v": 7},    # moves a -> b
           {"id": 4, "g": "b", "v": 1}]    # deleted
    new = [{"id": 1, "g": "a", "v": 10},
           {"id": 2, "g": "a", "v": 9},
           {"id": 3, "g": "b", "v": 7},
           {"id": 5, "g": "c", "v": 100}]  # inserted
    d = _delta_from_snapshots(old, new)
    # a: -5 +9 (update) and -7 (departure) = -3, count -1
    # b: +7 (arrival) -1 (delete) = +6, count 0
    # c: +100, count +1
    assert d == {"a": (-3, -1), "b": (6, 0), "c": (100, 1)}


def test_null_groups_and_null_values():
    old = [{"id": 1, "g": None, "v": 3},
           {"id": 2, "g": "a", "v": None}]
    new = [{"id": 1, "g": None, "v": 8},    # null group is a real group
           {"id": 2, "g": None, "v": 2}]    # a -> null group move
    d = _delta_from_snapshots(old, new)
    # null group: -3 +8 (update) +2 (arrival), count +1
    # a: null value contributed 0, count -1
    assert d == {None: (7, 1), "a": (0, -1)}


def test_merge_drops_groups_reaching_zero():
    prior = ray.data.from_arrow(pa.table(
        {"g": ["a", "b"], "s": [10, 5], "n": [2, 1]}))
    delta = ray.data.from_arrow(pa.table(
        {"g": ["b", "c"], "s": [-5, 4], "n": [-1, 1]}))
    got = collect(merge_view(prior, delta, "g"), key="g")
    assert got.to_pylist() == [{"g": "a", "s": 10, "n": 2},
                               {"g": "c", "s": 4, "n": 1}]


def test_include_old_feed_shape():
    old = [{"id": 1, "g": "a", "v": 1}, {"id": 2, "g": "b", "v": 2}]
    new = [{"id": 2, "g": "b", "v": 3}, {"id": 3, "g": "c", "v": 4}]
    feed = collect(table_diff(
        ray.data.from_arrow(pa.Table.from_pylist(
            old, schema=pa.schema([("id", pa.int64()), ("g", pa.string()),
                                   ("v", pa.int64())]))),
        ray.data.from_arrow(pa.Table.from_pylist(
            new, schema=pa.schema([("id", pa.int64()), ("g", pa.string()),
                                   ("v", pa.int64())]))),
        key_cols=["id"], compare_cols=["g", "v"], num_partitions=2,
        include_old=True), key="id")
    rows = {r["id"]: r for r in feed.to_pylist()}
    assert rows[1]["op"] == "D" and rows[1]["g"] is None \
        and rows[1]["old_g"] == "a" and rows[1]["old_v"] == 1
    assert rows[2]["op"] == "U" and rows[2]["g"] == "b" \
        and rows[2]["v"] == 3 and rows[2]["old_v"] == 2
    assert rows[3]["op"] == "I" and rows[3]["old_g"] is None \
        and rows[3]["g"] == "c" and rows[3]["v"] == 4


def test_reserved_count_name_rejected(lake):
    with pytest.raises(ValueError, match="reserved"):
        count_view(read_lake(lake), "lang", sums={"n": "seq"})
