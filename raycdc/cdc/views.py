"""Incremental materialized-view maintenance over the change data feed.

The canonical CDC downstream: a grouped aggregate view (count per group,
plus optional integer sums) kept up to date from `lake_changes` deltas
instead of recomputing over the whole lake. Each feed row contributes
retractions and additions (the classic delta-rule for distributive
aggregates):

- ``I``: +1 (and +value) under the NEW group
- ``D``: -1 (and -value) under the OLD group
- ``U``: -1 under the OLD group and +1 under the NEW group (cancels to a
  pure value delta when the group did not change)

Counts and sums are distributive, so the maintained view is EXACTLY the
view recomputed from scratch at the target version (gated by
tests/test_views.py). Everything is sized by the churn: the feed scans only
partitions whose manifests changed, the delta is a grouped pre-aggregated
exchange over feed rows, and the merge touches view rows only (groups, not
the corpus). Aggregates stay integer end-to-end — no accumulation-order
float drift — which is what makes the view oracle-checkable by value hash.

Null semantics: a null group value is a group of its own (SQL ``GROUP BY``
keeps it); null values in a sum column contribute 0 (SQL ``SUM`` ignores
nulls).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_COUNT = "n"


def _sum_specs(sums: Optional[dict[str, str]], group_col: str,
               count_name: str) -> dict[str, str]:
    sums = dict(sums or {})
    if count_name in sums:
        raise ValueError(f"sum output name {count_name!r} is reserved for "
                         "the view's row count")
    # a colliding name would silently overwrite the grouping column in the
    # pa.table dict (the view would group by the summed values) — raise
    bad = [n for n in list(sums) + [count_name] if n in (group_col, "__w")]
    if bad:
        raise ValueError(f"output names {bad} collide with the group "
                         f"column {group_col!r} or an internal column")
    return sums


def count_view(
    live: ray.data.Dataset,
    group_col: str,
    *,
    sums: Optional[dict[str, str]] = None,  # out_name -> source col (int)
    count_name: str = _COUNT,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Full recompute of the view: count (and integer sums) per group over
    the live rows — the bootstrap for :func:`maintain_count_view` and the
    equality oracle for its tests."""
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import _pa_schema

    sums = _sum_specs(sums, group_col, count_name)
    in_schema = _pa_schema(live)
    empty = pa.schema(
        [in_schema.field(group_col)]
        + [pa.field(out, pa.int64()) for out in sums]).empty_table()

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and group_col not in t.column_names:
            return empty  # zero-column degraded empty (CLAUDE.md)
        return pa.table(
            {group_col: t[group_col],
             **{out: pc.cast(t[col], pa.int64())
                for out, col in sums.items()}})

    src = live.map_batches(project, batch_format="pyarrow")
    # exchange="partition": group values may be NULL, which Ray's
    # sort-based groupby cannot order (None < str raises).
    return grouped_aggregate(src, [group_col],
                             sums={out: out for out in sums},
                             count_name=count_name, exchange="partition",
                             num_partitions=num_partitions)


def view_delta(
    changes: ray.data.Dataset,
    group_col: str,
    *,
    sums: Optional[dict[str, str]] = None,
    count_name: str = _COUNT,
    old_prefix: str = "old_",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-group view delta from an ``include_old=True`` change feed.

    Input columns: ``op`` ('I'/'U'/'D'), ``group_col`` (new value, null for
    D), ``old_<group_col>`` (old value, null for I), and likewise for every
    sum source column. Output: one row per touched group with the SIGNED
    count/sum deltas (zero-delta groups are kept — the merge drops groups
    only when their merged count reaches zero).
    """
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import _pa_schema

    sums = _sum_specs(sums, group_col, count_name)
    in_schema = _pa_schema(changes)
    contrib_empty = pa.schema(
        [in_schema.field(group_col)]
        + [pa.field(out, pa.int64()) for out in sums]
        + [pa.field("__w", pa.int64())]).empty_table()

    def contributions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "op" not in t.column_names:
            return contrib_empty  # zero-column degraded empty (CLAUDE.md)
        op = t["op"]
        plus = pc.fill_null(pc.not_equal(op, "D"), False)   # I, U
        minus = pc.fill_null(pc.not_equal(op, "I"), False)  # U, D
        pt, mt = t.filter(plus), t.filter(minus)

        def side(src: pa.Table, sign: int, prefix: str) -> pa.Table:
            import numpy as np

            cols = {group_col: src[f"{prefix}{group_col}"]}
            for out, col in sums.items():
                v = pc.fill_null(
                    pc.cast(src[f"{prefix}{col}"], pa.int64()), 0)
                cols[out] = pc.multiply(v, pa.scalar(sign, pa.int64()))
            cols["__w"] = pa.array(
                np.full(src.num_rows, sign, dtype=np.int64))
            return pa.table(cols)

        return pa.concat_tables([side(pt, 1, ""),
                                 side(mt, -1, old_prefix)])

    contrib = changes.map_batches(contributions, batch_format="pyarrow")
    agg = grouped_aggregate(contrib, [group_col],
                            sums={**{out: out for out in sums},
                                  count_name: "__w"},
                            exchange="partition",
                            num_partitions=num_partitions)
    # grouped_aggregate emits count_name via its sums path here (the signed
    # weight IS the count delta); cast every delta to int64 for a stable
    # schema even when a batch's pandas hop widened an empty column.
    target = pa.schema([in_schema.field(group_col)]
                       + [pa.field(out, pa.int64()) for out in sums]
                       + [pa.field(count_name, pa.int64())])
    return agg.map_batches(
        lambda t: target.empty_table()
        if t.num_rows == 0 and group_col not in t.column_names
        else t.select(target.names).cast(target),
        batch_format="pyarrow")


def merge_view(
    prior: ray.data.Dataset,
    delta: ray.data.Dataset,
    group_col: str,
    *,
    value_cols: Optional[list[str]] = None,
    count_name: str = _COUNT,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Fold a view delta into the prior view: groups are summed, and a
    group whose merged count reaches zero disappears (exactly the recompute
    semantics — a group exists iff it has live rows)."""
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import _pa_schema

    if value_cols is None:
        value_cols = [c for c in _pa_schema(prior).names
                      if c not in (group_col, count_name)]
    names = [group_col] + list(value_cols) + [count_name]
    both = prior.select_columns(names).union(delta.select_columns(names))
    merged = grouped_aggregate(
        both, [group_col],
        sums={c: c for c in list(value_cols) + [count_name]},
        exchange="partition", num_partitions=num_partitions)
    return merged.map_batches(
        lambda t: t if t.num_rows == 0
        else t.filter(pc.not_equal(t[count_name], 0)),
        batch_format="pyarrow")


def _extreme_specs(extremes: dict, group_col: str, count_name: str) -> dict:
    if not extremes:
        raise ValueError("extremes must map out_name -> (source_col, "
                         "'min'|'max')")
    for out, (col, kind) in extremes.items():
        if kind not in ("min", "max"):
            raise ValueError(f"extreme {out!r}: kind must be 'min' or "
                             f"'max', got {kind!r}")
    bad = [n for n in list(extremes) + [count_name]
           if n in (group_col, "__w")]
    if bad or count_name in extremes:
        raise ValueError(f"output names {bad or [count_name]} collide with "
                         f"the group column {group_col!r}, the count, or an "
                         "internal column")
    return dict(extremes)


def extreme_view(
    live: ray.data.Dataset,
    group_col: str,
    extremes: dict,  # out_name -> (source_col, "min"|"max")
    *,
    count_name: str = _COUNT,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Full recompute of a MIN/MAX view: per-group extremes plus the live
    row count — the bootstrap for :func:`maintain_extreme_view` and the
    equality oracle for its tests. Values keep their source type; an
    all-null group's extreme is NULL (SQL MIN/MAX ignore nulls); the count
    is what decides group existence."""
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import _pa_schema

    extremes = _extreme_specs(extremes, group_col, count_name)
    in_schema = _pa_schema(live)
    empty = pa.schema(
        [in_schema.field(group_col)]
        + [pa.field(out, in_schema.field(col).type)
           for out, (col, _) in extremes.items()]).empty_table()

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and group_col not in t.column_names:
            return empty  # zero-column degraded empty (CLAUDE.md)
        return pa.table({group_col: t[group_col],
                         **{out: t[col]
                            for out, (col, _) in extremes.items()}})

    src = live.map_batches(project, batch_format="pyarrow")
    view = grouped_aggregate(
        src, [group_col],
        mins={o: o for o, (_, k) in extremes.items() if k == "min"},
        maxs={o: o for o, (_, k) in extremes.items() if k == "max"},
        count_name=count_name, exchange="partition",
        num_partitions=num_partitions)
    target = pa.schema(list(empty.schema)
                       + [pa.field(count_name, pa.int64())])
    return view.map_batches(
        lambda t: target.empty_table()
        if t.num_rows == 0 and group_col not in t.column_names
        else t.select(target.names).cast(target),
        batch_format="pyarrow")


def maintain_extreme_view(
    lake_dir: str,
    group_col: str,
    extremes: dict,  # out_name -> (source_col, "min"|"max")
    *,
    count_name: str = _COUNT,
    prior_view: Optional[ray.data.Dataset] = None,
    from_version: Optional[int] = None,
    from_epoch: Optional[int] = None,
    to_version: Optional[int] = None,
    to_epoch: Optional[int] = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Maintain a grouped MIN/MAX (+count) view incrementally from the
    change feed. MIN/MAX are not fully distributive under deletion — an
    insertion only ever FOLDS in (``min(prior, new)``), but retracting the
    current extreme needs a second look. The classic maintenance rule:

    - additions (I rows + the new side of U) fold: one grouped min/max +
      signed count over the feed, merged into the prior view — no lake
      access;
    - a retraction (D rows + the old side of U) marks its group DIRTY only
      when the retracted value EQUALS the group's prior extreme (a
      non-extreme value can never move MIN/MAX; null retractions never
      dirty) or the group is unknown to the prior view;
    - dirty groups — churn-bounded, typically a tiny fraction — are
      recomputed exactly from the live lake at the target version,
      filtered down by a broadcast membership probe (the corpus pays a
      pruned read, never an exchange).

    Groups whose merged count reaches zero disappear, exactly like a
    recompute; a hash match against the full recompute is the test/driver
    oracle. Work is sized by churn + dirty-group rows, never the corpus.
    """
    from raycdc.agg import grouped_aggregate
    from raycdc.cdc.apply import lake_changes, read_lake
    from raycdc.joins import _pa_schema, hash_join

    extremes = _extreme_specs(extremes, group_col, count_name)
    if prior_view is None:
        prior_view = extreme_view(
            read_lake(lake_dir, as_of_version=from_version,
                      as_of_epoch=from_epoch),
            group_col, extremes, count_name=count_name,
            num_partitions=num_partitions)
    # the prior view feeds BOTH the fold and the dirty probe (view-sized)
    prior_view = prior_view.materialize()
    compare = sorted({group_col, *{c for c, _ in extremes.values()}})
    # the feed drives the fold, the dirty probe and the count delta
    # (churn-sized; lake_changes already prunes unchanged partitions)
    feed = lake_changes(lake_dir,
                        from_version=from_version, from_epoch=from_epoch,
                        to_version=to_version, to_epoch=to_epoch,
                        compare_cols=compare, include_old=True,
                        num_partitions=num_partitions).materialize()

    in_schema = _pa_schema(feed)
    gtype = in_schema.field(group_col).type
    vtype = {out: in_schema.field(col).type
             for out, (col, _) in extremes.items()}
    target = pa.schema([pa.field(group_col, gtype)]
                       + [pa.field(out, vtype[out]) for out in extremes]
                       + [pa.field(count_name, pa.int64())])

    # -- 1. one-exchange fold delta: adds' min/max + the signed count.
    # Retraction rows ride along with NULL values (MIN/MAX ignore them) so
    # one grouped_aggregate yields both the fold values and the count delta.
    def contributions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "op" not in t.column_names:
            return target.empty_table()
        op = t["op"]
        pt = t.filter(pc.fill_null(pc.not_equal(op, "D"), False))
        mt = t.filter(pc.fill_null(pc.not_equal(op, "I"), False))
        plus = pa.table(
            {group_col: pt[group_col],
             **{out: pt[col] for out, (col, _) in extremes.items()},
             count_name: pa.array(
                 np.ones(pt.num_rows, dtype=np.int64))})
        minus = pa.table(
            {group_col: mt[f"old_{group_col}"],
             **{out: pa.nulls(mt.num_rows, vtype[out])
                for out in extremes},
             count_name: pa.array(
                 np.full(mt.num_rows, -1, dtype=np.int64))})
        return pa.concat_tables([plus.cast(target), minus.cast(target)])

    delta = grouped_aggregate(
        feed.map_batches(contributions, batch_format="pyarrow"),
        [group_col],
        mins={o: o for o, (_, k) in extremes.items() if k == "min"},
        maxs={o: o for o, (_, k) in extremes.items() if k == "max"},
        sums={count_name: count_name},
        exchange="partition", num_partitions=num_partitions)
    delta = delta.map_batches(
        lambda t: target.empty_table()
        if t.num_rows == 0 and group_col not in t.column_names
        else t.select(target.names).cast(target),
        batch_format="pyarrow")

    # -- 2. dirty groups: retractions whose old value equals the prior
    # extreme (or whose group the prior view does not know).
    ret_schema = pa.schema(
        [pa.field(group_col, gtype)]
        + [pa.field(f"__old_{out}", vtype[out]) for out in extremes])

    def retractions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "op" not in t.column_names:
            return ret_schema.empty_table()
        mt = t.filter(pc.fill_null(pc.not_equal(t["op"], "I"), False))
        return pa.table(
            {group_col: mt[f"old_{group_col}"],
             **{f"__old_{out}": mt[f"old_{col}"]
                for out, (col, _) in extremes.items()}}).cast(ret_schema)

    # pin the schema: zero retractions would hand hash_join a schema-less
    # empty dataset (CLAUDE.md invariant)
    rets = ray.data.from_arrow(ret_schema.empty_table()).union(
        feed.map_batches(retractions, batch_format="pyarrow"))
    probe = hash_join(rets, prior_view, on=[group_col],
                      join_type="left_outer",
                      num_partitions=num_partitions)

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([pa.field(group_col, gtype)]).empty_table()
        # a null-group retraction never joins (SQL) — count_name is null
        # either way, and null groups land in the dirty set conservatively
        dirty = pc.is_null(t[count_name])
        for out in extremes:
            dirty = pc.or_(dirty, pc.fill_null(
                pc.equal(t[f"__old_{out}"], t[out]), False))
        return pa.table({group_col: t.filter(dirty)[group_col]})

    dirty_rows = probe.map_batches(classify, batch_format="pyarrow")
    # churn-bounded by construction (<= one row per retraction): collect
    dirty_vals = set()
    has_null_dirty = False
    for batch in dirty_rows.iter_batches(batch_size=None,
                                         batch_format="pyarrow"):
        col = batch[group_col]
        has_null_dirty |= col.null_count > 0
        dirty_vals.update(pc.drop_null(col).to_pylist())

    # build the membership value_set ONCE (it is closure-shipped to every
    # task; rebuilding the Arrow array per batch is O(|dirty|) Python work
    # inside map_batches over the whole live lake)
    dirty_arr = pa.array(sorted(dirty_vals), gtype) if dirty_vals else \
        pa.array([], gtype)

    def is_dirty_mask(groups: pa.ChunkedArray):
        m = pc.is_in(groups, value_set=dirty_arr)
        if has_null_dirty:
            m = pc.or_(m, pc.is_null(groups))
        return pc.fill_null(m, False)

    # -- 3. fold prior + delta (additions can only extend extremes), drop
    # dead groups, and splice in the exact recompute of the dirty ones.
    names = target.names
    folded = grouped_aggregate(
        prior_view.select_columns(names).union(delta.select_columns(names)),
        [group_col],
        mins={o: o for o, (_, k) in extremes.items() if k == "min"},
        maxs={o: o for o, (_, k) in extremes.items() if k == "max"},
        sums={count_name: count_name},
        exchange="partition", num_partitions=num_partitions)
    folded = folded.map_batches(
        lambda t: target.empty_table()
        if t.num_rows == 0 and group_col not in t.column_names
        else (t.select(names).cast(target)
              .filter(pc.not_equal(t[count_name], 0))),
        batch_format="pyarrow")

    if not dirty_vals and not has_null_dirty:
        return folded

    folded = folded.map_batches(
        lambda t: t if t.num_rows == 0
        else t.filter(pc.invert(is_dirty_mask(t[group_col]))),
        batch_format="pyarrow")
    live = read_lake(lake_dir, as_of_version=to_version,
                     as_of_epoch=to_epoch,
                     columns=sorted({group_col,
                                     *{c for c, _ in extremes.values()}}))
    dirty_live = live.map_batches(
        lambda t: t if t.num_rows == 0
        else t.filter(is_dirty_mask(t[group_col])),
        batch_format="pyarrow")
    recomputed = extreme_view(dirty_live, group_col, extremes,
                              count_name=count_name,
                              num_partitions=num_partitions)
    return folded.union(recomputed.select_columns(names))


def maintain_count_view(
    lake_dir: str,
    group_col: str,
    *,
    sums: Optional[dict[str, str]] = None,
    count_name: str = _COUNT,
    prior_view: Optional[ray.data.Dataset] = None,
    from_version: Optional[int] = None,
    from_epoch: Optional[int] = None,
    to_version: Optional[int] = None,
    to_epoch: Optional[int] = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Maintain the grouped count/sum view of the lake incrementally from
    ``from_*`` to ``to_*`` (defaults: head). ``prior_view`` is the view at
    the ``from_*`` state; when omitted it is bootstrapped there with one
    full recompute (`count_view` over the as-of read) — every later hop can
    pass the maintained view back in and pay only for the churn."""
    from raycdc.cdc.apply import lake_changes, read_lake

    sums = _sum_specs(sums, group_col, count_name)
    if prior_view is None:
        prior_view = count_view(
            read_lake(lake_dir, as_of_version=from_version,
                      as_of_epoch=from_epoch),
            group_col, sums=sums, count_name=count_name,
            num_partitions=num_partitions)
    compare = sorted({group_col, *sums.values()})
    feed = lake_changes(lake_dir,
                        from_version=from_version, from_epoch=from_epoch,
                        to_version=to_version, to_epoch=to_epoch,
                        compare_cols=compare, include_old=True,
                        num_partitions=num_partitions)
    delta = view_delta(feed, group_col, sums=sums, count_name=count_name,
                       num_partitions=num_partitions)
    return merge_view(prior_view, delta, group_col,
                      value_cols=list(sums), count_name=count_name,
                      num_partitions=num_partitions)
