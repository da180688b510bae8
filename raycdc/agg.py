"""Two-stage grouped aggregation: per-batch partial combine, then a small
global shuffle.

A bare ``groupby(key).aggregate(...)`` shuffles every input row. This helper
pre-aggregates inside ``map_batches`` (one partial row per key per batch —
vectorized pandas groupby), so the all-to-all exchange moves only
``num_keys x num_batches`` rows. Supported aggregates: sum, count, min, max,
mean (mean = sum/count finalized after the global combine), all mergeable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min, Sum

# masked-dtype conversion for every pandas hop whose output schema or row
# hash must not depend on whether THIS batch happened to contain nulls
# (plain to_pandas flips nullable int64 -> float64): see shuffle.stable_hash
from raycdc.shuffle import stable_types_mapper as _stm

# ROLLUP/CUBE compute coarser grouping sets on the DRIVER from the finest
# level; cap that materialization so a pathological high-cardinality key
# fails loudly instead of OOMing the driver silently.
_GROUPING_SETS_MAX_ROWS = 2_000_000


def _restore_key_types(out: pa.Table, ref: pa.Schema,
                       keys: list[str]) -> pa.Table:
    """Pin grouping-key columns back to their input Arrow types after a
    pandas hop: a batch whose string key is ALL null round-trips through
    `groupby(...).reset_index()` as float64 NaN → null, silently changing
    that block's schema and breaking unification with sibling blocks."""
    for k in keys:
        want = ref.field(k).type
        i = out.column_names.index(k)
        if out.schema.field(k).type != want:
            out = out.set_column(i, pa.field(k, want), out[k].cast(want))
    return out


def distinct_rows(ds: ray.data.Dataset, subset: list[str],
                  num_partitions: int = 32) -> ray.data.Dataset:
    """Global DISTINCT on ``subset``: per-batch local dedup (combiner) then a
    key-hash partition-only exchange (no sort) with one vectorized
    drop_duplicates per bucket."""
    from raycdc.shuffle import partition_map

    b = "__rcdc_du"

    def local(t: pa.Table) -> pa.Table:
        # masked-dtype conversion: the routing hash must be identical for
        # a key whether or not its batch happens to contain nulls
        df = t.to_pandas(types_mapper=_stm).drop_duplicates(subset=subset)
        h = pd.util.hash_pandas_object(df[subset], index=False).to_numpy()
        df[b] = (h % num_partitions).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_dedup(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm).drop_duplicates(subset=subset)
        return pa.Table.from_pandas(df, preserve_index=False)

    from raycdc.shuffle import lazy_schema

    return partition_map(ds.map_batches(local, batch_format="pyarrow"),
                         b, num_partitions, bucket_dedup,
                         empty_schema=lazy_schema(ds))


def grouped_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,   # out_name -> col
    means: dict[str, str] | None = None,  # out_name -> col
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    count_name: str | None = None,
    salt: int = 0,
    exchange: str = "sort",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Grouped sum/mean/min/max/count with partial pre-aggregation.

    ``salt > 0`` adds an intermediate salted reduction: partial rows first
    combine under ``(keys, row_index % salt)`` so a hot key's partials spread
    over ``salt`` reducers before the final (now tiny) per-key combine — the
    classic hot-key salting pattern (SURVEY.md §4 skew row). All supported
    aggregates are mergeable, so salting never changes results.

    ``exchange`` picks the final combine's shuffle: ``"sort"`` (Ray's
    sort-based groupby — fine when the partial pre-agg shrank the data) or
    ``"partition"`` (the engine's partition-only exchange + one vectorized
    pandas combine per bucket). Choose ``"partition"`` when keys are
    NEARLY UNIQUE per row — the pre-agg then shrinks nothing and the sort
    shuffle pays sample+sort+barrier over essentially the whole input for
    an ordering nobody needs.
    """
    sums = dict(sums or {})
    means = dict(means or {})
    mins = dict(mins or {})
    maxs = dict(maxs or {})
    # means need their sum and their NON-NULL count (SQL AVG =
    # sum / count(col), never sum / count(*): one null row must not
    # deflate the mean)
    mean_sum_cols = {f"__msum_{out}": col for out, col in means.items()}
    mean_cnt_cols = {f"__mcnt_{out}": col for out, col in means.items()}
    need_count = count_name is not None
    cnt_col = "__cnt"

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm)
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for out, col in sums.items():
            # min_count=1: SQL SUM over an all-null group is NULL, not 0;
            # the null partial survives the merge (Ray Sum skips nulls and
            # returns null only when every partial is null)
            parts[out] = g[col].sum(min_count=1)
        for tmp, col in mean_sum_cols.items():
            parts[tmp] = g[col].sum(min_count=1)
        for tmp, col in mean_cnt_cols.items():
            parts[tmp] = g[col].count()
        for out, col in mins.items():
            parts[out] = g[col].min()
        for out, col in maxs.items():
            parts[out] = g[col].max()
        if need_count:
            parts[cnt_col] = g.size()
        out_df = pd.DataFrame(parts).reset_index()
        return _restore_key_types(
            pa.Table.from_pandas(out_df, preserve_index=False),
            t.schema, keys)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def make_aggs():
        aggs = []
        for out in sums:
            aggs.append(Sum(out, alias_name=out))
        for tmp in mean_sum_cols:
            aggs.append(Sum(tmp, alias_name=tmp))
        for tmp in mean_cnt_cols:
            aggs.append(Sum(tmp, alias_name=tmp))
        for out in mins:
            aggs.append(Min(out, alias_name=out))
        for out in maxs:
            aggs.append(Max(out, alias_name=out))
        if need_count:
            aggs.append(Sum(cnt_col, alias_name=cnt_col))
        return aggs

    if salt > 0:
        salt_col = "__rcdc_salt"

        def add_salt(t: pa.Table) -> pa.Table:
            import numpy as np

            return t.append_column(
                salt_col,
                pa.array(np.arange(t.num_rows, dtype=np.int64) % salt))

        salted = (partials.map_batches(add_salt, batch_format="pyarrow")
                  .groupby(keys + [salt_col]).aggregate(*make_aggs()))
        partials = salted.map_batches(
            lambda t: t.drop_columns([salt_col]), batch_format="pyarrow")
    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for out in means:
            tmp, tcnt = f"__msum_{out}", f"__mcnt_{out}"
            den = pc.cast(t[tcnt], pa.float64())
            avg = pc.if_else(
                pc.equal(den, 0.0), pa.scalar(None, pa.float64()),
                pc.divide(pc.cast(t[tmp], pa.float64()),
                          pc.max_element_wise(den, pa.scalar(1.0))))
            t = t.append_column(out, avg)
        drop = list(mean_sum_cols) + list(mean_cnt_cols)
        if count_name is not None:
            t = t.append_column(count_name, pc.cast(t[cnt_col], pa.int64()))
        if need_count:
            drop.append(cnt_col)
        return t.drop_columns(drop)

    if exchange == "partition":
        from raycdc.ops.ordered import _hash_bucket
        from raycdc.shuffle import lazy_schema, partition_map

        bcol = "__rcdc_gab"

        def add_bucket(t: pa.Table) -> pa.Table:
            return _hash_bucket(t, keys, bcol, num_partitions)

        def bucket_combine(t: pa.Table) -> pa.Table:
            # merge + FINALIZE inside the partition task (the
            # grouped_stats_with_distinct rule): Ray 2.49 map stages skip
            # zero-row blocks, so a post-exchange finalize would drop the
            # all-empty fallback and the result would lose its schema
            df = t.to_pandas(types_mapper=_stm)
            g = df.groupby(keys, sort=False, dropna=False)
            parts = {}
            for out in sums:
                parts[out] = g[out].sum(min_count=1)
            for tmp in mean_sum_cols:
                parts[tmp] = g[tmp].sum(min_count=1)
            for tmp in mean_cnt_cols:
                parts[tmp] = g[tmp].sum()
            for out in mins:
                parts[out] = g[out].min()
            for out in maxs:
                parts[out] = g[out].max()
            if need_count:
                parts[cnt_col] = g[cnt_col].sum()
            merged = _restore_key_types(
                pa.Table.from_pandas(pd.DataFrame(parts).reset_index(),
                                     preserve_index=False),
                t.schema, keys)
            return finalize(merged)

        lazy_partials = lazy_schema(partials)

        def final_empty_schema():
            # all-empty corner: the fallback must carry the FINAL shape —
            # partial types when any block had a schema, else input-plan
            # types (pandas widens integer sums to int64; fully schema-less
            # upstream stays None, the documented degrade)
            base = lazy_partials()
            if base is None:
                s = ds.schema(fetch_if_missing=False) or ds.schema()
                if s is None:
                    return None
                in_schema = pa.schema([pa.field(n, t) for n, t in
                                       zip(s.names, s.types)])

                def agg_type(col, summed):
                    ft = in_schema.field(col).type
                    if summed and pa.types.is_integer(ft):
                        return pa.int64()
                    return ft

                fields = [in_schema.field(k) for k in keys]
                fields += [pa.field(o, agg_type(c, True))
                           for o, c in sums.items()]
                fields += [pa.field(o, agg_type(c, False))
                           for o, c in mins.items()]
                fields += [pa.field(o, agg_type(c, False))
                           for o, c in maxs.items()]
            else:
                fields = [base.field(k) for k in keys]
                fields += [base.field(o) for o in
                           list(sums) + list(mins) + list(maxs)]
            fields += [pa.field(o, pa.float64()) for o in means]
            if count_name is not None:
                fields.append(pa.field(count_name, pa.int64()))
            return pa.schema(fields)

        bucketed = partials.map_batches(add_bucket, batch_format="pyarrow",
                                        batch_size=None)
        return partition_map(bucketed, bcol, num_partitions,
                             bucket_combine,
                             empty_schema=final_empty_schema)

    # sort path: an all-empty input degrades to a schema-less zero-block
    # result (Ray's groupby emits no blocks and the finalize map has
    # nothing to carry a pin through) — callers whose input can be empty
    # at runtime should pass exchange="partition"
    merged = partials.groupby(keys).aggregate(*make_aggs())
    return merged.map_batches(finalize, batch_format="pyarrow")


def top_k(
    ds: ray.data.Dataset,
    sort_cols: list[str],
    k: int,
    *,
    descending: bool | list[bool] = True,
) -> ray.data.Dataset:
    """Distributed top-k under a total order: every block keeps its local
    top-k (vectorized sort + head), then one tiny final reduce merges the
    ≤ k·num_blocks survivors — no global sort, no all-to-all. Include a
    unique id in ``sort_cols`` for a deterministic result under ties.
    """
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    ascending = [not d for d in descending]

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm).sort_values(sort_cols, ascending=ascending,
                                       kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    from raycdc.shuffle import tree_reduce

    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          batch_size=None)
    # top-k of top-ks is associative under the total order, so the ≤ k-row
    # survivors merge through the fan-in tree and the driver fetches ONE
    # ≤ k-row table (was a blocks × k driver concat)
    final = tree_reduce(cand, local_topk)
    if final is None:
        return cand
    return ray.data.from_arrow(final)


def _grouping_sets(
    ds: ray.data.Dataset,
    keys: list[str],
    subsets: list[list[str]],
    sums: dict[str, str],
    mins: dict[str, str],
    maxs: dict[str, str],
    count_name: str | None,
) -> ray.data.Dataset:
    """Shared machinery for ROLLUP / CUBE: aggregate the raw data ONCE at
    the finest level (full distributed partial-combine pipeline of
    :func:`grouped_aggregate`), then compute every coarser grouping set
    from that result LOCALLY on the driver — the finest level is only
    ``num_groups`` rows (bounded by key-combination cardinality, which must
    be smallish for a rollup/cube to be meaningful), and sums of sums /
    min of mins / max of maxs / sum of counts are all mergeable. One real
    shuffle total; no per-level Ray barriers. Grouped-out key columns are
    emitted as typed nulls (SQL convention)."""
    import pyarrow.compute as pc

    cnt = "__gs_cnt" if count_name is None else count_name
    canonical = list(keys) + list(sums) + list(mins) + list(maxs) + [cnt]

    finest = grouped_aggregate(ds, keys, sums=sums, mins=mins, maxs=maxs,
                               count_name=cnt)
    tabs = list(finest.iter_batches(batch_format="pyarrow",
                                    batch_size=None))
    schema_map: dict = {}
    try:
        s = ds.schema()
        schema_map = dict(zip(s.names, s.types))
    except AttributeError:
        pass
    def _sum_type(col):
        # mirror grouped_aggregate's agg_type: integer sums widen to int64
        # (pandas/Ray Sum behavior); float sums keep their input type —
        # an unconditional int64 would give the empty fallback a different
        # schema than any non-empty run
        ft = schema_map.get(col)
        if ft is None or pa.types.is_integer(ft):
            return pa.int64()
        return ft

    agg_fields = ([(out, _sum_type(col)) for out, col in sums.items()]
                  + [(out, schema_map.get(col, pa.int64()))
                     for out, col in mins.items()]
                  + [(out, schema_map.get(col, pa.int64()))
                     for out, col in maxs.items()])
    if tabs:
        base = pa.concat_tables(tabs, promote_options="default")
        base = base.select(canonical)
    else:
        base = pa.schema(
            [(k, schema_map.get(k, pa.string())) for k in keys]
            + agg_fields + [(cnt, pa.int64())]).empty_table()

    if base.num_rows > _GROUPING_SETS_MAX_ROWS:
        raise ValueError(
            f"rollup/cube finest grouping level has {base.num_rows} rows "
            f"(> {_GROUPING_SETS_MAX_ROWS}): the coarser grouping sets are "
            "computed on the driver from the finest level, which is only "
            "sound for smallish key-combination cardinalities. Use "
            "grouped_aggregate per grouping set (one distributed shuffle "
            "each) for high-cardinality keys.")
    levels = [base]
    # masked-dtype conversion: a null in a nullable-int key or min/max
    # column would flip a plain to_pandas to float64, silently corrupting
    # values past 2^53 and making the cast back to int64 raise on
    # non-integral floats; masked Int64 round-trips exactly.
    df = base.to_pandas(types_mapper=_stm)
    for kept in subsets:
        dropped = [k for k in keys if k not in kept]
        if kept:
            g = df.groupby(kept, sort=False, dropna=False)
            parts = {out: g[out].sum() for out in sums}
            for out in mins:
                parts[out] = g[out].min()
            for out in maxs:
                parts[out] = g[out].max()
            parts[cnt] = g[cnt].sum()
            lvl_df = pd.DataFrame(parts).reset_index()
            lvl = pa.Table.from_pandas(lvl_df, preserve_index=False)
            # pandas groupby can widen/narrow dtypes; realign to base types
            for name in kept + list(sums) + list(mins) + list(maxs) + [cnt]:
                want = base.schema.field(name).type
                i = lvl.column_names.index(name)
                if lvl.schema.field(name).type != want:
                    lvl = lvl.set_column(i, name, lvl[name].cast(want))
        else:
            cols = {}
            for out in sums:
                cols[out] = pa.array(
                    [pc.sum(base[out]).as_py() if base.num_rows else None],
                    base.schema.field(out).type)
            for out in mins:
                cols[out] = pa.array(
                    [pc.min(base[out]).as_py() if base.num_rows else None],
                    base.schema.field(out).type)
            for out in maxs:
                cols[out] = pa.array(
                    [pc.max(base[out]).as_py() if base.num_rows else None],
                    base.schema.field(out).type)
            cols[cnt] = pa.array(
                [int(pc.sum(base[cnt]).as_py() or 0) if base.num_rows
                 else 0], pa.int64())
            lvl = pa.table(cols)
        for k in dropped:
            lvl = lvl.append_column(
                k, pa.nulls(lvl.num_rows, base.schema.field(k).type))
        levels.append(lvl.select(canonical))
    out = pa.concat_tables(levels, promote_options="default")
    if count_name is None:
        out = out.drop_columns([cnt])
    return ray.data.from_arrow(out)


def rollup_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    count_name: str | None = "n",
) -> ray.data.Dataset:
    """``GROUP BY ROLLUP(keys...)``: one aggregate row per prefix of the
    key list, grouped-out key columns null (SQL rollup convention). See
    :func:`_grouping_sets` for the scale shape (one distributed shuffle at
    the finest level; prefixes computed locally from its tiny result).
    Means are intentionally unsupported (not re-aggregatable without
    carrying sum+count; compute them from sums/counts downstream)."""
    prefixes = [keys[:d] for d in range(len(keys) - 1, -1, -1)]
    return _grouping_sets(ds, keys, prefixes, dict(sums or {}),
                          dict(mins or {}), dict(maxs or {}), count_name)


def cube_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    count_name: str | None = "n",
) -> ray.data.Dataset:
    """``GROUP BY CUBE(keys...)``: one aggregate row per SUBSET of the key
    list (2^k grouping sets), grouped-out key columns null. Same scale
    shape as :func:`rollup_aggregate` — one distributed shuffle, all other
    sets computed locally from the finest level's ``num_groups`` rows."""
    import itertools

    subsets = [list(c) for r in range(len(keys) - 1, -1, -1)
               for c in itertools.combinations(keys, r)]
    return _grouping_sets(ds, keys, subsets, dict(sums or {}),
                          dict(mins or {}), dict(maxs or {}), count_name)


def hash_sample(ds: ray.data.Dataset, id_col: str, frac: float,
                *, mult: int = 2654435761) -> ray.data.Dataset:
    """Deterministic hash sampling: keep rows where
    ``(id * mult) mod 2^32 < frac * 2^32`` (Knuth multiplicative hash).

    Unlike ``Dataset.random_sample`` this is reproducible across runs,
    parallelism levels and engines — the same predicate is expressible in
    ANSI SQL (``(id * 2654435761) % 4294967296 < floor(frac * 4294967296)``),
    which is what makes the sample itself oracle-checkable. Stateless
    per-batch filter: no shuffle, no driver participation, streams at full
    read speed.
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    cut = int(frac * 4294967296)

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # Null ids are dropped first, matching the SQL oracle (a NULL id
        # makes the WHERE predicate NULL → row filtered out). Filtering on
        # Arrow also keeps to_numpy from flipping an int64 column with
        # nulls to float64+NaN, whose min()<0 guard is silently false and
        # whose uint64 cast is undefined garbage.
        valid = pc.is_valid(t[id_col])
        if t.num_rows and not pc.all(valid).as_py():
            t = t.filter(valid)
        raw = t[id_col].to_numpy(zero_copy_only=False)
        if len(raw) and (raw.min() < 0 or
                         (raw.dtype.kind == "f" and np.isnan(raw).any())):
            # SQL % keeps the dividend's sign while numpy wraps through
            # uint64 — the documented SQL-equivalence only holds for
            # non-negative ids, so reject rather than silently diverge
            raise ValueError(
                f"hash_sample requires non-negative ids in {id_col!r}")
        ids = raw.astype(np.uint64)
        h = (ids * np.uint64(mult)) & np.uint64(0xFFFFFFFF)
        return t.filter(pa.array(h < np.uint64(cut)))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sample(ds: ray.data.Dataset, strata_col: str, id_col: str,
                   rates: "dict[str, float]", *, default_rate: float = 0.0,
                   mult: int = 2654435761) -> ray.data.Dataset:
    """Deterministic per-stratum RATE sampling — the dataset-mixing
    primitive (upsample books, downsample web, drop the rest) for
    training-corpus composition. Keeps a row when
    ``knuth_hash(id) < rate(stratum) * 2^32``; strata without an explicit
    rate use ``default_rate``. Same reproducible-everywhere hash contract
    as :func:`hash_sample` (the SQL equivalent is the identical predicate
    with a ``CASE stratum`` cut), same null-id drop, same non-negative-id
    guard. Stateless per-batch filter: no shuffle, streams at read speed;
    the rate table is tiny closure state resolved against each batch's
    dictionary-encoded strata (one Python lookup per DISTINCT stratum per
    batch, not per row)."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    cuts = {k: np.uint64(int(r * 4294967296)) for k, r in rates.items()}
    default_cut = np.uint64(int(default_rate * 4294967296))

    def keep(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t[id_col])
        if t.num_rows and not pc.all(valid).as_py():
            t = t.filter(valid)  # NULL id ⇒ NULL predicate ⇒ dropped (SQL)
        raw = t[id_col].to_numpy(zero_copy_only=False)
        if len(raw) and (raw.min() < 0 or
                         (raw.dtype.kind == "f" and np.isnan(raw).any())):
            raise ValueError(
                f"mixture_sample requires non-negative ids in {id_col!r}")
        h = (raw.astype(np.uint64) * np.uint64(mult)) \
            & np.uint64(0xFFFFFFFF)
        strata = t[strata_col]
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        enc = pc.dictionary_encode(strata)
        dict_cuts = np.array(
            [cuts.get(v.as_py(), default_cut) for v in enc.dictionary],
            dtype=np.uint64)
        # null stratum: CASE NULL falls to ELSE in SQL ⇒ default rate
        idx = pc.fill_null(pc.cast(enc.indices, pa.int64()),
                           len(dict_cuts)).to_numpy(zero_copy_only=False)
        per_row_cut = np.append(dict_cuts, default_cut)[idx]
        return t.filter(pa.array(h < per_row_cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, key_col: str, id_col: str,
                      n: int, *, mult: int = 2654435761,
                      num_partitions: int = 32) -> ray.data.Dataset:
    """Deterministic stratified sample: every group keeps (up to) the ``n``
    rows with the smallest ``(knuth_hash(id), id)`` — i.e. a per-group
    uniform-ish sample that is reproducible across runs, parallelism levels
    and engines. ANSI-SQL equivalent::

        QUALIFY row_number() OVER (
            PARTITION BY key
            ORDER BY (id * 2654435761) % 4294967296, id) <= n

    Scale shape: one partition-only exchange on hash(key), then one
    vectorized lexsort pass per bucket (no per-group Python calls). A
    single group's rows must fit in one partition task — the same
    assumption as every keyed operator here.
    """
    from raycdc.ops.ordered import _hash_bucket, _key_codes
    from raycdc.shuffle import lazy_schema, partition_map

    import numpy as np

    bcol = "__rcdc_ss"

    def bucket_sample(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        codes, _ = _key_codes(t, key_col)
        if t.num_rows and t[id_col].null_count:
            # A null id would reach to_numpy as float64 NaN, whose min()<0
            # guard is silently false and whose uint64 cast is garbage —
            # reject loudly (the SQL QUALIFY oracle orders nulls
            # engine-specifically, so there is no silent-match choice).
            raise ValueError(
                f"stratified_sample requires non-null ids in {id_col!r}")
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or
                         (ids.dtype.kind == "f" and np.isnan(ids).any())):
            raise ValueError(
                f"stratified_sample requires non-negative ids in {id_col!r}"
                " (SQL % sign semantics diverge for negatives)")
        h = (ids.astype(np.uint64) * np.uint64(mult)) & np.uint64(0xFFFFFFFF)
        order = np.lexsort((ids, h, codes))
        c = codes[order]
        m = len(c)
        new = np.empty(m, dtype=bool)
        if m:
            new[0] = True
            new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, m))
        rn = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
        keep = order[rn < n]
        keep.sort()  # preserve input order within the bucket
        return t.take(pa.array(keep))

    bucketed = ds.map_batches(
        lambda t: _hash_bucket(t, key_col, bcol, num_partitions),
        batch_format="pyarrow", batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_sample,
                         empty_schema=lazy_schema(ds))


def pivot_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    pivot_col: str,
    pivot_values: list,
    *,
    sums: dict[str, str] | None = None,
    count_prefix: str | None = None,
) -> ray.data.Dataset:
    """PIVOT as conditional aggregation: for every pivot value ``v`` emit
    ``<out>_<v>`` columns (``sums``) and ``<count_prefix>_<v>`` counts.
    Semantics match SQL ``SUM(CASE WHEN p = v THEN x ELSE 0 END)`` /
    ``COUNT(*) FILTER (WHERE p = v)`` — rows whose pivot value is not in
    ``pivot_values`` contribute zeros.

    ``pivot_values`` is explicit (not discovered) so the output schema is
    deterministic and the whole thing stays ONE streaming pass over the
    data: the conditional columns are added in the same map_batches that
    does the partial pre-aggregation — no discovery pass, no extra
    shuffle beyond :func:`grouped_aggregate`'s tiny partial exchange.
    """
    import pyarrow.compute as pc

    sums = dict(sums or {})

    def widen(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for v in pivot_values:
            mask = pc.fill_null(pc.equal(t[pivot_col], v), False)
            for out, col in sums.items():
                src = pc.fill_null(t[col], 0)
                cols[f"{out}_{v}"] = pc.if_else(
                    mask, src, pa.scalar(0, src.type))
            if count_prefix is not None:
                cols[f"{count_prefix}_{v}"] = pc.cast(mask, pa.int64())
        return pa.table(cols)

    out_sums = {}
    for v in pivot_values:
        for out in sums:
            out_sums[f"{out}_{v}"] = f"{out}_{v}"
        if count_prefix is not None:
            out_sums[f"{count_prefix}_{v}"] = f"{count_prefix}_{v}"
    widened = ds.map_batches(widen, batch_format="pyarrow")
    return grouped_aggregate(widened, keys, sums=out_sums, count_name=None)



def _set_op(left: ray.data.Dataset, right: ray.data.Dataset, keep_present:
            bool, num_partitions: int) -> ray.data.Dataset:
    """Shared EXCEPT/INTERSECT machinery (SQL set semantics: DISTINCT
    output). Both sides are tagged, unioned, and co-located with ONE
    partition-only exchange on the row hash; each bucket then runs one
    vectorized pass (dedup left, membership test against right). Only
    distinct-per-batch rows transit the shuffle (local combiner)."""
    from raycdc.shuffle import lazy_schema, partition_map

    b, src = "__rcdc_so", "__rcdc_src"

    def tag(flag: int):
        def fn(t: pa.Table) -> pa.Table:
            # masked dtypes: a row must route identically from either side
            # and any batch, nulls present or not
            df = t.to_pandas(types_mapper=_stm).drop_duplicates()
            h = pd.util.hash_pandas_object(df, index=False).to_numpy()
            df[src] = np.int64(flag)
            df[b] = (h % num_partitions).astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    import numpy as np

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def bucket_setop(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm)
        cols = [c for c in df.columns if c != src]
        l = df[df[src] == 0][cols].drop_duplicates()
        r = df[df[src] == 1][cols].drop_duplicates()
        key_l = pd.util.hash_pandas_object(l, index=False)
        key_r = set(pd.util.hash_pandas_object(r, index=False))
        mask = key_l.isin(key_r).to_numpy()
        out = l[mask] if keep_present else l[~mask]
        return pa.Table.from_pandas(out, preserve_index=False)

    return partition_map(tagged, b, num_partitions, bucket_setop,
                         empty_schema=lazy_schema(left))


def except_rows(left: ray.data.Dataset, right: ray.data.Dataset, *,
                num_partitions: int = 32) -> ray.data.Dataset:
    """SQL ``EXCEPT``: distinct rows of ``left`` not present in ``right``
    (schemas must match; project both sides first). Membership is tested
    on the 64-bit row hash within each co-located bucket — identical rows
    always share a bucket, so the result is exact up to hash collisions
    within one bucket's rows (same guard level as exact_dedup's keyed
    shuffle; the full row is available in-bucket if a collision-proof
    variant is ever needed)."""
    return _set_op(left, right, keep_present=False,
                   num_partitions=num_partitions)


def intersect_rows(left: ray.data.Dataset, right: ray.data.Dataset, *,
                   num_partitions: int = 32) -> ray.data.Dataset:
    """SQL ``INTERSECT``: distinct rows of ``left`` also present in
    ``right``. See :func:`except_rows` for the mechanism."""
    return _set_op(left, right, keep_present=True,
                   num_partitions=num_partitions)


def unpivot(
    ds: ray.data.Dataset,
    keys: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """UNPIVOT/melt: wide value columns → (keys, variable, value) rows.
    Stateless per-batch transform (k stacked zero-copy column selects per
    batch, no row loops, no shuffle); value columns are cast to their
    common Arrow type."""
    import pyarrow.compute as pc  # noqa: F401

    def melt(t: pa.Table) -> pa.Table:
        target = pa.unify_schemas(
            [pa.schema([(value_name, t.schema.field(c).type)])
             for c in value_cols],
            promote_options="permissive").field(value_name).type
        parts = []
        for c in value_cols:
            part = t.select(keys)
            part = part.append_column(
                var_name, pa.array([c] * t.num_rows, pa.string()))
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts.append(part.append_column(value_name, col.cast(target)))
        return pa.concat_tables(parts, promote_options="default")

    return ds.map_batches(melt, batch_format="pyarrow")


def grouped_count_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    *,
    name: str = "nd",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact ``count(DISTINCT col)`` per group: global DISTINCT on
    ``keys + [col]`` (per-batch local dedup combiner, then the
    partition-only exchange) followed by a tiny grouped sum of a
    non-null indicator. Two exchanges, both over already-deduplicated
    rows. SQL semantics: null values are not counted, but a group whose
    values are ALL null still appears with count 0 (the null row
    survives the distinct and contributes a zero)."""
    import pyarrow.compute as pc

    cols = list(dict.fromkeys(keys + [col]))
    pruned = ds.map_batches(lambda t: t.select(cols),
                            batch_format="pyarrow")
    d = distinct_rows(pruned, cols, num_partitions=num_partitions)
    ind = "__rcdc_cdv"

    def add_indicator(t: pa.Table) -> pa.Table:
        return t.append_column(
            ind, pc.cast(pc.is_valid(t[col]), pa.int64()))

    counted = grouped_aggregate(
        d.map_batches(add_indicator, batch_format="pyarrow"),
        keys, sums={name: ind})
    return counted


def grouped_stats_with_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    distinct_col: str,
    *,
    distinct_name: str = "nd",
    sums: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    count_name: str | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Grouped sum/min/max/count PLUS exact ``count(DISTINCT distinct_col)``
    in ONE partition-only exchange and one input scan.

    The per-batch partial groups at ``keys + [distinct_col]`` granularity —
    the finest level at which every requested aggregate is still mergeable —
    so the exchange ships one row per distinct (keys, value) pair per batch
    instead of one per input row, and the whole job needs neither the second
    scan nor the key join of the ``grouped_aggregate`` +
    ``grouped_count_distinct`` composition (measured: the sf0.1 host_stats
    WAL roll-up reads the 2M-event log once instead of twice).

    SQL count-distinct semantics: null values are not counted, but a group
    whose values are ALL null still appears with count 0.
    """
    sums = dict(sums or {})
    mins = dict(mins or {})
    maxs = dict(maxs or {})
    cnt_col = "__cnt"
    need_count = count_name is not None
    pkeys = list(dict.fromkeys(keys + [distinct_col]))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm)
        g = df.groupby(pkeys, sort=False, dropna=False)
        parts = {}
        for out, col in sums.items():
            parts[out] = g[col].sum()
        for out, col in mins.items():
            parts[out] = g[col].min()
        for out, col in maxs.items():
            parts[out] = g[col].max()
        parts[cnt_col] = g.size()
        out_df = pd.DataFrame(parts).reset_index()
        return _restore_key_types(
            pa.Table.from_pandas(out_df, preserve_index=False),
            t.schema, pkeys)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from raycdc.ops.ordered import _hash_bucket
    from raycdc.shuffle import lazy_schema, partition_map

    bcol = "__rcdc_gsd"

    def add_bucket(t: pa.Table) -> pa.Table:
        # route on the GROUP keys only: every (key, value) pair of one key
        # lands in one bucket, which is what the distinct count needs
        return _hash_bucket(t, keys, bcol, num_partitions)

    def bucket_combine(t: pa.Table) -> pa.Table:
        # merge + FINALIZE in the partition task: Ray 2.49 map stages skip
        # zero-row blocks entirely, so a post-exchange map_batches could
        # never reshape the all-empty fallback — the exchange output must
        # already be final-shaped
        df = t.to_pandas(types_mapper=_stm)
        # merge partials of the same (keys, value) pair across batches,
        # then collapse values to groups
        gp = df.groupby(pkeys, sort=False, dropna=False)
        merged = {}
        for out in sums:
            merged[out] = gp[out].sum()
        for out in mins:
            merged[out] = gp[out].min()
        for out in maxs:
            merged[out] = gp[out].max()
        merged[cnt_col] = gp[cnt_col].sum()
        mdf = pd.DataFrame(merged).reset_index()
        g = mdf.groupby(keys, sort=False, dropna=False)
        parts = {}
        for out in sums:
            parts[out] = g[out].sum()
        for out in mins:
            parts[out] = g[out].min()
        for out in maxs:
            parts[out] = g[out].max()
        # non-null distinct (SQL COUNT(DISTINCT) semantics)
        parts[distinct_name] = g[distinct_col].count().astype("int64")
        if need_count:
            parts[count_name] = g[cnt_col].sum().astype("int64")
        out_df = pd.DataFrame(parts).reset_index()
        return _restore_key_types(
            pa.Table.from_pandas(out_df, preserve_index=False),
            t.schema, keys)

    # All-empty corner: the fallback must carry the FINAL schema (a later
    # reshape stage is impossible — zero-row blocks are skipped by map
    # stages). Key/agg types come from the partials schema when any block
    # survived with one, else from the input plan's schema; a fully-empty
    # MAPPED pipeline may know neither (documented schema-less degrade).
    lazy_partials = lazy_schema(partials)

    def empty_fallback_schema():
        base = lazy_partials()
        if base is None:
            s = ds.schema(fetch_if_missing=False) or ds.schema()
            if s is None:
                return None
            in_schema = pa.schema([pa.field(n, t) for n, t in
                                   zip(s.names, s.types)])

            def agg_type(col, summed):
                # pandas widens integer sums to int64; floats keep width
                ft = in_schema.field(col).type
                if summed and pa.types.is_integer(ft):
                    return pa.int64()
                return ft

            fields = [in_schema.field(k) for k in keys]
            fields += [pa.field(o, agg_type(c, True))
                       for o, c in sums.items()]
            fields += [pa.field(o, agg_type(c, False))
                       for o, c in mins.items()]
            fields += [pa.field(o, agg_type(c, False))
                       for o, c in maxs.items()]
        else:
            fields = [base.field(k) for k in keys]
            fields += [base.field(o) for o in
                       list(sums) + list(mins) + list(maxs)]
        fields.append(pa.field(distinct_name, pa.int64()))
        if need_count:
            fields.append(pa.field(count_name, pa.int64()))
        return pa.schema(fields)

    bucketed = partials.map_batches(add_bucket, batch_format="pyarrow",
                                    batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_combine,
                         empty_schema=empty_fallback_schema)


def grouped_mode(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    *,
    name: str = "mode",
    count_name: str = "mode_n",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Most frequent non-null value of ``col`` per group; ties break to the
    SMALLEST value so the winner is deterministic (SQL ``mode()`` leaves
    ties unspecified — the oracle must use the same ``row_number() OVER
    (ORDER BY c DESC, val ASC)`` tiebreak).

    Two stages, both bounded: exact counts per ``(keys, col)`` via
    :func:`grouped_aggregate` (the partial pre-agg means the exchange moves
    at most ``distinct(keys, col) x num_batches`` rows, never the input),
    then a tiny keyed exchange over the count table picking the
    max-count/min-value winner per group. Groups whose values are all null
    are absent from the output (SQL: ``WHERE col IS NOT NULL`` pre-filter).
    """
    import pyarrow.compute as pc

    from raycdc.ops.ordered import _hash_bucket
    from raycdc.shuffle import lazy_schema, partition_map

    cols = list(dict.fromkeys(keys + [col]))
    cnt = "__rcdc_gmc"

    def prune(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        return t.filter(pc.is_valid(t[col]))

    counted = grouped_aggregate(
        ds.map_batches(prune, batch_format="pyarrow"), cols, count_name=cnt)

    b = "__rcdc_gmb"

    def add_bucket(t: pa.Table) -> pa.Table:
        return _hash_bucket(t, keys, b, num_partitions)

    def pick(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm)
        df = df.sort_values([cnt, col], ascending=[False, True],
                            kind="mergesort")
        win = df.groupby(keys, sort=False, dropna=False).head(1)
        win = win.rename(columns={col: name, cnt: count_name})
        win[count_name] = win[count_name].astype("int64")
        return pa.Table.from_pandas(win, preserve_index=False)

    lazy_counted = lazy_schema(counted)

    def mode_empty_schema():
        # the fallback must carry PICK's output columns (keys, name,
        # count_name) — the pre-rename counted schema (col, __rcdc_gmc)
        # would crash any consumer selecting 'mode'; an all-null-values
        # input leaves counted with zero blocks, so fall back to input
        # types for the key/value fields
        base = lazy_counted()
        if base is not None:
            fields = [base.field(k) for k in keys]
            fields.append(pa.field(name, base.field(col).type))
        else:
            s = ds.schema(fetch_if_missing=False) or ds.schema()
            if s is None:
                return None
            types = dict(zip(s.names, s.types))
            fields = [pa.field(k, types[k]) for k in keys]
            fields.append(pa.field(name, types[col]))
        fields.append(pa.field(count_name, pa.int64()))
        return pa.schema(fields)

    bucketed = counted.map_batches(add_bucket, batch_format="pyarrow")
    return partition_map(bucketed, b, num_partitions, pick,
                         empty_schema=mode_empty_schema)


def grouped_arg_extreme(
    ds: ray.data.Dataset,
    keys: list[str],
    by: str,
    *,
    tie_col: str,
    carry: list[str] | None = None,
    mode: str = "max",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per group, the row with the extreme (max/min) ``by`` value — SQL
    ``arg_max``/``arg_min``, made deterministic: ties on ``by`` break to
    the smallest ``tie_col`` (pass a unique id). Rows with null ``by`` are
    ignored; a group whose ``by`` is all null is absent (oracle filters
    ``WHERE by IS NOT NULL``).

    Mergeable one-row-per-key partial: each batch keeps only its local
    winner per key (vectorized sort + head(1)), so the keyed exchange
    moves at most ``num_keys x num_batches`` rows; the final per-bucket
    pass applies the identical pick. Carried columns keep their input
    types — values transit unchanged (no accumulation), so floats stay
    bit-exact vs any engine."""
    import pyarrow.compute as pc

    from raycdc.ops.ordered import _hash_bucket
    from raycdc.shuffle import lazy_schema, partition_map

    if mode not in ("max", "min"):
        raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
    carry = list(carry or [])
    cols = list(dict.fromkeys(keys + [by, tie_col] + carry))
    asc_by = mode == "min"

    def local_pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, tie_col], ascending=[asc_by, True],
                            kind="mergesort")
        return df.groupby(keys, sort=False, dropna=False).head(1)

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        t = t.filter(pc.is_valid(t[by]))
        return pa.Table.from_pandas(local_pick(t.to_pandas(types_mapper=_stm)),
                                    preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    b = "__rcdc_gae"

    def add_bucket(t: pa.Table) -> pa.Table:
        return _hash_bucket(t, keys, b, num_partitions)

    def final_pick(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(local_pick(t.to_pandas(types_mapper=_stm)),
                                    preserve_index=False)

    bucketed = partials.map_batches(add_bucket, batch_format="pyarrow")
    return partition_map(bucketed, b, num_partitions, final_pick,
                         empty_schema=lazy_schema(partials))


def grouped_string_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    *,
    order_by: list[str],
    sep: str = ",",
    name: str = "agg",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """SQL ``string_agg(col, sep ORDER BY order_by..., col)`` per group.
    ``order_by + [col]`` must totally order each group's rows or the
    concatenation is nondeterministic — include a unique id.

    Ordered concatenation is NOT mergeable without carrying order keys, so
    this is a single keyed exchange of the pruned ``(keys, order_by, col)``
    columns (partition-only, no sort barrier) followed by one vectorized
    sort + join per bucket. Null ``col`` values are skipped (SQL
    semantics); a group whose values are all null still appears, with a
    null aggregate."""
    from raycdc.ops.ordered import _hash_bucket
    from raycdc.shuffle import lazy_schema, partition_map

    cols = list(dict.fromkeys(keys + list(order_by) + [col]))
    pruned = ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow")
    b = "__rcdc_gsa"

    def add_bucket(t: pa.Table) -> pa.Table:
        return _hash_bucket(t, keys, b, num_partitions)

    def join_group(s: pd.Series):
        vals = s.dropna()
        return sep.join(vals.astype(str)) if len(vals) else None

    def concat(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_stm)
        df = df.sort_values(list(dict.fromkeys(list(order_by) + [col])),
                            kind="mergesort")
        out = (df.groupby(keys, sort=False, dropna=False)[col]
               .agg(join_group).reset_index().rename(columns={col: name}))
        schema = pa.schema([*((k, t.schema.field(k).type) for k in keys),
                            (name, pa.string())])
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    lazy_pruned = lazy_schema(pruned)

    def agg_empty_schema():
        # the fallback must carry CONCAT's output columns (keys, name) —
        # the pruned input schema (keys, order_by, col) has no 'agg'
        base = lazy_pruned()
        if base is not None:
            key_fields = [base.field(k) for k in keys]
        else:
            s = ds.schema(fetch_if_missing=False) or ds.schema()
            if s is None:
                return None
            types = dict(zip(s.names, s.types))
            key_fields = [pa.field(k, types[k]) for k in keys]
        return pa.schema(key_fields + [pa.field(name, pa.string())])

    bucketed = pruned.map_batches(add_bucket, batch_format="pyarrow")
    return partition_map(bucketed, b, num_partitions, concat,
                         empty_schema=agg_empty_schema)


def grouped_top_n(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: str,
    *,
    n: int,
    descending: bool = True,
    tiebreak: str | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Top-``n`` ROWS per group by ``order_by`` — SQL
    ``QUALIFY row_number() OVER (PARTITION BY keys ORDER BY order_by
    [DESC], tiebreak) <= n``. Deterministic when ``tiebreak`` (a unique
    id column) is given; pass one whenever ``order_by`` can tie.

    Per-batch LOCAL top-n first (the combiner: a batch can contribute at
    most n rows per group it contains), then one partition-only exchange
    of those survivors and the same vectorized head(n) per bucket — the
    distributed-top-k shape generalized to per-group row selection; no
    global sort, no per-group Python.
    """
    from raycdc.ops.ordered import _hash_bucket
    from raycdc.shuffle import lazy_schema, partition_map

    b = "__rcdc_gtn"
    sort_cols = [order_by] + ([tiebreak] if tiebreak else [])
    ascending = [not descending] + ([True] if tiebreak else [])

    def local_top(t: pa.Table) -> pa.Table:
        # ONE pick used as both the per-batch combiner and the per-bucket
        # final pass — they must stay byte-identical for the combiner to be
        # sound (top-n of top-ns), so there is deliberately no second copy
        df = t.to_pandas(types_mapper=_stm)
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable",
                            na_position="last")
        df = df.groupby(keys, sort=False, dropna=False).head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    bucket_top = local_top

    pre = ds.map_batches(
        lambda t: _hash_bucket(local_top(t), keys, b, num_partitions),
        batch_format="pyarrow")
    return partition_map(pre, b, num_partitions, bucket_top,
                         empty_schema=lazy_schema(ds))


def weighted_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    *,
    scale: float = 1.0,
    mult: int = 2654435761,
) -> ray.data.Dataset:
    """Deterministic PER-ROW-rate sampling: keep a row with probability
    ``min(1, scale * weight)`` — quality-weighted corpus downsampling
    ("keep high-score docs at full rate, low-score at their score"),
    reproducible across runs/parallelism/engines.

    The same Knuth multiplicative-hash predicate as :func:`hash_sample`
    with the cut line computed from the row's own weight:
    ``(id * mult) % 2^32 < floor(min(1, scale*weight) * 2^32)`` —
    expressible verbatim in ANSI SQL, so the sample is oracle-checkable.
    Null id or null/negative weight drops the row (SQL: NULL predicate
    is not TRUE). Stateless per-batch filter; no shuffle.
    """

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np

        valid = pc.and_(pc.is_valid(t[id_col]), pc.is_valid(t[weight_col]))
        if t.num_rows and not pc.all(pc.fill_null(valid, False)).as_py():
            t = t.filter(pc.fill_null(valid, False))
        if t.num_rows == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or
                         (ids.dtype.kind == "f" and np.isnan(ids).any())):
            # same rule as hash_sample/mixture_sample: SQL % keeps the
            # dividend's sign while numpy wraps through uint64 — the
            # documented SQL equivalence only holds for non-negative ids
            raise ValueError(
                f"weighted_sample requires non-negative ids in {id_col!r}")
        w = pc.cast(t[weight_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        rate = np.clip(scale * w, 0.0, 1.0)
        cut = np.floor(rate * 4294967296.0)
        h = (ids.astype(np.uint64) * np.uint64(mult)) % np.uint64(1 << 32)
        return t.filter(pa.array(h.astype(np.float64) < cut))

    return ds.map_batches(keep, batch_format="pyarrow")
