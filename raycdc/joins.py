"""Distributed hash joins as explicit bucket-cogroup, plus broadcast joins.

``Dataset.join`` in Ray 2.49 breaks when any hash partition receives zero
rows from one side (its aggregator builds a schema-less empty table and the
Arrow join then fails on the missing key field), so the engine carries its own
portable implementation: tag each side, align both to a unified schema, add a
``bucket = hash(key) % P`` column, union, ``groupby(bucket)``, and join the
two sides of each bucket with pyarrow's native (Acero) hash join inside
``map_groups``. One all-to-all exchange, vectorized per-bucket work, correct
on empty partitions.

For small right sides prefer :func:`broadcast_join`: the build side is put in
the object store once and probed per batch — no shuffle at all.

This is the join machinery behind the flattener's shuffle strategy (the
reference's per-level ``current LEFT OUTER JOIN input``,
HierarchyFlattener.java:274-278) and the generic join surface of the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_SIDE = "__rcdc_side"
_JBUCKET = "__rcdc_jb"

_ARROW_VERBS = {
    "inner": "inner",
    "left_outer": "left outer",
    "right_outer": "right outer",
    "full_outer": "full outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
}


def _normalize_key_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.large_string()
    # temporal keys canonicalize to MICROSECOND resolution before any
    # int64 tick cast: a timestamp[us] side joined/asof-matched against a
    # timestamp[ms] side must compare logical instants, not raw ticks
    # (2500 ms-ticks < 1000000 us-ticks silently mis-matched before).
    # ns inputs KEEP ns — the safe us cast would raise ArrowInvalid on any
    # sub-microsecond component; cross-unit pairs widen to the finer unit
    # via _common_key_type.
    if pa.types.is_timestamp(t):
        return pa.timestamp("ns" if t.unit == "ns" else "us", tz=t.tz)
    if pa.types.is_date(t):
        return pa.timestamp("us")
    if pa.types.is_time(t):
        return pa.time64("ns" if getattr(t, "unit", "us") == "ns" else "us")
    return t


def _common_key_type(lt: pa.DataType, rt: pa.DataType) -> "pa.DataType | None":
    """The one type BOTH sides of a key pair cast to, or None when the
    families are incompatible. Differing temporal units widen to the finer
    (ns) — exact for every us-representable instant inside ns range; an
    out-of-range value fails the safe cast loudly rather than comparing
    wrong ticks."""
    nl, nr = _normalize_key_type(lt), _normalize_key_type(rt)
    if nl == nr:
        return nl
    if pa.types.is_timestamp(nl) and pa.types.is_timestamp(nr) \
            and nl.tz == nr.tz:
        return pa.timestamp("ns", tz=nl.tz)
    if pa.types.is_time(nl) and pa.types.is_time(nr):
        return pa.time64("ns")
    return None


# multiplier to a common ns-equivalent tick for HASHING temporal keys:
# uint64 wrap-around multiply is deterministic and unit-consistent (a us
# side x1000 equals the ns side's raw ticks for every instant ns can
# represent), so cross-unit keys hash identically without a lossy or
# overflow-raising Arrow cast.
_NS_PER_UNIT = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


def _temporal_hash_ticks(arr: "pa.Array", norm: pa.DataType) -> "pd.Series":
    if pa.types.is_time32(arr.type):
        # time32 (s/ms) has no direct int64 cast; widen to time64[us]
        # first (exact) and scale from there
        arr = pc.cast(arr, pa.time64("us"))
        norm = arr.type
    unit = getattr(norm, "unit", "us")
    ticks = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
    return pd.Series(ticks.astype(np.uint64)
                     * np.uint64(_NS_PER_UNIT.get(unit, 1)))


def _null_fill_scalar(t: pa.DataType):
    """A typed fill for null KEY values before hashing. Null keys never
    match (SQL), so their hash only routes them somewhere consistent —
    but they must not be allowed to reach ``to_pandas()``: a single null
    in an int64 batch flips the whole batch to float64, and
    hash(int64 2) != hash(float64 2.0), silently mis-bucketing every key
    in that batch relative to null-free batches (lost join matches)."""
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return 0
    if (pa.types.is_string(t) or pa.types.is_large_string(t)):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_boolean(t):
        return False
    return None  # caller falls back to pandas conversion as-is


def key_hash(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic vectorized hash of key columns, dtype-normalized so the
    same logical value hashes identically on both sides of a join and in
    every batch (null-containing int batches included)."""
    arrays = {}
    for c in cols:
        arr = table[c]
        norm = _normalize_key_type(arr.type)
        if pa.types.is_timestamp(norm) or pa.types.is_time(norm):
            # hash temporal keys as wrap-around ns-equivalent ticks so a us
            # side and a ns side hash the same instant identically (null
            # ticks fill as epoch 0 — null keys never match, routing only)
            if pa.types.is_date(arr.type):
                arr = pc.cast(arr, pa.timestamp("us"))
            if arr.null_count:
                arr = pc.fill_null(arr, pa.scalar(0, arr.type))
            arrays[c] = _temporal_hash_ticks(arr, arr.type)
            continue
        if norm != arr.type:
            arr = pc.cast(arr, norm)
        if arr.null_count:
            fill = _null_fill_scalar(norm)
            if fill is not None:
                arr = pc.fill_null(arr, fill)
        arrays[c] = arr.to_pandas()
    return pd.util.hash_pandas_object(pd.DataFrame(arrays), index=False).to_numpy()


_BROADCASTABLE = ("inner", "left_outer", "left_semi", "left_anti")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
    strategy: str = "auto",
    broadcast_max_bytes: int = 256 << 20,
    broadcast_max_rows: int = 1 << 16,
) -> ray.data.Dataset:
    """Hash join of two Datasets.

    ``strategy="auto"`` (default) mirrors the flattener's auto pick: the
    right (build) side is materialized and, when it is small — under
    ``broadcast_max_bytes`` AND ``broadcast_max_rows`` — and the join type
    is left-preserving (inner/left_outer/left_semi/left_anti), the keyed
    exchange is skipped entirely: the build table is put in the object
    store once and probed per left batch (:func:`broadcast_join`). The
    ROW cap matters as much as the byte cap: ``pa.Table.join`` rebuilds
    the build-side hash table on every probe call, so broadcast cost is
    ~left_batches × build_rows — a mid-sized build (measured: 150k rows)
    probes SLOWER than one exchange even though it fits comfortably in
    memory. Larger builds (or right/full outer joins, which need global
    unmatched-right knowledge) run the shuffle path. Pass
    ``strategy="shuffle"`` when the right side is a large pipeline that
    should stream into the exchange concurrently with the left instead of
    materializing first (e.g. the flattener's reference-shaped per-level
    join and the dedup signature rejoins).

    Non-key column names must be disjoint between the two sides (rename
    upstream; the flattener prefixes its right side). Null keys never match,
    per SQL semantics.
    """
    right_on = right_on or on
    verb = _ARROW_VERBS[join_type]
    lschema = _pa_schema(left)
    rschema = _pa_schema(right)
    overlap = (set(lschema.names) & set(rschema.names)) - (
        set(on) & set(right_on))
    if overlap:
        raise ValueError(f"Overlapping non-key columns in join: {sorted(overlap)}")
    # Acero rejects mismatched key dtypes (int32 vs int64). When the two
    # sides' key types differ but normalize to the same family, widen BOTH
    # to the normalized type (SQL joins int32 against int64 fine); when
    # they already match, leave them untouched so output schemas are
    # stable for same-typed joins.
    lcast: dict[str, pa.DataType] = {}
    rcast: dict[str, pa.DataType] = {}
    for lk, rk in zip(on, right_on):
        lt_, rt_ = lschema.field(lk).type, rschema.field(rk).type
        if lt_ != rt_:
            common = _common_key_type(lt_, rt_)
            if common is None:
                raise ValueError(
                    f"Join key dtypes incompatible: {lk}:{lt_} vs {rk}:{rt_}")
            if lt_ != common:
                lcast[lk] = common
            if rt_ != common:
                rcast[rk] = common
    if lcast:
        lschema = pa.schema([pa.field(f.name, lcast.get(f.name, f.type))
                             for f in lschema])
    if rcast:
        rschema = pa.schema([pa.field(f.name, rcast.get(f.name, f.type))
                             for f in rschema])
    semi_anti = join_type in ("left_semi", "left_anti")

    if strategy == "auto" and join_type in _BROADCASTABLE:
        right = right.materialize()
        if (right.size_bytes() or 0) < broadcast_max_bytes \
                and right.count() <= broadcast_max_rows:
            def cast_side(schema: pa.Schema, key0: str):
                def fn(t: pa.Table) -> pa.Table:
                    if t.num_rows == 0 or key0 not in t.column_names:
                        return schema.empty_table()
                    return pa.table(
                        {f.name: (pc.cast(t[f.name], f.type)
                                  if t[f.name].type != f.type else t[f.name])
                         for f in schema})
                return fn

            probe = left
            if lcast:
                probe = left.map_batches(cast_side(lschema, on[0]),
                                         batch_format="pyarrow")
            build: "ray.data.Dataset" = right
            if rcast:
                build = right.map_batches(cast_side(rschema, right_on[0]),
                                          batch_format="pyarrow")
            # build side stays a Dataset: broadcast_join concatenates it in
            # a remote task, so the table never transits the driver heap
            return broadcast_join(probe, build, on=on, right_on=right_on,
                                  join_type=join_type)

    unified = pa.schema(
        list(lschema)
        + [f for f in rschema if f.name not in lschema.names]
        + [pa.field(_SIDE, pa.int8())]
    )

    def align(side: int, own_schema: pa.Schema, keys: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or keys[0] not in t.column_names:
                return unified.empty_table().append_column(
                    _JBUCKET, pa.array([], pa.int64()))
            cols = {}
            for f in unified:
                if f.name == _SIDE:
                    cols[f.name] = pa.array(
                        np.full(t.num_rows, side, dtype=np.int8))
                elif f.name in t.column_names:
                    arr = t[f.name]
                    if arr.type != f.type:  # widened cross-type join key
                        arr = pc.cast(arr, f.type)
                    cols[f.name] = arr
                else:
                    cols[f.name] = pa.nulls(t.num_rows, f.type)
            out = pa.table(cols)
            h = key_hash(t, keys) % num_partitions
            return out.append_column(_JBUCKET, pa.array(h.astype(np.int64)))
        return fn

    lal = left.map_batches(align(0, lschema, on), batch_format="pyarrow")
    ral = right.map_batches(align(1, rschema, right_on), batch_format="pyarrow")
    both = lal.union(ral)

    def join_bucket(t: pa.Table) -> pa.Table:
        side = t[_SIDE]
        lt = t.filter(pc.equal(side, 0)).select(lschema.names).cast(lschema)
        rt = t.filter(pc.equal(side, 1)).select(rschema.names).cast(rschema)
        joined = lt.join(rt, keys=on, right_keys=right_on, join_type=verb,
                         coalesce_keys=True)
        if semi_anti:
            joined = joined.select(lschema.names)
        return joined

    # Partition-only exchange (raycdc.shuffle): a hash join needs
    # co-location, not ordering — Ray's groupby would pay a sample + sort +
    # barrier for an ordering the Acero per-bucket join never looks at.
    from raycdc.shuffle import partition_map

    out_schema = lschema if semi_anti else lschema.empty_table().join(
        rschema.empty_table(), keys=on, right_keys=right_on, join_type=verb,
        coalesce_keys=True).schema
    return partition_map(both, _JBUCKET, num_partitions, join_bucket,
                         empty_schema=out_schema)


class BroadcastJoiner:
    """Probe kernel for a broadcast build side.

    The right (small) table is put in the object store once; the kernel
    fetches it on construction and every batch is joined locally with the
    Acero hash join — zero shuffle (SURVEY.md §4 broadcast-variant note).
    Runs as plain map_batches tasks by default (`_broadcast_probe_fn`):
    construction is one node-local zero-copy plasma fetch, so an actor
    pool amortizes nothing and pays spin-up latency; Acero rebuilds the
    build-side hash table per probe call either way.
    """

    def __init__(self, right_ref, on, right_on, verb, left_schema=None):
        self.right = ray.get(right_ref) if isinstance(right_ref, ray.ObjectRef) else right_ref
        self.on, self.right_on, self.verb = on, right_on, verb
        self.left_schema = left_schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.on[0] not in batch.column_names:
            # Ray Data can hand probe actors schema-less empty blocks
            # (e.g. an empty union branch); Acero would raise on the
            # missing key field — substitute the typed empty probe table
            if self.left_schema is None:
                raise ValueError(
                    "broadcast join received a schema-less empty batch and "
                    "no left schema was derivable")
            batch = self.left_schema.empty_table()
        return batch.join(self.right, keys=self.on, right_keys=self.right_on,
                          join_type=self.verb, coalesce_keys=True)


def _broadcast_probe_fn(right_ref, on, right_on, verb, left_schema):
    """Plain-task wrapper around :class:`BroadcastJoiner` — cheap-init, so
    it rides shuffle.stateless_stage's per-worker memo."""
    from raycdc.shuffle import stateless_stage

    return stateless_stage(BroadcastJoiner, right_ref, list(on),
                           list(right_on), verb, left_schema)


@ray.remote
def _concat_build_side(schema: "pa.Schema | None", *blocks) -> pa.Table:
    live = [b for b in blocks if b is not None and b.num_rows]
    if not live:
        return schema.empty_table() if schema is not None else pa.table({})
    return pa.concat_tables(live, promote_options="default")


def broadcast_join(
    left: ray.data.Dataset,
    right: pa.Table | ray.data.Dataset,
    *,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    concurrency=None,
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Join a large Dataset against a small in-memory table, no shuffle.

    A Dataset build side is concatenated in a REMOTE task (the table goes
    straight from the task into the object store; the driver only ever
    holds the ref), then fetched once per probe actor."""
    right_on = right_on or on
    if isinstance(right, ray.data.Dataset):
        from raycdc.shuffle import block_refs_of

        # blocks must be Arrow for the remote concat (repo invariant:
        # from_pandas datasets hand out pandas blocks)
        arrow = right.map_batches(lambda t: t, batch_format="pyarrow")
        try:
            schema = _pa_schema(right)
        except Exception:
            schema = None
        right_ref = _concat_build_side.remote(schema,
                                              *block_refs_of(arrow))
    else:
        right_ref = ray.put(right)
    try:
        left_schema = _pa_schema(left)
    except Exception:
        left_schema = None
    if isinstance(right, pa.Table):
        schema = right.schema
    if concurrency is None:
        out = left.map_batches(
            _broadcast_probe_fn(right_ref, on, right_on,
                                _ARROW_VERBS[join_type], left_schema),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        out = left.map_batches(
            BroadcastJoiner,
            fn_constructor_args=(right_ref, on, right_on,
                                 _ARROW_VERBS[join_type], left_schema),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    # Pin the output: an empty probe side yields zero blocks and a None
    # schema downstream (repo invariant). The output schema is derivable
    # from the two input schemas via a zero-row Acero join; skip the pin
    # only when neither is knowable.
    if left_schema is not None:
        try:
            verb = _ARROW_VERBS[join_type]
            if verb in ("left semi", "left anti"):
                out = pin_schema(out, left_schema)
            elif schema is not None:
                out_schema = left_schema.empty_table().join(
                    schema.empty_table(), keys=on, right_keys=right_on,
                    join_type=verb, coalesce_keys=True).schema
                out = pin_schema(out, out_schema)
        except Exception:
            pass
    return out


def _pa_schema(ds: ray.data.Dataset) -> pa.Schema:
    s = ds.schema()
    return pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])


def pin_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Union a typed empty block so a dataset that may be EMPTY at runtime
    keeps its schema (zero blocks => ``ds.schema()`` is None, which crashes
    any downstream join or `_pa_schema`). Lazy — adds one empty block, no
    materialization. Pin BEFORE handing a possibly-empty lineage to
    `hash_join`; the pin does not survive a further `map_batches` over
    zero blocks, so pin the final stage too when the consumer needs a
    schema."""
    return ds.union(ray.data.from_arrow(schema.empty_table()))


def _widen_shared_fields(
        lschema: pa.Schema, rschema: pa.Schema
) -> tuple[pa.Schema, pa.Schema]:
    """Same-named fields whose types differ across the two sides are
    widened to their normalized common type on BOTH sides (int32 vs int64
    → int64, like SQL); incompatible families raise. Same-typed fields are
    untouched so output schemas stay stable for ordinary joins."""
    lcast: dict[str, pa.DataType] = {}
    rcast: dict[str, pa.DataType] = {}
    for f in lschema:
        if f.name not in rschema.names:
            continue
        rt = rschema.field(f.name).type
        if f.type == rt:
            continue
        common = _common_key_type(f.type, rt)
        if common is None:
            raise ValueError(
                f"Shared column dtypes incompatible: {f.name}: "
                f"{f.type} vs {rt}")
        if f.type != common:
            lcast[f.name] = common
        if rt != common:
            rcast[f.name] = common
    if lcast:
        lschema = pa.schema([pa.field(f.name, lcast.get(f.name, f.type))
                             for f in lschema])
    if rcast:
        rschema = pa.schema([pa.field(f.name, rcast.get(f.name, f.type))
                             for f in rschema])
    return lschema, rschema


def _copartition_apply(left, right, by, num_partitions, key_cols, out_schema,
                       fn, lschema, rschema):
    """Co-locate two Datasets by ``hash(by)`` with the partition-only
    exchange and run ``fn(left_table, right_table) -> table`` once per
    partition. The shared machinery behind asof_join / interval_join.
    ``lschema``/``rschema`` are the caller's (possibly width-unified, see
    :func:`_widen_shared_fields`) side schemas."""
    overlap = (set(lschema.names) & set(rschema.names)) - set(key_cols)
    if overlap:
        raise ValueError(f"Overlapping non-key columns: {sorted(overlap)}")
    unified = pa.schema(
        list(lschema)
        + [f for f in rschema if f.name not in lschema.names]
        + [pa.field(_SIDE, pa.int8())])

    def align(side: int):
        def amap(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return unified.empty_table().append_column(
                    _JBUCKET, pa.array([], pa.int64()))
            cols = {}
            for f in unified:
                if f.name == _SIDE:
                    cols[f.name] = pa.array(
                        np.full(t.num_rows, side, dtype=np.int8))
                elif f.name in t.column_names:
                    arr = t[f.name]
                    if arr.type != f.type:  # width-unified shared column
                        arr = pc.cast(arr, f.type)
                    cols[f.name] = arr
                else:
                    cols[f.name] = pa.nulls(t.num_rows, f.type)
            out = pa.table(cols)
            h = key_hash(t, by) % num_partitions
            return out.append_column(_JBUCKET, pa.array(h.astype(np.int64)))
        return amap

    both = left.map_batches(align(0), batch_format="pyarrow").union(
        right.map_batches(align(1), batch_format="pyarrow"))

    def bucket(t: pa.Table) -> pa.Table:
        side = t[_SIDE]
        lt = t.filter(pc.equal(side, 0)).select(lschema.names).cast(lschema)
        rt = t.filter(pc.equal(side, 1)).select(rschema.names).cast(rschema)
        return fn(lt, rt)

    from raycdc.shuffle import partition_map

    return partition_map(both, _JBUCKET, num_partitions, bucket,
                         empty_schema=out_schema)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: list[str],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Backward as-of join: each left row picks the right row with the
    largest ``on`` value that is <= its own, within the same ``by`` group
    (left outer: unmatched left rows keep nulls). Ray Data has no native
    as-of join; this is the engine's composition — co-locate both sides by
    ``hash(by)`` with the partition-only exchange, then ONE vectorized
    ``pd.merge_asof`` per partition (sort + binary search, no per-key
    Python).

    Determinism note: if the right side has duplicate (by, on) rows the
    winner is unspecified (like DuckDB's ASOF JOIN) — pre-dedup the right
    side for reproducible output. Non-key column names must be disjoint.
    """
    lschema, rschema = _widen_shared_fields(
        _pa_schema(left), _pa_schema(right))
    out_schema = pa.schema(
        list(lschema) + [f for f in rschema if f.name not in (on, *by)])

    def join_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # match on SKELETON frames (keys + positional index) and gather the
        # payload from Arrow by matched index: pandas never touches payload
        # columns, so unmatched rows can't upcast int64->float64 (silent
        # precision loss past 2^53) and NaN payloads stay distinct from
        # null. SQL null-key semantics: a null `on` OR null `by` key on
        # either side never matches (merge_asof would RAISE on null `on`
        # and would happily match None==None on `by`).
        ri = _asof_match(lt, rt, on=on, right_on=on, by=by)
        mask = ri < 0
        take_idx = pa.array(ri, pa.int64(), mask=mask)
        cols = {f.name: lt[f.name] for f in lschema}
        for f in rschema:
            if f.name == on or f.name in by:
                continue
            arr = rt[f.name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[f.name] = arr.take(take_idx)
        return pa.table(cols, schema=out_schema)

    return _copartition_apply(left, right, by, num_partitions,
                              {on, *by}, out_schema, join_fn,
                              lschema, rschema)


def _skeleton_valid_mask(t: pa.Table, cols: list[str]) -> "np.ndarray":
    """Rows whose every key column is non-null and (for floats) non-NaN,
    computed on the ARROW table — see _asof_match for why this must happen
    before any pandas conversion."""
    m = np.ones(t.num_rows, dtype=bool)
    for c in cols:
        arr = t[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        m &= pc.is_valid(arr).to_numpy(zero_copy_only=False)
        if pa.types.is_floating(arr.type):
            m &= ~pc.fill_null(pc.is_nan(arr), True).to_numpy(
                zero_copy_only=False)
    return m


def _skeleton_frame(t: pa.Table, cols: list[str], mask: "np.ndarray",
                    idx_name: str,
                    targets: "dict[str, pa.DataType] | None" = None
                    ) -> "pd.DataFrame":
    """Null-free key skeleton as pandas with original row positions. Key
    columns are dtype-normalized (int*→int64, float*→float64,
    timestamp/date/time→int64 ticks in the column's — or ``targets``' —
    canonical unit) so merge_asof never sees a cross-side dtype mismatch;
    null rows were dropped on Arrow so the conversion can never flip an
    int column to float64. ``targets`` pins specific columns to a
    pair-common type (cross-NAMED temporal keys like interval_join's
    ``on`` vs ``lo`` don't go through _widen_shared_fields)."""
    sub = t.select(cols)
    if not mask.all():
        sub = sub.filter(pa.array(mask))
    out = {}
    for c in cols:
        arr = sub[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        norm = (targets or {}).get(c) or _normalize_key_type(arr.type)
        if norm != arr.type:
            try:
                arr = pc.cast(arr, norm)
            except pa.lib.ArrowInvalid as e:
                raise ValueError(
                    f"temporal key column {c!r} ({arr.type}) cannot be "
                    f"losslessly cast to the pair-common type {norm}: {e}"
                ) from e
        if pa.types.is_timestamp(norm) or pa.types.is_date(norm) \
                or pa.types.is_time(norm):
            arr = pc.cast(arr, pa.int64())
        out[c] = arr.to_pandas()
    df = pd.DataFrame(out)
    df[idx_name] = np.arange(t.num_rows, dtype=np.int64)[mask]
    return df


def _asof_match(lt: pa.Table, rt: pa.Table, *, on: str, right_on: str,
                by: list[str]) -> "np.ndarray":
    """Backward as-of matching on key skeletons: returns, per left row (in
    lt order), the matched right row index or -1. Rows with a null `on` /
    `right_on` or any null `by` key never match.

    Null-key rows are filtered on the ARROW tables before ``to_pandas``:
    a null in a plain to_pandas of an int64 key flips that side's column
    to float64 while the null-free side stays int64, and merge_asof then
    raises MergeError on the mismatched key dtypes. Filtering first keeps
    both skeletons' dtypes stable (and NaN float keys are excluded like
    nulls, matching the previous notna() semantics)."""
    nl = lt.num_rows
    lcols, rcols = [on] + list(by), [right_on] + list(by)
    lmask = _skeleton_valid_mask(lt, lcols)
    rmask = _skeleton_valid_mask(rt, rcols)
    ri = np.full(nl, -1, dtype=np.int64)
    if not lmask.any() or not rmask.any():
        return ri
    # `on` vs `right_on` may be differently-NAMED columns with different
    # temporal units (interval_join's on vs lo) — pin both skeletons to the
    # pair-common type so the int64 ticks compare the same logical instant
    lon_t = lt.schema.field(on).type
    ron_t = rt.schema.field(right_on).type
    common_on = _common_key_type(lon_t, ron_t)
    if common_on is None:
        raise ValueError(
            f"asof key dtypes incompatible: {on}:{lon_t} vs "
            f"{right_on}:{ron_t}")
    ldf = _skeleton_frame(lt, lcols, lmask, "__li", targets={on: common_on})
    rdf = _skeleton_frame(rt, rcols, rmask, "__ri",
                          targets={right_on: common_on})
    if right_on != on:
        rdf = rdf.rename(columns={right_on: on})
    lv = ldf.sort_values(on, kind="stable")
    rv = rdf.sort_values(on, kind="stable")
    merged = pd.merge_asof(lv, rv, on=on, by=list(by), direction="backward")
    mri = merged["__ri"].to_numpy()
    li = merged["__li"].to_numpy().astype(np.int64)
    has = ~pd.isna(mri)
    ri[li[has]] = mri[has].astype(np.int64)
    return ri


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: list[str],
    lo: str,
    hi: str,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Point-in-interval join: each left row matches the right interval of
    its ``by`` group with ``lo <= on <= hi``. Intervals within a group must
    be NON-OVERLAPPING (sessions, windows) — that makes the match unique
    and the kernel one ``merge_asof`` (binary search on interval starts)
    plus a vectorized upper-bound filter. ``join_type`` 'inner' drops
    unmatched left rows, 'left_outer' keeps them with nulls.
    """
    if join_type not in ("inner", "left_outer"):
        raise ValueError("interval_join supports inner / left_outer")
    lschema, rschema = _widen_shared_fields(
        _pa_schema(left), _pa_schema(right))
    out_schema = pa.schema(
        list(lschema) + [f for f in rschema if f.name not in by])

    def join_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # skeleton match + Arrow payload gather (see asof_join.join_fn for
        # why: null-key SQL semantics incl. null `by`, no pandas payload
        # upcasting). The asof step finds the interval with the largest
        # lo <= on; the hi >= on filter then decides containment.
        ri = _asof_match(lt, rt, on=on, right_on=lo, by=by)
        matched = ri >= 0
        hi_take = pa.array(ri, pa.int64(), mask=~matched)
        hi_arr = rt[hi]
        if isinstance(hi_arr, pa.ChunkedArray):
            hi_arr = hi_arr.combine_chunks()
        on_arr = lt[on].combine_chunks() \
            if isinstance(lt[on], pa.ChunkedArray) else lt[on]
        if hi_arr.type != on_arr.type:
            # cross-unit temporal bound (us `on` vs ns `hi` or vice versa):
            # compare in the pair-common type, not raw ticks
            common = _common_key_type(hi_arr.type, on_arr.type)
            if common is not None:
                hi_arr = pc.cast(hi_arr, common)
                on_arr = pc.cast(on_arr, common)
        inside_arr = pc.fill_null(
            pc.greater_equal(hi_arr.take(hi_take), on_arr), False)
        inside = inside_arr.to_numpy(zero_copy_only=False)
        ri = np.where(inside, ri, -1)
        rcols = [f.name for f in rschema if f.name not in by]
        if join_type == "inner":
            keep = pa.array(inside)
            base = lt.filter(keep)
            take_idx = pa.array(ri[inside], pa.int64())
        else:
            base = lt
            take_idx = pa.array(ri, pa.int64(), mask=ri < 0)
        cols = {f.name: base[f.name] for f in lschema}
        for name in rcols:
            arr = rt[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[name] = arr.take(take_idx)
        return pa.table(cols, schema=out_schema)

    return _copartition_apply(left, right, by, num_partitions,
                              set(by), out_schema, join_fn,
                              lschema, rschema)


# --------------------------------------------------------------- bloom semi
_BLOOM_FANIN = 64  # partial bitmaps OR-combined per tree-reduce task


def _key_hash64(t: pa.Table, cols: list[str]) -> "np.ndarray":
    """Order-sensitive 64-bit hash of the key tuple, name-independent (both
    join sides must produce identical hashes even when their key COLUMNS are
    named differently, so column names never enter the hash). Key dtypes are
    normalized exactly like :func:`key_hash` (int*→int64, float*→float64,
    string→large_string, timestamp/date/time→int64) — without this an int32
    build side vs an int64 probe side hashes the same logical key to two
    different values, and a bloom false NEGATIVE silently drops rows the
    exact semi join would keep."""
    h = None
    for c in cols:
        arr = t[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        norm = _normalize_key_type(arr.type)
        if pa.types.is_timestamp(norm) or pa.types.is_time(norm):
            # same wrap-around ns-equivalent ticks as key_hash: a us build
            # side and a ns probe side must hash an instant identically
            if pa.types.is_date(arr.type):
                arr = pc.cast(arr, pa.timestamp("us"))
            series = _temporal_hash_ticks(arr, arr.type)
        else:
            if norm != arr.type:
                arr = pc.cast(arr, norm)
            series = arr.to_pandas()
        hc = pd.util.hash_pandas_object(series, index=False).to_numpy()
        h = hc if h is None else (
            h * np.uint64(0x9E3779B97F4A7C15)) ^ hc
    return h


def _bloom_set(bmp: "np.ndarray", h: "np.ndarray", num_bits: int,
               num_hashes: int) -> None:
    h1, h2 = h, (h >> np.uint64(32)) | np.uint64(1)
    for i in range(num_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        np.bitwise_or.at(bmp, (pos >> np.uint64(6)).astype(np.int64),
                         np.left_shift(np.uint64(1),
                                       pos & np.uint64(63)))


def _bloom_test(bmp: "np.ndarray", h: "np.ndarray", num_bits: int,
                num_hashes: int) -> "np.ndarray":
    h1, h2 = h, (h >> np.uint64(32)) | np.uint64(1)
    hit = np.ones(len(h), dtype=bool)
    for i in range(num_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
        word = bmp[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


def _bloom_task_fn(cls, bmp_ref, on, num_bits, num_hashes):
    """Plain-task wrapper around a bloom probe class.

    The probes are cheap-init (one node-local zero-copy plasma fetch of the
    bitmap), so an actor pool buys no amortization and pays ~2 s of pool
    spin-up latency per stage (measured on the sf0.1 incremental dedup:
    2.5 s pool vs 0.55 s tasks per branch) — shuffle.stateless_stage's
    per-worker memo."""
    from raycdc.shuffle import stateless_stage

    return stateless_stage(cls, bmp_ref, list(on), num_bits, num_hashes)


def _bloom_stage(ds, cls, bmp_ref, on, num_bits, num_hashes, concurrency):
    """Bloom probe stage: plain tasks by default; an actor pool only when
    the caller explicitly asks for one (``concurrency`` not None)."""
    if concurrency is None:
        return ds.map_batches(
            _bloom_task_fn(cls, bmp_ref, on, num_bits, num_hashes),
            batch_format="pyarrow")
    return ds.map_batches(
        cls, batch_format="pyarrow",
        fn_constructor_args=(bmp_ref, on, num_bits, num_hashes),
        concurrency=concurrency)


class _BloomProbe:
    """Bloom prefilter kernel: fetch the broadcast bitmap once, drop rows
    whose key tuple cannot be on the build side (null keys are dropped
    outright — SQL semi join never matches them). Runs as plain tasks via
    :func:`_bloom_stage` (cheap-init; see `_bloom_task_fn`)."""

    def __init__(self, bmp_ref, on, num_bits, num_hashes):
        self.bmp = (ray.get(bmp_ref)
                    if isinstance(bmp_ref, ray.ObjectRef) else bmp_ref)
        self.on, self.num_bits, self.num_hashes = on, num_bits, num_hashes

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        valid = np.ones(t.num_rows, dtype=bool)
        for c in self.on:
            valid &= pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
        keep = valid.copy()
        if valid.any():
            sub = t.filter(pa.array(valid)) if not valid.all() else t
            hit = _bloom_test(self.bmp, _key_hash64(sub, self.on),
                              self.num_bits, self.num_hashes)
            keep[valid] = hit
        return t.filter(pa.array(keep))


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: list[str],
    right_on: list[str] | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    num_partitions: int = 32,
    concurrency=None,
    auto_skip: float | None = 0.95,
    probe_sample: int = 8192,
) -> ray.data.Dataset:
    """EXACT left-semi join, bloom-accelerated: result is identical to
    ``hash_join(..., "left_semi")`` but only probable matches pay the keyed
    exchange.

    1. Every right batch folds its keys into a partial bitmap (fixed
       ``num_bits/8`` bytes — 1 MiB at the default — regardless of row
       count); partials OR-combine through a ``_BLOOM_FANIN``-way combine
       stage (so the driver sees one row per FANIN blocks, not one per
       block) and finish on the driver.
    2. The bitmap is ``ray.put`` once and each probe actor fetches it in
       ``__init__``; left rows failing the membership test are dropped
       before the shuffle. No false negatives (every inserted key tests
       positive), so nothing real is lost.
    3. The surviving left rows run the ordinary exact semi join, which
       removes bloom false positives (~0.24%% at 1 M keys / 8 Mbit / k=4).

    ``auto_skip``: an UNSELECTIVE build side (most left keys match) makes
    the probe stage pure overhead — the bitmap drops nothing and the full
    exchange still runs. After building the bitmap, a ``probe_sample``-row
    prefix of the left side is tested on the driver; if its survival rate
    exceeds ``auto_skip`` the probe stage is skipped and the plain exact
    semi join runs directly (same rows either way — the bloom filter is
    only ever an exchange-volume optimization). Pass ``auto_skip=None``
    to force the probe stage unconditionally.

    At a 100 TB left with a selective build side this turns the all-to-all
    exchange into one over ~selectivity x |left| rows for the price of a
    1 MiB broadcast."""
    right_on = list(right_on or on)
    on = list(on)
    # round up to whole uint64 words: a non-multiple-of-64 num_bits yields
    # bit positions in a word past the allocated bitmap (IndexError in
    # np.bitwise_or.at / _bloom_test)
    num_bits = (num_bits + 63) & ~63
    words = num_bits >> 6

    def partial_bloom(t: pa.Table) -> pa.Table:
        bmp = np.zeros(words, dtype=np.uint64)
        if t.num_rows:
            valid = np.ones(t.num_rows, dtype=bool)
            for c in right_on:
                valid &= pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
            sub = t.filter(pa.array(valid)) if not valid.all() else t
            if sub.num_rows:
                _bloom_set(bmp, _key_hash64(sub, right_on),
                           num_bits, num_hashes)
        return pa.table({"bmp": pa.array([bmp.tobytes()], pa.binary())})

    def or_bloom(t: pa.Table) -> pa.Table:
        bmp = np.zeros(words, dtype=np.uint64)
        for buf in t["bmp"].to_pylist():
            bmp |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bmp": pa.array([bmp.tobytes()], pa.binary())})

    # Build side is small by assumption — materialize it once so the bitmap
    # build and the final exact join don't each re-run the right pipeline.
    right = right.materialize()
    from raycdc.shuffle import tree_reduce

    # Tree fan-in all the way: partial bitmaps OR-combine in
    # _BLOOM_FANIN-way reduce tasks and the driver fetches exactly ONE
    # bitmap row, instead of streaming blocks/FANIN megabyte rows through
    # iter_batches at large build-side block counts.
    partials = right.map_batches(partial_bloom, batch_format="pyarrow")
    final = tree_reduce(partials, or_bloom, fanin=_BLOOM_FANIN)
    agg = np.zeros(words, dtype=np.uint64)
    if final is not None and final.num_rows:
        agg |= np.frombuffer(final["bmp"][0].as_py(), dtype=np.uint64)
    bmp_ref = ray.put(agg)

    if auto_skip is not None and probe_sample > 0:
        sample_batches = list(left.limit(probe_sample).iter_batches(
            batch_size=None, batch_format="pyarrow"))
        sample = (pa.concat_tables(sample_batches, promote_options="default")
                  if sample_batches else None)
        if sample is not None and sample.num_rows:
            probe = _BloomProbe(agg, on, num_bits, num_hashes)
            survival = probe(sample).num_rows / sample.num_rows
            if survival > auto_skip:
                return hash_join(left, right, on=on, right_on=right_on,
                                 join_type="left_semi",
                                 num_partitions=num_partitions)

    # Pin the survivor lineage: a bitmap that drops EVERY left row (or an
    # empty left) yields zero blocks and no schema, which the exact join
    # below cannot consume.
    survivors = pin_schema(
        _bloom_stage(left, _BloomProbe, bmp_ref, on, num_bits, num_hashes,
                     concurrency), _pa_schema(left))
    return hash_join(survivors, right, on=on, right_on=right_on,
                     join_type="left_semi", num_partitions=num_partitions)


class _BloomMissKeep:
    """Anti-join complement of :class:`_BloomProbe`: keep rows that CANNOT
    match the build side — any null key component (SQL equality never
    matches null) or a bloom MISS (no false negatives, so a miss is a
    proof of non-membership). These rows are final output with no
    exchange."""

    def __init__(self, bmp_ref, on, num_bits, num_hashes):
        self.bmp = (ray.get(bmp_ref)
                    if isinstance(bmp_ref, ray.ObjectRef) else bmp_ref)
        self.on, self.num_bits, self.num_hashes = on, num_bits, num_hashes

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        valid = np.ones(t.num_rows, dtype=bool)
        for c in self.on:
            valid &= pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
        keep = ~valid  # null-key rows are definite non-matches
        if valid.any():
            sub = t.filter(pa.array(valid)) if not valid.all() else t
            hit = _bloom_test(self.bmp, _key_hash64(sub, self.on),
                              self.num_bits, self.num_hashes)
            keep[valid] = ~hit
        return t.filter(pa.array(keep))


def bloom_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: list[str],
    right_on: list[str] | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    num_partitions: int = 32,
    concurrency=None,
    auto_skip: float | None = 0.95,
    probe_sample: int = 8192,
) -> ray.data.Dataset:
    """EXACT left-anti join, bloom-accelerated: identical rows to
    ``hash_join(..., "left_anti")`` but only PROBABLE matches pay the
    keyed exchange.

    The anti join is where a bloom filter shines brightest: a bitmap MISS
    is a *proof* of non-membership (no false negatives), so a missing row
    is final output immediately — it never enters the exchange. Only hits
    (true matches plus ~0.2% false positives at the default sizing) run
    the exact anti join, which then removes the true matches and passes
    the false positives through. Null-key rows never match under SQL
    equality and stream straight to the output too.

    The left lineage executes TWICE (a keep branch and a hits branch) —
    for a pruned parquet read that is two scans, traded against an
    all-to-all exchange of the full left side; with a selective pattern
    (most left rows genuinely new — the incremental-ingest dedup shape)
    the hits branch is tiny and the trade wins by orders of magnitude.
    When the sampled hit rate exceeds ``auto_skip`` the bitmap is useless
    (almost everything pays the exchange anyway, plus the double scan), so
    the plain single-scan exact anti join runs instead — same rows either
    way.

    Size ``num_bits`` to the build side: ~10 bits per distinct key keeps
    false positives (= wasted exchange rows, never wrong rows) under 1%.
    """
    right_on = list(right_on or on)
    on = list(on)
    # round up to whole uint64 words: a non-multiple-of-64 num_bits yields
    # bit positions in a word past the allocated bitmap (IndexError in
    # np.bitwise_or.at / _bloom_test)
    num_bits = (num_bits + 63) & ~63
    words = num_bits >> 6

    def partial_bloom(t: pa.Table) -> pa.Table:
        bmp = np.zeros(words, dtype=np.uint64)
        if t.num_rows:
            valid = np.ones(t.num_rows, dtype=bool)
            for c in right_on:
                valid &= pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
            sub = t.filter(pa.array(valid)) if not valid.all() else t
            if sub.num_rows:
                _bloom_set(bmp, _key_hash64(sub, right_on),
                           num_bits, num_hashes)
        return pa.table({"bmp": pa.array([bmp.tobytes()], pa.binary())})

    def or_bloom(t: pa.Table) -> pa.Table:
        bmp = np.zeros(words, dtype=np.uint64)
        for buf in t["bmp"].to_pylist():
            bmp |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bmp": pa.array([bmp.tobytes()], pa.binary())})

    from raycdc.shuffle import tree_reduce

    right = right.materialize()
    partials = right.map_batches(partial_bloom, batch_format="pyarrow")
    final = tree_reduce(partials, or_bloom, fanin=_BLOOM_FANIN)
    agg = np.zeros(words, dtype=np.uint64)
    if final is not None and final.num_rows:
        agg |= np.frombuffer(final["bmp"][0].as_py(), dtype=np.uint64)
    bmp_ref = ray.put(agg)

    if auto_skip is not None and probe_sample > 0:
        sample_batches = list(left.limit(probe_sample).iter_batches(
            batch_size=None, batch_format="pyarrow"))
        sample = (pa.concat_tables(sample_batches, promote_options="default")
                  if sample_batches else None)
        if sample is not None and sample.num_rows:
            probe = _BloomProbe(agg, on, num_bits, num_hashes)
            survival = probe(sample).num_rows / sample.num_rows
            if survival > auto_skip:
                return hash_join(left, right, on=on, right_on=right_on,
                                 join_type="left_anti",
                                 num_partitions=num_partitions)

    # An empty (or fully-filtered) left side leaves both branches with
    # zero blocks and no schema — pin them with the left schema so the
    # downstream hash_join and consumers always see typed output.
    lschema = _pa_schema(left)
    keep = _bloom_stage(left, _BloomMissKeep, bmp_ref, on,
                        num_bits, num_hashes, concurrency)
    hits = pin_schema(
        _bloom_stage(left, _BloomProbe, bmp_ref, on, num_bits, num_hashes,
                     concurrency), lschema)
    anti_hits = hash_join(hits, right, on=on, right_on=right_on,
                          join_type="left_anti",
                          num_partitions=num_partitions)
    return pin_schema(keep, lschema).union(anti_hits)
