"""Manual hash shuffle: partition-by-column without a sort.

Ray Data's ``groupby`` implements grouping with a sort-based shuffle
(sample → sort → barrier → merge), which pays for an ordering that
partition-wise operators (upsert merge, hash dedup, bucketed joins) don't
need. This module provides the engine's partition-only exchange:

    blocks ── split task (num_returns=P, slices stay in the object store)
           ── one task per partition over its slices

Used by the CDC merge (`cdc/apply.py`) and the flattener's dedup
(`flatten.py`). Streaming: blocks flow into split tasks as the upstream map
phase produces them — no materialization barrier.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_PD_NULLABLE = {
    pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
    pa.bool_(): pd.BooleanDtype(),
}


def stable_types_mapper(t: pa.DataType):
    """``to_pandas`` types_mapper making int/bool columns null-safe for
    hashing: a null in a plain conversion flips int64 -> float64 (bool ->
    object), and ``hash_pandas_object(float64 2.0) != hash(int64 2)`` —
    so one null row in a batch silently changes EVERY key's hash in that
    batch relative to null-free batches, splitting equal keys across
    exchange partitions. Masked dtypes (Int64 etc.) hash non-null values
    identically to their plain counterparts."""
    return _PD_NULLABLE.get(t)


def stable_hash(data: "pa.Table | pa.Array | pa.ChunkedArray",
                cols: "list[str] | None" = None) -> np.ndarray:
    """Batch-layout-invariant row hash (uint64) of a table's columns or a
    single array: the one hash every cross-batch exchange / membership
    check must use (see :func:`stable_types_mapper` for why)."""
    if not isinstance(data, pa.Table):
        data = pa.table({"__c": data})
    elif cols is not None:
        data = data.select(list(cols))
    obj = data.to_pandas(types_mapper=stable_types_mapper)
    if data.num_columns == 1:
        obj = obj.iloc[:, 0]
    return pd.util.hash_pandas_object(obj, index=False).to_numpy()


def block_refs_of(ds: ray.data.Dataset):
    """Yield the dataset's block object refs (execution-triggering). The
    blocks are whatever format upstream produced — callers whose tasks
    assume Arrow tables must route the dataset through a
    ``map_batches(..., batch_format="pyarrow")`` first (pandas-block
    datasets, e.g. ``from_pandas``, otherwise crash the task)."""
    try:
        for bundle in ds.iter_internal_ref_bundles():
            yield from bundle.block_refs
    except AttributeError:  # pragma: no cover - older Ray
        yield from ds.to_arrow_refs()


_STATELESS_CACHE: dict = {}


def _stage_key_part(a):
    """VALUE-based cache-key component for one stateless_stage arg — never
    id(a): CPython reuses addresses after GC, so two stages built at
    different times (e.g. two broadcast joins on the same build ref with
    different ``on`` lists) could alias to one memo key and a worker would
    probe with the wrong stage's kernel — silently wrong output."""
    if hasattr(a, "hex"):  # ObjectRef: content identity
        try:
            return a.hex()
        except Exception:  # pragma: no cover
            pass
    if isinstance(a, (list, tuple)):
        return ("__seq",) + tuple(_stage_key_part(x) for x in a)
    if isinstance(a, dict):
        return ("__map",) + tuple(
            (_stage_key_part(k), _stage_key_part(v)) for k, v in a.items())
    if isinstance(a, np.ndarray):
        return ("__nd", a.dtype.str, a.shape, a.tobytes())
    try:
        hash(a)
        return a
    except TypeError:
        raise TypeError(
            f"stateless_stage arg of type {type(a).__name__} has no "
            "value-based cache key; pass it via ray.put() instead")


def stage_cache_key(cls, *args) -> tuple:
    """The per-worker memo key for ``stateless_stage(cls, *args)``."""
    return ((cls.__module__, cls.__qualname__)
            + tuple(_stage_key_part(a) for a in args))


def stateless_stage(cls, *args):
    """Wrap a CHEAP-INIT callable class (init = one node-local plasma fetch
    plus small prep) as a plain ``map_batches`` task function with a
    per-worker-process memo.

    Actor pools only pay off when ``__init__`` is expensive (index builds,
    model loads — keep those as fixed-size pools, see flatten.ExpandPaths);
    for cheap-init stages an autoscaling pool costs ~2 s of spin-up latency
    per stage with nothing to amortize (measured: bloom branches 2.5 s pool
    vs 0.55 s tasks). ObjectRef args stay refs in the closure — each worker
    process resolves them zero-copy from its local object store once."""
    key = stage_cache_key(cls, *args)

    def fn(t):
        inst = _STATELESS_CACHE.get(key)
        if inst is None:
            # LRU bound: evict the single OLDEST entry, never clear-all —
            # a clear wipes hot instances mid-stage and re-pays every init,
            # and each retained instance can pin plasma-backed state
            # (broadcast build tables, bloom bitmaps) in the worker
            while len(_STATELESS_CACHE) >= 8:
                _STATELESS_CACHE.pop(next(iter(_STATELESS_CACHE)))
            inst = _STATELESS_CACHE[key] = cls(*args)
        else:
            # refresh recency (dict preserves insertion order)
            _STATELESS_CACHE.pop(key, None)
            _STATELESS_CACHE[key] = inst
        return inst(t)

    return fn


def _block_refs_sized(ds: ray.data.Dataset):
    """Yield (block_ref, size_bytes_or_None) pairs — same execution
    semantics as :func:`block_refs_of`, plus the per-block byte size from
    Ray Data's block metadata when available."""
    try:
        for bundle in ds.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                yield ref, getattr(meta, "size_bytes", None)
    except AttributeError:  # pragma: no cover - older Ray
        for ref in ds.to_arrow_refs():
            yield ref, None


def lazy_schema(ds: ray.data.Dataset):
    """Zero-arg callable deriving a pa.Schema from ``ds`` — for
    partition_map's ``empty_schema``: evaluated only when every partition
    came up empty, so the (possibly execution-triggering) ``ds.schema()``
    is never paid on the happy path. Returns None when no schema is
    derivable (fully empty upstream)."""

    def get():
        s = ds.schema()
        if s is None:
            return None
        return pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])

    return get


# Blocks routed per split task: bounds the driver's object-ref count at
# blocks/CHUNK × P instead of blocks × P (same chunking as
# cdc/apply._partitioned_merge) while each split stays one vectorized pass.
_SPLIT_CHUNK = 4

# Below this total input size the whole exchange collapses to ONE task that
# splits locally and applies fn per partition — identical per-partition
# inputs (stable pid sort preserves block row order), but no split stage and
# no P-task scheduling round. Small keyed exchanges are pure fixed latency
# at sf0.1 scale (a P=16 exchange over 2 MB pays ~20 task round-trips for
# microseconds of work); at real scale the threshold never triggers.
# Sizes come from Ray Data's block metadata and are summed WHILE streaming:
# the standard paths start routing as soon as the running total crosses the
# threshold, so no materialization barrier is introduced for large inputs.
# 8 MB, not bigger: the one task also SERIALIZES fn — a 16-way distinct
# over a 14 MB input measured ~0.5 s slower serialized than exchanged,
# while the fixed-latency win on truly tiny exchanges is already captured.
_SMALL_EXCHANGE_BYTES = 8 << 20

# Above this partition count the exchange goes two-level (√P super-partition
# routing): single-level driver refs grow as (blocks/CHUNK) × P, which at the
# north-star's 65,536 partitions × 10^5 blocks is ~10^9 refs on one driver;
# the two-level plan bounds it at ~2 × (blocks/CHUNK) × √P (VERDICT r4 #7).
_TWO_LEVEL_MIN_PARTITIONS = 1 << 10

# Observability for tests/audits: the most recent partition_map exchange
# plan — level, super-group shape, and how many split-output refs the
# driver held. Overwritten per call; read it immediately after.
last_exchange_stats: dict = {}


@ray.remote
def _split_by_column(col: str, num_partitions: int,
                     drop_col: bool, *blocks: pa.Table,
                     div: int = 1, offset: int = 0) -> tuple:
    """Split a chunk of blocks by an int64 partition-id column; one return
    object per routing slot. The routing key is ``col // div - offset`` and
    must land in [0, num_partitions): ``div=1, offset=0`` (default) is the
    plain single-level split over pid values; the two-level exchange routes
    level 1 with ``div=G`` (pid → super-group) and level 2 with
    ``offset=s*G`` (rebase a super-group's pids to its local slots)."""
    live = [b for b in blocks
            if b is not None and b.num_rows and col in b.column_names]
    # Ray Data can emit schema-less empty blocks (e.g. a union branch
    # whose map produced no rows); nothing to route for those.
    if not live:
        return tuple([None] * num_partitions)
    block = live[0] if len(live) == 1 else \
        pa.concat_tables(live, promote_options="default")
    pids = block[col].to_numpy(zero_copy_only=False).astype(np.int64)
    if div != 1:
        pids = pids // div
    if offset:
        pids = pids - offset
    order = np.argsort(pids, kind="stable")
    sorted_block = block.take(pa.array(order))
    if drop_col:
        sorted_block = sorted_block.drop_columns([col])
    pids = pids[order]
    bounds = np.nonzero(np.diff(pids))[0] + 1
    starts = np.concatenate([[0], bounds, [len(pids)]]).astype(np.int64)
    out: list = [None] * num_partitions
    for i in range(len(starts) - 1):
        lo, hi = int(starts[i]), int(starts[i + 1])
        if hi > lo:
            out[int(pids[lo])] = sorted_block.slice(lo, hi - lo)
    return tuple(out)


@ray.remote
def _reduce_tables(fn: Callable[[pa.Table], pa.Table], *tables):
    """Tree-reduce inner node: concat a fan-in of partial tables and
    re-combine. ``fn`` must be associative over row-concatenation (and
    tolerate already-combined input — inner nodes feed inner nodes)."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return None
    return fn(pa.concat_tables(live, promote_options="default"))


def tree_reduce(ds: ray.data.Dataset,
                combine: Callable[[pa.Table], pa.Table], *,
                fanin: int = 64) -> "pa.Table | None":
    """Reduce a Dataset of mergeable partial tables (sketches, summaries,
    partial aggregates) to ONE table without driver-side concat: layers of
    remote tasks each combine ≤ ``fanin`` inputs, so the driver holds only
    object refs (blocks/fanin per layer) and the single bounded result.
    ``combine`` must be associative and idempotent on combined output.
    Returns None when the dataset has no blocks."""
    refs = list(block_refs_of(ds))
    if not refs:
        return None
    if len(refs) == 1:
        # still apply the combiner exactly once (a lone leaf block is a
        # partial, not a final result)
        refs = [_reduce_tables.remote(combine, refs[0])]
    while len(refs) > 1:
        refs = [_reduce_tables.remote(combine, *refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return ray.get(refs[0])


# Output blocks emitted by the small-path task: ONE output block would
# serialize every downstream map stage into a single task (measured: the
# sf0.1 DAG flatten regressed 4.8 -> 9.2 s when its distinct's output
# collapsed to one block); spreading the per-partition outputs over up to
# this many blocks keeps downstream parallelism.
_SMALL_PATH_OUT_BLOCKS = 8


@ray.remote
def _partition_all_task(fn: Callable[[pa.Table], pa.Table], col: str,
                        drop_col: bool, out_slots: int, *blocks):
    """Small-exchange fast path: split by the partition column locally and
    apply ``fn`` once per non-empty partition — the exact per-partition
    inputs of the split + per-pid-task plan (stable sort keeps block row
    order within a pid), in one task. Returns ``out_slots`` output tables
    (per-partition outputs round-robined over the slots) followed by their
    ``out_slots`` row counts."""
    live = [b for b in blocks
            if b is not None and b.num_rows and col in b.column_names]
    if not live:
        return (None,) * out_slots + (0,) * out_slots
    t = live[0] if len(live) == 1 else \
        pa.concat_tables(live, promote_options="default")
    pids = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pids, kind="stable")
    st = t.take(pa.array(order))
    if drop_col:
        st = st.drop_columns([col])
    spids = pids[order]
    bounds = np.nonzero(np.diff(spids))[0] + 1
    starts = np.concatenate([[0], bounds, [len(spids)]]).astype(np.int64)
    slots: list = [[] for _ in range(out_slots)]
    j = 0
    for i in range(len(starts) - 1):
        lo, hi = int(starts[i]), int(starts[i + 1])
        if hi > lo:
            r = fn(st.slice(lo, hi - lo))
            if r is not None and r.num_rows:
                slots[j % out_slots].append(r)
                j += 1
    tables = [
        (s[0] if len(s) == 1
         else pa.concat_tables(s, promote_options="default")) if s else None
        for s in slots]
    return tuple(tables) + tuple(
        tb.num_rows if tb is not None else 0 for tb in tables)


@ray.remote(num_returns=2)
def _partition_task(fn: Callable[[pa.Table], pa.Table], pid: int, *slices):
    """Returns (output_table, row_count): the driver reads only the cheap
    count to decide which table refs feed the result Dataset."""
    tables = [s for s in slices if s is not None and s.num_rows]
    if not tables:
        return None, 0
    out = fn(pa.concat_tables(tables, promote_options="default"))
    return out, out.num_rows


def partition_map(
    ds: ray.data.Dataset,
    partition_col: str,
    num_partitions: int,
    fn: Callable[[pa.Table], pa.Table],
    *,
    drop_partition_col: bool = True,
    empty_schema=None,
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by an existing int partition-id column and apply
    ``fn`` once per partition (the partition's rows concatenated into one
    table). Returns a Dataset of fn's outputs. No sort, no barrier between
    the upstream map phase and the split stage. Above
    ``_TWO_LEVEL_MIN_PARTITIONS`` the exchange routes through √P
    super-partitions first (blocks → super-group slices → final slots), so
    the driver's split-output ref count grows as blocks × √P, not
    blocks × P."""
    import itertools

    table_refs, count_refs = [], []
    last_exchange_stats.clear()

    def fn_dropping(t: pa.Table) -> pa.Table:
        if drop_partition_col and partition_col in t.column_names:
            t = t.drop_columns([partition_col])
        return fn(t)

    # Streaming size probe: accumulate refs while the metadata byte total
    # stays under the small-exchange threshold. Crossing it (or missing
    # metadata) commits to the standard split plan with zero added barrier —
    # the backlog flushes into the first split chunks and the rest streams.
    sized = _block_refs_sized(ds)
    pending: list = []
    total = 0
    small = True
    for ref, size in sized:
        pending.append(ref)
        if size is None:
            small = False
            break
        total += size
        if total > _SMALL_EXCHANGE_BYTES:
            small = False
            break
    blocks_iter = iter(pending) if small else \
        itertools.chain(pending, (r for r, _ in sized))

    if num_partitions == 1:
        # degenerate single partition: with num_returns=1 Ray would hand
        # back one ref to the whole 1-tuple, so skip the split stage and
        # route every block straight to the one partition task
        blocks = list(blocks_iter)
        tref, cref = _partition_task.remote(fn_dropping, 0, *blocks)
        table_refs.append(tref)
        count_refs.append(cref)
        last_exchange_stats.update(level="direct", split_refs=0)
    elif small:
        # whole input fits the small-exchange budget: one task splits
        # locally and applies fn per partition — same per-partition inputs,
        # no split stage, no P-task scheduling round. Output spreads over
        # up to _SMALL_PATH_OUT_BLOCKS blocks for downstream parallelism.
        k = max(1, min(num_partitions, _SMALL_PATH_OUT_BLOCKS))
        refs = _partition_all_task.options(num_returns=2 * k).remote(
            fn, partition_col, drop_partition_col, k, *pending)
        table_refs.extend(refs[:k])
        count_refs.extend(refs[k:])
        last_exchange_stats.update(level="small", split_refs=0,
                                   small_bytes=total)
    elif num_partitions > _TWO_LEVEL_MIN_PARTITIONS:
        # two-level exchange: level 1 routes each chunk of blocks to
        # ceil(√P) super-groups (pid // G); level 2 splits a super-group's
        # slices to its G final slots (pid - s*G). A level-2 task ingests
        # up to n_supers slices — each holds ~1/n_supers of a level-1
        # chunk, so its input volume matches a level-1 task's.
        g_size = int(np.ceil(np.sqrt(num_partitions)))
        n_supers = -(-num_partitions // g_size)
        split1 = _split_by_column.options(num_returns=n_supers)
        super_chunks: list = []
        chunk: list = []

        def flush1():
            if chunk:
                super_chunks.append(split1.remote(
                    partition_col, n_supers, False, *chunk, div=g_size))
                chunk.clear()

        for block_ref in blocks_iter:
            chunk.append(block_ref)
            if len(chunk) >= _SPLIT_CHUNK:
                flush1()
        flush1()
        split_refs = len(super_chunks) * n_supers
        l2_chunk = max(_SPLIT_CHUNK, n_supers)
        for s in range(n_supers):
            lo = s * g_size
            gs = min(g_size, num_partitions - lo)
            slices = [r[s] for r in super_chunks]
            if gs == 1:
                # same num_returns=1 degeneracy as the P == 1 fast path
                tref, cref = _partition_task.remote(fn_dropping, lo, *slices)
                table_refs.append(tref)
                count_refs.append(cref)
                continue
            split2 = _split_by_column.options(num_returns=gs)
            sub = [split2.remote(partition_col, gs, drop_partition_col,
                                 *slices[i:i + l2_chunk], offset=lo)
                   for i in range(0, len(slices), l2_chunk)]
            split_refs += len(sub) * gs
            for g in range(gs):
                parts = [r[g] for r in sub]
                tref, cref = _partition_task.remote(fn, lo + g, *parts)
                table_refs.append(tref)
                count_refs.append(cref)
        last_exchange_stats.update(level="two", supers=n_supers,
                                   group=g_size, split_refs=split_refs)
    else:
        split = _split_by_column.options(num_returns=num_partitions)
        per_chunk = []
        chunk = []

        def flush():
            if chunk:
                per_chunk.append(split.remote(
                    partition_col, num_partitions, drop_partition_col,
                    *chunk))
                chunk.clear()

        for block_ref in blocks_iter:
            chunk.append(block_ref)
            if len(chunk) >= _SPLIT_CHUNK:
                flush()
        flush()
        for pid in range(num_partitions):
            slices = [r[pid] for r in per_chunk]
            tref, cref = _partition_task.remote(fn, pid, *slices)
            table_refs.append(tref)
            count_refs.append(cref)
        last_exchange_stats.update(
            level="one", split_refs=len(per_chunk) * num_partitions)
    counts = ray.get(count_refs)
    live = [r for r, n in zip(table_refs, counts) if n]
    if not live:
        if empty_schema is not None:
            # may be a pa.Schema or a zero-arg callable returning one —
            # callables defer (possibly execution-triggering) schema
            # derivation to this corner case only
            schema = empty_schema() if callable(empty_schema) else empty_schema
            if schema is not None:
                return ray.data.from_arrow(schema.empty_table())
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(live)
