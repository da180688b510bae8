"""Global sort (ORDER BY) and the ordered / resumable Parquet writer.

Ray Data's ``Dataset.sort`` exists, but this engine's exchanges all ride
the partition-only shuffle (``raycdc.shuffle``), and a global sort is the
one operator that genuinely needs RANGE partitioning rather than hash
partitioning. The implementation is the classic sample-sort:

    1. sample the primary sort key from every block (bounded: at most
       ``sample_per_block`` values per block leave the task, and the
       per-block samples merge through a fan-in tree that re-samples past
       ``_SAMPLE_CAP`` values — the driver holds at most that many key
       values no matter the block count, never the data),
    2. derive P-1 range boundaries from the sample quantiles,
    3. stateless ``map_batches`` appends a partition id via one vectorized
       ``np.searchsorted`` against the (tiny, closure-captured) boundaries,
    4. one task per range partition sorts its rows with ONE
       ``pc.sort_indices`` call (all sort keys, proper null placement),
    5. the result Dataset's blocks are in partition order, so block order
       IS global order; an optional ``rank_col`` materializes the global
       1-based position (offsets come from the per-partition row counts
       the exchange already returns to the driver — integer metadata,
       not data).

Scale notes (the partitioning assumptions, per the custom-operator
contract):

- Rows sharing one primary-key value always land in the same partition
  (the searchsorted side is fixed), so a single pathologically hot key
  bounds that partition's size — exactly the skew profile of hash
  exchanges; boundaries adapt to everything else because they come from
  data samples.
- The sample pass reads ONLY the primary key column (column-pruned
  ``select_columns``) and is the price of range partitioning; everything
  else is one partition-only exchange, same cost as a hash shuffle.
- Ties on the primary key are broken WITHIN a partition by the remaining
  sort keys, so multi-key sorts stay total without multi-key boundaries.

Reference parity note: the reference plugin (CDAP HierarchyToRelational)
specifies UNORDERED output (SURVEY.md §2) — nothing is owed there. Global
sort belongs to the training-data operator set (curriculum ordering,
ordered lake layouts for range-pruned reads).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from raycdc.shuffle import _split_by_column, block_refs_of as _block_refs_of

_PID = "__raycdc_sort_pid"
_SAMPLE_CAP = 1 << 16  # max boundary-sample values the driver ever holds


def _key_to_numpy(col: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """(values, null_mask) for the primary sort key, as numpy arrays whose
    dtype compares vectorized in C: timestamps/dates -> int64 us, numerics
    stay numeric, strings -> fixed-width unicode (object-dtype numpy would
    fall back to per-element Python compares in searchsorted)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    if (pa.types.is_timestamp(arr.type) or pa.types.is_date(arr.type)
            or pa.types.is_time(arr.type)):
        if pa.types.is_date32(arr.type) or pa.types.is_time32(arr.type):
            # Arrow has no direct date32/time32 → int64 cast kernel
            arr = arr.cast(pa.int32())
        arr = arr.cast(pa.int64())
    arr = pc.fill_null(arr, _null_filler(arr.type))
    vals = arr.to_numpy(zero_copy_only=False)
    if vals.dtype == object and (pa.types.is_string(arr.type)
                                 or pa.types.is_large_string(arr.type)):
        vals = vals.astype("U")
    # other object-dtype keys (binary → bytes, decimal → Decimal) stay
    # object: their Python compare order matches Arrow's sort order, so
    # routing agrees with the in-partition pc.sort_indices. astype("U")
    # here would route by str() — Decimal('9') > Decimal('100') as text —
    # silently breaking the global order.
    return vals, null_mask


def _null_filler(t: pa.DataType):
    """Placeholder for null key slots (masked out of routing anyway)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        return b"" if not pa.types.is_fixed_size_binary(t) \
            else b"\x00" * t.byte_width
    return 0


def _sample_boundaries(ds: ray.data.Dataset, key: str, num_partitions: int,
                       sample_per_block: int) -> np.ndarray:
    """P-1 range cut points for the primary key, from a bounded per-block
    sample. Nulls never become boundaries (they route to the last
    partition explicitly)."""

    def sample(t: pa.Table) -> pa.Table:
        col = t[key].combine_chunks()
        col = col.drop_null()
        n = len(col)
        if n > sample_per_block:
            # deterministic evenly-spaced sample (input order): cheap and
            # unbiased enough for cut points; no RNG -> reproducible plans
            idx = np.linspace(0, n - 1, sample_per_block).astype(np.int64)
            col = col.take(pa.array(idx))
        return pa.table({key: col})

    # fan-in tree caps the driver's sample at _SAMPLE_CAP values no matter
    # the block count: a node holding more re-samples evenly from its
    # SORTED concat (sample-of-samples keeps the quantile structure; at
    # fewer than _SAMPLE_CAP total samples no node ever re-samples, so
    # small jobs see byte-identical boundaries to a flat concat)
    cap = max(_SAMPLE_CAP, (num_partitions + 1) * 4)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows <= cap:
            return t
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")])
        pick = np.linspace(0, t.num_rows - 1, cap).astype(np.int64)
        return t.take(idx.take(pa.array(pick)))

    from raycdc.shuffle import tree_reduce

    sampled = ds.select_columns([key]).map_batches(
        sample, batch_format="pyarrow")
    tbl = tree_reduce(sampled, combine)
    if tbl is None or tbl.num_rows == 0:
        return np.array([])
    vals, _ = _key_to_numpy(tbl[key])
    if vals.size == 0:
        return vals
    vals = np.sort(vals, kind="stable")
    cuts = np.linspace(0, vals.size - 1, num_partitions + 1)[1:-1]
    return vals[cuts.astype(np.int64)]


@ray.remote(num_returns=2)
def _sort_partition(sort_keys: list, null_placement: str, pid: int, *slices):
    tables = [s for s in slices if s is not None and s.num_rows]
    if not tables:
        return None, 0
    t = pa.concat_tables(tables, promote_options="default")
    idx = pc.sort_indices(
        t, sort_keys=sort_keys, null_placement=null_placement)
    out = t.take(idx)
    return out, out.num_rows


@ray.remote
def _append_rank(t: pa.Table, rank_col: str, offset: int) -> pa.Table:
    ranks = pa.array(np.arange(offset + 1, offset + 1 + t.num_rows,
                               dtype=np.int64))
    return t.append_column(rank_col, ranks)


@dataclass
class SortedDataset:
    """A globally ordered result: ``dataset``'s blocks are in key order
    (block i precedes block i+1). ``partition_rows`` is the per-range row
    count (driver-side integer metadata, used for rank offsets and the
    ordered writer's file naming)."""
    dataset: ray.data.Dataset
    partition_rows: list

    def to_table(self) -> pa.Table:
        """Concatenate IN ORDER (small results / tests only)."""
        batches = list(self.dataset.iter_batches(
            batch_size=None, batch_format="pyarrow"))
        if not batches:
            sch = self.dataset.schema()
            return pa.schema(
                [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
            ).empty_table() if sch is not None else pa.table({})
        return pa.concat_tables(batches, promote_options="default")


def sort_dataset(
    ds: ray.data.Dataset,
    keys: "list[str] | list[tuple[str, str]]",
    *,
    num_partitions: int = 64,
    sample_per_block: int = 256,
    rank_col: str | None = None,
    nulls_last: bool = True,
) -> SortedDataset:
    """Global ORDER BY over ``keys`` (each a column name or
    ``(name, "ascending"|"descending")``; bare names sort ascending).

    Range-partitions on the FIRST key, sorts each partition once with all
    keys, and returns the partitions in order — so iterating the result's
    blocks yields a total order, matching::

        SELECT * FROM ds ORDER BY k1 [DESC], k2 [DESC], ...
        -- nulls placed per ``nulls_last`` (DuckDB default: last)

    ``rank_col`` additionally appends the global 1-based position
    (``row_number() OVER (ORDER BY ...)``) — this makes the otherwise
    order-blind hash compare of the external driver order-SENSITIVE, and
    is the lake-layout primitive (ordered ids for range-pruned reads).

    Keys must form a total order for the rank to be deterministic (pass a
    unique tiebreak column last, as every oracle-checked caller does).
    """
    norm: list[tuple[str, str]] = []
    for k in keys:
        if isinstance(k, str):
            norm.append((k, "ascending"))
        else:
            name, order = k
            if order not in ("ascending", "descending"):
                raise ValueError(f"sort order must be ascending|descending, "
                                 f"got {order!r}")
            norm.append((name, order))
    if not norm:
        raise ValueError("sort_dataset needs at least one key")
    primary, primary_order = norm[0]
    descending = primary_order == "descending"
    null_placement = "at_end" if nulls_last else "at_start"

    bounds = _sample_boundaries(ds, primary, num_partitions,
                                sample_per_block)
    nparts = int(bounds.size) + 1

    def route(t: pa.Table) -> pa.Table:
        vals, null_mask = _key_to_numpy(t[primary])
        if bounds.size:
            # string boundaries vs string batch: align unicode widths so
            # numpy compares whole values, not truncated prefixes
            b = bounds
            if vals.dtype.kind == "U" and b.dtype.kind == "U":
                width = max(vals.dtype.itemsize, b.dtype.itemsize) // 4
                vals = vals.astype(f"U{width}")
                b = b.astype(f"U{width}")
            pid = np.searchsorted(b, vals, side="right").astype(np.int64)
            if descending:
                pid = (nparts - 1) - pid
        else:
            pid = np.zeros(t.num_rows, dtype=np.int64)
        # nulls go wherever null_placement puts them globally
        null_pid = (nparts - 1) if nulls_last else 0
        pid[null_mask] = null_pid
        return t.append_column(_PID, pa.array(pid))

    table_refs, count_refs = [], []
    if nparts == 1:
        # degenerate single range: no routing column, no split stage —
        # every block feeds the one sort task directly. The identity
        # map_batches guarantees Arrow blocks (from_pandas datasets hand
        # out pandas blocks, which _sort_partition can't concat).
        arrow_ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        blocks = list(_block_refs_of(arrow_ds))
        tref, cref = _sort_partition.remote(norm, null_placement, 0, *blocks)
        table_refs.append(tref)
        count_refs.append(cref)
    else:
        routed = ds.map_batches(route, batch_format="pyarrow")
        split = _split_by_column.options(num_returns=nparts)
        refs = list(_block_refs_of(routed))
        # 4 blocks per split task, like shuffle.partition_map
        per_block = [split.remote(_PID, nparts, True, *refs[i:i + 4])
                     for i in range(0, len(refs), 4)]
        for pid in range(nparts):
            slices = [r[pid] for r in per_block]
            tref, cref = _sort_partition.remote(
                norm, null_placement, pid, *slices)
            table_refs.append(tref)
            count_refs.append(cref)
    counts = ray.get(count_refs)

    if rank_col is not None:
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        table_refs = [
            _append_rank.remote(tref, rank_col, int(off)) if n else tref
            for tref, n, off in zip(table_refs, counts, offsets)]

    live = [r for r, n in zip(table_refs, counts) if n]
    if not live:
        sch = ds.schema()
        if sch is not None:
            fields = [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
            if rank_col is not None:
                fields.append(pa.field(rank_col, pa.int64()))
            return SortedDataset(
                ray.data.from_arrow(pa.schema(fields).empty_table()), [])
        return SortedDataset(ray.data.from_items([]), [])
    return SortedDataset(ray.data.from_arrow_refs(live),
                         [int(n) for n in counts if n])


@ray.remote
def _write_part(t: pa.Table, path: str, rows_expected: int) -> dict:
    """Idempotent ordered part write: short-circuit when a finished file
    with the right row count already exists (resume path), else write to a
    temp name and atomically rename — a crashed writer never leaves a
    half-file a resume would trust."""
    if os.path.exists(path):
        try:
            if pq.read_metadata(path).num_rows == rows_expected:
                return {"file": path, "rows": rows_expected, "skipped": True}
        except Exception:
            pass  # corrupt partial from a crash mid-rename window: rewrite
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp, row_group_size=64 * 1024)
    os.replace(tmp, path)
    return {"file": path, "rows": rows_expected, "skipped": False}


def read_sorted_parquet(in_dir: str, key: str, *, lo=None, hi=None,
                        columns: "list[str] | None" = None
                        ) -> ray.data.Dataset:
    """Range-pruned read of a :func:`write_sorted_parquet` lake: only part
    files whose ``key`` min/max stats intersect ``[lo, hi]`` are opened
    (footer metadata only for the rest), then a residual row filter trims
    the two boundary parts. This is WHY the ordered layout exists — a
    point/range lookup over 100 TB touches O(range) files, not O(lake).

    The returned Dataset's BLOCK order is not the key order: Ray's
    streaming executor emits blocks in completion order
    (``preserve_order=False`` default). The ordered layout is a pruning
    contract; a consumer that needs a totally ordered STREAM must set
    ``DataContext.execution_options.preserve_order`` or re-sort.

    ``lo``/``hi`` are inclusive; ``None`` leaves that side unbounded.
    Nulls never match a bounded range (SQL comparison semantics).
    """
    if columns is not None and key not in columns and (
            lo is not None or hi is not None):
        raise ValueError(f"columns must include the sort key {key!r} when "
                         f"a range bound is set (residual filter needs it)")
    # accept Arrow scalars; parquet stats decode to Python values
    if isinstance(lo, pa.Scalar):
        lo = lo.as_py()
    if isinstance(hi, pa.Scalar):
        hi = hi.as_py()
    stats = _part_key_stats(in_dir, key)
    files = [f for f, _, _ in stats]
    keep = []
    for f, f_min, f_max in stats:
        if f_min is not None:  # unknown range: cannot prune, keep
            if lo is not None and f_max < lo:
                continue
            if hi is not None and f_min > hi:
                continue
        keep.append(f)
    if not keep:
        schema = pq.read_schema(files[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    ds = ray.data.read_parquet(keep, columns=columns)

    if lo is None and hi is None:
        return ds

    def residual(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        if lo is not None:
            mask = pc.and_kleene(mask, pc.greater_equal(t[key], lo))
        if hi is not None:
            mask = pc.and_kleene(mask, pc.less_equal(t[key], hi))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(residual, batch_format="pyarrow")


def write_sorted_parquet(sorted_ds: SortedDataset, out_dir: str) -> list:
    """Write a :func:`sort_dataset` result as ``part-00000.parquet``,
    ``part-00001.parquet``, ... where lexicographic file order IS global
    row order (the ordered-lake layout: readers range-prune by file).

    One file per non-empty range partition, written in parallel, each
    atomically (temp + ``os.replace``) and idempotently (a finished part
    with the expected row count is skipped) — so a failed run resumes by
    re-invoking and only rewrites missing parts. Returns the manifest
    (one dict per part, in order).
    """
    os.makedirs(out_dir, exist_ok=True)
    refs = []
    blocks = list(_block_refs_of(sorted_ds.dataset))
    rows = sorted_ds.partition_rows
    if len(blocks) != len(rows):  # pragma: no cover - defensive
        raise RuntimeError(
            f"ordered writer needs one block per partition "
            f"({len(blocks)} blocks vs {len(rows)} partitions); was the "
            f"dataset transformed after sort_dataset?")
    for i, (ref, n) in enumerate(zip(blocks, rows)):
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        refs.append(_write_part.remote(ref, path, n))
    out = ray.get(refs)
    # remove stale parts beyond this run's count: a prior write with MORE
    # partitions would otherwise leave part-0000N files that
    # read_sorted_parquet globs in, silently breaking the file-order-IS-
    # row-order contract (previous runs always wrote contiguously from 0)
    i = len(rows)
    while True:
        stale = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if not os.path.exists(stale):
            break
        os.unlink(stale)
        i += 1
    return out


def zorder_bit_terms(cols: "list[str]", bits: int) -> "list[str]":
    """The Morton-interleave as SQL bit terms — OR of
    ``((col >> i) & 1) << (d*i + j)`` over every (bit, dim). Shared with
    the oracle SQL so the engine expression and the SQL expression are
    generated from ONE place (zero drift)."""
    d = len(cols)
    return [f"((({c} >> {i}) & 1) << {d * i + j})"
            for i in range(bits) for j, c in enumerate(cols)]


def zorder_value(ds: ray.data.Dataset, cols: "list[str]",
                 out_col: str = "zval", bits: int = 21) -> ray.data.Dataset:
    """Morton/Z-order clustering key over 2-3 integer columns: interleave
    the low ``bits`` bits of each (values are masked to that width; null
    in ANY dimension -> null key, the SQL bit-op semantics). Sorting the
    lake by ``zval`` (then :func:`write_sorted_parquet`) co-locates rows
    that are close in EVERY interleaved dimension, so min/max part pruning
    answers range predicates on ANY of them — a row-major sort only prunes
    its leading column. A rectangle query maps to the z-interval
    ``[z(lo_1..lo_d), z(hi_1..hi_d)]`` (Morton codes are monotone per
    coordinate) read via :func:`read_sorted_parquet` plus a residual
    rectangle filter.

    Exact bit arithmetic, vectorized (``d*bits`` shift/or passes per
    batch, no shuffle); ``d * bits`` must fit in 63 bits so the key stays
    a non-negative int64 everywhere (DuckDB BIGINT has no unsigned).
    Negative inputs raise — two's-complement low bits would interleave
    meaninglessly and SQL ``>>`` semantics diverge.
    """
    from raycdc.joins import _pa_schema

    d = len(cols)
    if not 2 <= d <= 3:
        raise ValueError(f"zorder_value interleaves 2-3 columns, got {d}")
    if bits < 1 or d * bits > 63:
        raise ValueError(f"need 1 <= bits and {d}*bits <= 63, got {bits}")
    mask = np.uint64((1 << bits) - 1)
    # typed empty for Ray's zero-column degraded blocks: echoing them
    # unchanged would make this stage emit two schemas and crash the
    # downstream sort's key access (CLAUDE.md invariant)
    empty = pa.schema(list(_pa_schema(ds))
                      + [pa.field(out_col, pa.int64())]).empty_table()

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and any(c not in t.column_names for c in cols):
            return empty
        n = t.num_rows
        z = np.zeros(n, dtype=np.uint64)
        valid = np.ones(n, dtype=bool)
        for j, c in enumerate(cols):
            col = pc.cast(t[c], pa.int64())
            valid &= pc.is_valid(col).to_numpy(zero_copy_only=False)
            v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
            if n and v[valid].size and v[valid].min() < 0:
                raise ValueError(
                    f"zorder_value requires non-negative values in {c!r}")
            v = v.astype(np.uint64) & mask
            for i in range(bits):
                z |= ((v >> np.uint64(i)) & np.uint64(1)) << np.uint64(
                    d * i + j)
        return t.append_column(
            out_col, pa.array(z.astype(np.int64), pa.int64(), mask=~valid))

    return ds.map_batches(fn, batch_format="pyarrow")


def _part_key_stats(in_dir: str, key: str):
    """(file, min, max) per part of a write_sorted_parquet lake, from
    footer metadata only — the ONE stats scan behind both the pruned
    reader and the co-range join. ``(file, None, None)`` means UNKNOWN
    range (any row group without min/max stats: an all-null-key run,
    stats disabled, oversized values): callers must treat unknown as
    "may contain anything" — read_sorted_parquet keeps the file,
    ordered_lake_join overlaps it with everything. Skipping it instead
    silently loses rows (a nulls_last lake puts a >=64k-row null run in
    the LAST part next to real top-range keys)."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(in_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {in_dir}")
    out = []
    for f in files:
        md = pq.read_metadata(f)
        ci = md.schema.to_arrow_schema().names.index(key)
        f_min = f_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                f_min = f_max = None
                break
            f_min = st.min if f_min is None else min(f_min, st.min)
            f_max = st.max if f_max is None else max(f_max, st.max)
        out.append((f, f_min, f_max))
    return out


@ray.remote
def _merge_join_task(left_file, right_files, right_schema_file, left_key,
                     right_key, columns_left, columns_right, suffixes,
                     join_type):
    """One left part joined against its key-overlapping right parts —
    one local Acero join, no exchange (the co-range ownership argument
    lives in ordered_lake_join's docstring)."""
    lt = pq.read_table(left_file, columns=columns_left)
    if right_files:
        rt = pa.concat_tables(
            [pq.read_table(f, columns=columns_right) for f in right_files])
    else:
        # no overlapping right part: inner/semi emit nothing, outer/anti
        # keep every left row — a typed empty right side reuses Acero's
        # semantics for all of them (schema from any part's footer)
        full = pq.read_schema(right_schema_file)
        rt = pa.schema([full.field(c) for c in columns_right]).empty_table()
    lt = lt.rename_columns(
        [c if c == left_key else c + suffixes[0] for c in lt.column_names])
    rt = rt.rename_columns(
        [c if c == right_key else c + suffixes[1] for c in rt.column_names])
    return lt.join(rt, keys=[left_key], right_keys=[right_key],
                   join_type=join_type)


def ordered_lake_join(
    left_dir: str,
    right_dir: str,
    *,
    left_key: str,
    right_key: str,
    columns_left: "list[str] | None" = None,
    columns_right: "list[str] | None" = None,
    suffixes: "tuple[str, str]" = ("_l", "_r"),
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Zero-exchange CO-RANGE merge join of two ordered lakes
    (:func:`write_sorted_parquet` layouts) on their sort keys — the
    range-layout sibling of `cdc.cojoin`'s hash-layout join: because both
    sides are globally range-partitioned on the key, partition overlap is
    computable from footer min/max stats alone, and the all-to-all
    exchange a generic join pays disappears.

    Plan: one task per LEFT part, joined against the right parts whose
    key range overlaps it (footer stats only for everything else).
    Soundness: every left row belongs to exactly ONE task (its part), and
    a key occupies exactly ONE part per side (`sort_dataset` co-locates
    equal primary keys), so no output row can be produced twice and
    inner / left_outer / left_semi / left_anti are all exact. Right parts
    overlapping several left parts are read once per overlap — bounded by
    the range overlap ratio, ~1 for similarly-sized aligned lakes.

    Non-key output columns are suffixed per side (cojoin convention);
    the key appears once under ``left_key``. Null keys never match
    (Acero = SQL); nested payload columns must be excluded by the caller
    (the Acero invariant). Right/full outer would need unmatched-RIGHT
    ownership — route those through `raycdc.joins.hash_join`.
    """
    acero = {"inner": "inner", "left_outer": "left outer",
             "left_semi": "left semi", "left_anti": "left anti"}
    if join_type not in acero:
        raise ValueError(
            f"join_type must be one of {sorted(acero)} (right/full outer "
            "need unmatched-right ownership: use raycdc.joins.hash_join)")
    lstats = _part_key_stats(left_dir, left_key)
    rstats = _part_key_stats(right_dir, right_key)
    if columns_left is None:
        columns_left = pq.read_schema(lstats[0][0]).names
    if columns_right is None:
        columns_right = pq.read_schema(rstats[0][0]).names
    if left_key not in columns_left or right_key not in columns_right:
        raise ValueError("columns_* must include the join keys")

    refs = []
    for lf, lmin, lmax in lstats:
        # UNKNOWN ranges (None: null runs / missing stats) must be treated
        # as may-contain-anything: an unknown LEFT part joins every right
        # part; an unknown RIGHT part joins every left part. Extra reads,
        # never lost rows (null keys still never match inside the task).
        overlap = [rf for rf, rmin, rmax in rstats
                   if rmin is None or lmin is None
                   or not (rmax < lmin or rmin > lmax)]
        refs.append(_merge_join_task.remote(
            lf, overlap, rstats[0][0], left_key, right_key,
            list(columns_left), list(columns_right), tuple(suffixes),
            acero[join_type]))

    # every left part got a task (lstats is never empty), so refs is
    # non-empty and the result schema always comes from a real Acero join
    return ray.data.from_arrow_refs(refs)


def zorder_scalar(vals: "list[int]", bits: int = 21) -> int:
    """Morton-interleave one point (the scalar twin of zorder_value) —
    used to map a rectangle's corners to its z-interval."""
    d = len(vals)
    if not 2 <= d <= 3 or bits < 1 or d * bits > 63:
        raise ValueError("zorder_scalar: 2-3 dims, d*bits <= 63")
    z = 0
    for j, v in enumerate(vals):
        if v is None or v < 0:
            raise ValueError("zorder_scalar needs non-negative ints")
        v &= (1 << bits) - 1
        for i in range(bits):
            z |= ((v >> i) & 1) << (d * i + j)
    return z


def zorder_range_read(in_dir: str, *, cols: "list[str]",
                      lows: "list[int]", highs: "list[int]",
                      bits: int = 21, zval_col: str = "zval",
                      columns: "list[str] | None" = None
                      ) -> ray.data.Dataset:
    """Rectangle query over a z-ordered lake (a `zorder_value` →
    `sort_dataset` → `write_sorted_parquet` layout): the box
    ``lows[i] <= cols[i] <= highs[i]`` maps to ONE z-interval
    ``[z(lows), z(highs)]`` because Morton codes are monotone per
    coordinate, so the stat-pruned reader opens only the parts that
    interval touches on ANY dimension's predicate — then one exact
    per-dimension residual filter trims the Z-curve's excursions.
    ``bits`` must match the value used to build ``zval_col``.
    """
    if not (len(cols) == len(lows) == len(highs)):
        raise ValueError("cols/lows/highs must align")
    lo = zorder_scalar(list(lows), bits)
    hi = zorder_scalar(list(highs), bits)
    need = None if columns is None else sorted({*columns, *cols, zval_col})
    ds = read_sorted_parquet(in_dir, zval_col, lo=lo, hi=hi, columns=need)

    def rect(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t if columns is None else (
                t.select(columns) if all(c in t.column_names
                                         for c in columns) else t)
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        for c, lo_v, hi_v in zip(cols, lows, highs):
            mask = pc.and_kleene(mask, pc.greater_equal(t[c], lo_v))
            mask = pc.and_kleene(mask, pc.less_equal(t[c], hi_v))
        out = t.filter(pc.fill_null(mask, False))
        return out if columns is None else out.select(columns)

    return ds.map_batches(rect, batch_format="pyarrow")
