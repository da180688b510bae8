"""Edge-list hierarchy flattener (Oracle CONNECT BY semantics) on Ray Data.

Capability parity with the reference plugin's ``HierarchyFlattener``
(/root/reference src/main/java/io/cdap/plugin/spark/HierarchyFlattener.java),
re-architected for Ray Data rather than translated:

Reference dataflow (HierarchyFlattener.java:127-351): per level, a cluster-wide
left-outer self-join ``current.child == input.parent`` (line 274-278), a
conditional projection (239-272), a union accumulating levels (279), a driver
``take(1)`` emptiness probe per level (215, 394-398), and one final
``groupBy(parent, child, level)`` dedup shuffle (340-342). Cost: O(depth)
all-to-all shuffles.

This engine's primary strategy is **broadcast BFS**: the edge table is compiled
once into a CSR-style index (edges sorted by parent + a hash index of unique
parents), placed in the Ray object store, and every task expands its batch of
seed edges through *all* levels in a single vectorized pass — zero per-level
shuffles, no driver-side per-level probes. The only all-to-all exchange left is
the final multi-path dedup, and even that is skipped when the edge index proves
no node has two in-edges (a forest — no two same-level paths can converge).
For edge tables too large to broadcast, a **shuffle** strategy mirrors the
reference's per-level hash join using ``Dataset.join``.

Exact semantics reproduced (pinned by the reference's unit tests, see
SURVEY.md §2.1):

- every edge seeds a level-1 path, optionally restricted by ``start_with``
  (HierarchyFlattener.java:173, 353-374); self-edges and null-key edges are
  dropped from seeds (174-175: ``parent != child`` is null-rejecting)
- output rows are path-terminal edges: after an extension the new parent is
  the previous child (247-250)
- ``bottom`` is true iff the row's child has no outgoing edge (249-254 +
  the ``max(leaf)`` merge at 340-342)
- level = number of edges in the path; the dedup group key is
  ``(parent, child, level)`` so the same edge at different depths yields
  distinct rows (340)
- multi-path duplicates collapse to ``min(path)`` (332-334); data fields come
  from the matched (last) edge (256-259); connect-by-root fields from the
  first edge (183-185, 270-272). Where the reference uses nondeterministic
  ``first()`` we deterministically take values from the min-path row.
- exceeding ``max_depth`` with a non-leaf frontier raises (215-220).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from raycdc.expr import compile_predicate
from raycdc.joins import hash_join
from raycdc.schema import FlattenConfig, derive_output_schema, validate_config

_BUCKET_COL = "__rcdc_bucket"
_PC_COL = "__rcdc_pc"
_CC_COL = "__rcdc_cc"
_RPREFIX = "__rcdc_r_"


# --------------------------------------------------------------------------
# Broadcast edge index
# --------------------------------------------------------------------------

@dataclasses.dataclass
class EdgeIndex:
    """CSR-style adjacency index over the edge table, keyed by parent.

    All node ids are dictionary-encoded once at build time (``node_values`` +
    integer codes), so the per-level BFS works entirely in int64 — no
    per-level string hashing or object-dtype sorts. ``sorted_table`` holds the
    edge payload stably sorted by parent code; ``uniq_pcodes``/``starts``
    give each distinct parent code its slice in the sorted arrays.

    ``needs_dedup`` is true iff some child value occurs more than once in the
    edge list — the only way two same-(parent, child, level) rows can arise
    (multi-path convergence or duplicate edges).
    """

    node_values: pa.Array            # code -> original id; last slot is null
    uniq_pcodes: np.ndarray          # sorted distinct parent codes (int64)
    starts: np.ndarray               # len(uniq_pcodes)+1 slice bounds
    ccode_sorted: np.ndarray         # child code per edge, sorted by parent
    pcode_sorted: np.ndarray
    sorted_table: pa.Table           # edge payload in the same sorted order
    path_sorted: Optional[pa.Array]  # stringified path values, sorted order
    needs_dedup: bool
    num_edges: int

    def lookup(self, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized out-edge lookup by child code → (slice start, count)."""
        n = len(codes)
        if len(self.uniq_pcodes) == 0 or n == 0:
            z = np.zeros(n, dtype=np.int64)
            return z, z.copy()
        pos = np.searchsorted(self.uniq_pcodes, codes)
        clipped = np.minimum(pos, len(self.uniq_pcodes) - 1)
        found = self.uniq_pcodes[clipped] == codes
        starts = np.where(found, self.starts[clipped], 0)
        counts = np.where(found, self.starts[clipped + 1] - starts, 0)
        return starts.astype(np.int64), counts.astype(np.int64)


def build_edge_index(table: pa.Table, cfg: FlattenConfig) -> EdgeIndex:
    """Compile the full edge table into an :class:`EdgeIndex`.

    Joinable edges are those with a non-null parent (a null join key never
    matches, mirroring SQL join semantics in HierarchyFlattener.java:276).
    """
    table = table.combine_chunks()
    table = table.filter(pc.is_valid(table[cfg.parent_field]))
    n = table.num_rows
    pcol = table[cfg.parent_field].combine_chunks()
    ccol = table[cfg.child_field].combine_chunks()
    if isinstance(pcol, pa.ChunkedArray):
        pcol = pa.concat_arrays(pcol.chunks) if pcol.num_chunks else pa.array(
            [], table.schema.field(cfg.parent_field).type)
    if isinstance(ccol, pa.ChunkedArray):
        ccol = pa.concat_arrays(ccol.chunks) if ccol.num_chunks else pa.array(
            [], table.schema.field(cfg.child_field).type)
    both = pa.concat_arrays([pcol, ccol.cast(pcol.type)]) if n else pcol
    enc = pc.dictionary_encode(both)
    node_values = enc.dictionary
    null_code = len(node_values)
    # node_values gets one trailing null slot so code -> value take() works
    # even for null child ids.
    node_values = pa.concat_arrays(
        [node_values, pa.nulls(1, node_values.type)])
    codes = pc.fill_null(pc.cast(enc.indices, pa.int64()),
                         null_code).to_numpy(zero_copy_only=False)
    pcodes, ccodes = codes[:n], codes[n:]

    order = np.argsort(pcodes, kind="stable")
    sorted_table = table.take(pa.array(order))
    ps = pcodes[order]
    cs = ccodes[order]
    if n:
        change = np.nonzero(ps[1:] != ps[:-1])[0] + 1
        starts = np.concatenate([[0], change, [n]]).astype(np.int64)
        uniq = ps[starts[:-1]]
    else:
        starts = np.array([0], dtype=np.int64)
        uniq = np.array([], dtype=np.int64)
    path_sorted = None
    if cfg.has_path:
        path_sorted = pc.cast(sorted_table[cfg.path_field], pa.string())
        if isinstance(path_sorted, pa.ChunkedArray):
            path_sorted = path_sorted.combine_chunks()
    needs_dedup = bool(n) and len(np.unique(ccodes)) < n
    return EdgeIndex(
        node_values=node_values,
        uniq_pcodes=uniq,
        starts=starts,
        ccode_sorted=cs,
        pcode_sorted=ps,
        sorted_table=sorted_table,
        path_sorted=path_sorted,
        needs_dedup=needs_dedup,
        num_edges=n,
    )


def _seed_mask(batch: pa.Table, cfg: FlattenConfig) -> pa.ChunkedArray:
    """START WITH predicate + null-rejecting self-edge filter for seeds.

    ``parent != child`` drops rows where either key is null, exactly like the
    reference's ``where(notEqual(...))`` (HierarchyFlattener.java:174-175).
    """
    mask = pc.and_kleene(
        pc.not_equal(batch[cfg.parent_field], batch[cfg.child_field]),
        pc.and_(pc.is_valid(batch[cfg.parent_field]), pc.is_valid(batch[cfg.child_field])),
    )
    mask = pc.fill_null(mask, False)
    if cfg.start_with:
        pred = pc.fill_null(compile_predicate(cfg.start_with)(batch), False)
        mask = pc.and_(mask, pred)
    return mask


class ExpandPaths:
    """Actor-pool batch transform: expand each seed edge through all levels.

    ``__init__`` fetches the broadcast :class:`EdgeIndex` from the object
    store once per actor; ``__call__`` runs the vectorized BFS for a batch of
    seed edges and returns all path rows (every level) for those seeds.
    Per-level work is pure numpy/Arrow: hash-index lookups, ``np.repeat``
    expansion, and element-wise string joins for paths.
    """

    def __init__(self, index_ref, cfg: FlattenConfig, out_schema: pa.Schema,
                 num_buckets: int = 32):
        self.idx: EdgeIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        self.cfg = cfg
        self.out_schema = out_schema
        self.num_buckets = num_buckets
        self.data_fields = [
            f for f in self.idx.sorted_table.column_names
            if f not in (cfg.parent_field, cfg.child_field)
        ]
        # one hash lookup per batch to enter code space (pd.Index = C hash map)
        self.node_index = pd.Index(self.idx.node_values.to_pandas())
        self._can_frontier_dedup = (self.idx.needs_dedup and not cfg.has_path
                                    and not cfg.roots())
        self.emit_schema = out_schema
        if self.idx.needs_dedup:
            # parent/child values are reconstructed from the codes after the
            # dedup shuffle — don't ship the (string) id columns through it.
            self.emit_schema = pa.schema(
                [f for f in out_schema
                 if f.name not in (cfg.parent_field, cfg.child_field)]
                + [pa.field(_PC_COL, pa.int64()), pa.field(_CC_COL, pa.int64()),
                   pa.field(_BUCKET_COL, pa.int64())])
        self._edge_rank = (self._build_edge_rank()
                           if self._can_frontier_dedup else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg, idx = self.cfg, self.idx
        if batch.num_rows == 0 and cfg.parent_field not in batch.column_names:
            # zero-column EMPTY block degrade (CLAUDE.md invariant)
            return self.emit_schema.empty_table()
        batch = batch.filter(_seed_mask(batch, cfg))
        if batch.num_rows == 0:
            return self.emit_schema.empty_table()

        roots = cfg.roots()
        root_src = {alias: batch[src] for src, alias in roots.items()}

        # Enter integer-code space once per batch; all per-level work is int64.
        null_code = len(idx.node_values) - 1
        pcode = self.node_index.get_indexer(
            batch[cfg.parent_field].to_pandas()).astype(np.int64)
        ccode = self.node_index.get_indexer(
            batch[cfg.child_field].to_pandas()).astype(np.int64)
        pcode[pcode < 0] = null_code
        ccode[ccode < 0] = null_code
        seed_pos = np.arange(batch.num_rows, dtype=np.int64)
        edge_pos: Optional[np.ndarray] = None  # None → frontier rows are seeds
        path: Optional[pa.Array] = None
        if cfg.has_path:
            pvals = pc.cast(batch[cfg.path_field], pa.string())
            sep = pa.array([cfg.path_separator] * batch.num_rows, pa.string())
            # Seed path = separator + str(value); format_string renders null as
            # "null" (HierarchyFlattener.java:179-182, Java String.format).
            path = pc.binary_join_element_wise(
                sep, pc.fill_null(pvals, "null"), pa.scalar("", pa.string())
            )

        out_tables: list[pa.Table] = []
        level = 1
        while True:
            starts, counts = idx.lookup(ccode)
            bottom = counts == 0
            out_tables.append(
                self._emit(level, pcode, ccode, bottom, seed_pos,
                           edge_pos, path, batch, root_src)
            )
            total = int(counts.sum())
            if total == 0:
                break
            if level >= cfg.max_depth:
                # A non-leaf frontier at max_depth means the reference's loop
                # would re-enter with level > maxLevel and throw
                # (HierarchyFlattener.java:215-220).
                raise ValueError(
                    f"Exceeded maximum depth of {cfg.max_depth}. Ensure there "
                    "are no cycles in the hierarchy, or increase the max depth."
                )
            # Vectorized expansion: repeat each extendable row by its
            # out-degree and gather the matched edges from the sorted index.
            ext = counts > 0
            rep = np.repeat(np.nonzero(ext)[0], counts[ext])
            offsets = (np.arange(total, dtype=np.int64)
                       - np.repeat(np.cumsum(counts[ext]) - counts[ext], counts[ext]))
            new_edge_pos = np.repeat(starts[ext], counts[ext]) + offsets
            pcode = ccode[rep]
            ccode = idx.ccode_sorted[new_edge_pos]
            seed_pos = seed_pos[rep]
            if path is not None:
                step = idx.path_sorted.take(pa.array(new_edge_pos))
                prev = path.take(pa.array(rep))
                # concat_ws skips nulls (HierarchyFlattener.java:261-267).
                path = pc.if_else(
                    pc.is_valid(step),
                    pc.binary_join_element_wise(prev, pc.fill_null(step, ""),
                                                pa.scalar(cfg.path_separator)),
                    prev,
                )
            edge_pos = new_edge_pos
            level += 1
            if self._can_frontier_dedup and len(pcode):
                # Per-batch frontier dedup: when neither a path nor
                # connect-by-root columns are configured, all rows of a
                # (parent, child, level) group are IDENTICAL, so collapsing
                # them early is exactly equivalent to the final dedup. It
                # shrinks the final shuffle and caps the frontier at the edge
                # count per level — without it a chain of D diamonds explodes
                # into 2^D paths (the reference has the same blowup,
                # HierarchyFlattener.java:279). With a path configured this
                # must NOT be done: min over full concatenated paths does not
                # commute with per-level prefix minima when label characters
                # sort below the separator.
                pcode, ccode, seed_pos, edge_pos, path = self._frontier_dedup(
                    pcode, ccode, seed_pos, edge_pos, path)

        out = pa.concat_tables(out_tables)
        out = out.cast(self.emit_schema)
        if self.idx.needs_dedup and out.num_rows:
            # Output-level local dedup (ALWAYS sound, unlike frontier dedup):
            # the final aggregate takes min over FULL concatenated paths per
            # (parent, child, level), and min is associative — combining
            # within this batch first cannot change the global winner. With
            # seeds co-located by child value (flatten_hierarchy routes them
            # when dedup is needed), most converging paths meet here and the
            # global dedup shuffle shrinks accordingly.
            out = _local_output_dedup(out, self.cfg)
        return out

    def _build_edge_rank(self) -> Optional[np.ndarray]:
        """Winner rank per edge for duplicate (parent, child) edge pairs.

        Frontier dedup keeps one row per (parent, child) group; when the edge
        table carries duplicate (parent, child) edges with DIFFERENT data
        payloads, the kept row must be the same one the final dedup would pick
        (min row under ``_dedup_sort_cols``, nulls-first to match the polars
        sort in ``_sorted_unique``) — otherwise broadcast and shuffle
        strategies (or different batch splits) could emit different payloads.
        Returns None (no ranking needed) when no duplicate edges exist or
        there are no data fields to disagree on.
        """
        idx = self.idx
        if not idx.num_edges or not self.data_fields:
            return None
        ps, cs = idx.pcode_sorted, idx.ccode_sorted
        order = np.lexsort((cs, ps))
        same = (ps[order][1:] == ps[order][:-1]) & (cs[order][1:] == cs[order][:-1])
        if not same.any():
            return None
        in_dup = np.zeros(idx.num_edges, dtype=bool)
        grp = np.concatenate([[False], same]) | np.concatenate([same, [False]])
        in_dup[order] = grp
        rows = np.flatnonzero(in_dup)
        sort_cols = [f.name for f in self.emit_schema
                     if f.name in set(self.data_fields)]
        dup_payload = idx.sorted_table.select(sort_cols).take(pa.array(rows))
        for name in dup_payload.column_names:
            col = dup_payload[name]
            if pa.types.is_floating(col.type) and pc.any(
                    pc.is_nan(pc.fill_null(col, 0.0))).as_py():
                # pandas cannot distinguish NaN from null, but the final
                # dedup's polars sort orders NaN last and null first — a
                # pandas-computed rank would pick a different winner. Fall
                # back to output-level dedup only (always sound).
                self._can_frontier_dedup = False
                return None
        df = dup_payload.to_pandas()
        df["__p"], df["__c"] = ps[rows], cs[rows]
        df = df.sort_values(sort_cols, kind="stable", na_position="first")
        rank = df.groupby(["__p", "__c"], sort=False).cumcount().to_numpy()
        edge_rank = np.zeros(idx.num_edges, dtype=np.int64)
        edge_rank[rows[df.index.to_numpy()]] = rank
        return edge_rank

    def _frontier_dedup(self, pcode, ccode, seed_pos, edge_pos, path):
        if self._edge_rank is not None:
            # order duplicate-(p, c) ties by the final-dedup winner rank so
            # the surviving row is the global min-payload row
            order = np.lexsort((self._edge_rank[edge_pos], ccode, pcode))
        else:
            order = np.lexsort((ccode, pcode))
        ps, cs = pcode[order], ccode[order]
        first = np.empty(len(ps), dtype=bool)
        first[0] = True
        first[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
        keep = order[first]
        keep.sort()  # preserve original emit order for determinism
        return pcode[keep], ccode[keep], seed_pos[keep], edge_pos[keep], path

    def _emit(self, level, pcode, ccode, bottom, seed_pos, edge_pos,
              path, batch, root_src) -> pa.Table:
        cfg = self.cfg
        n = len(pcode)
        cols: dict[str, pa.Array] = {}
        if not self.idx.needs_dedup:
            cols[cfg.parent_field] = self.idx.node_values.take(pa.array(pcode))
            cols[cfg.child_field] = self.idx.node_values.take(pa.array(ccode))
        if edge_pos is None:
            data_src = batch
            take_idx = pa.array(seed_pos)
        else:
            data_src = self.idx.sorted_table
            take_idx = pa.array(edge_pos)
        for f in self.data_fields:
            cols[f] = data_src[f].take(take_idx)
        cols[cfg.level_field] = pa.array(np.full(n, level, dtype=np.int32))
        cols[cfg.bottom_field] = pa.array(bottom)
        if path is not None:
            cols[cfg.path_alias_field] = path
        sp = pa.array(seed_pos)
        for alias, src_col in root_src.items():
            cols[alias] = src_col.take(sp)
        if self.idx.needs_dedup:
            cols[_PC_COL] = pa.array(pcode)
            cols[_CC_COL] = pa.array(ccode)
            level_mix = np.uint64((level * 0x165667B19E3779F9) & 0xFFFFFFFFFFFFFFFF)
            mix = (ccode.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   ^ pcode.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
                   ^ level_mix)
            cols[_BUCKET_COL] = pa.array(
                (mix % np.uint64(self.num_buckets)).astype(np.int64))
        return pa.table({name: cols[name] for name in self.emit_schema.names})


# --------------------------------------------------------------------------
# Dedup (the one remaining all-to-all exchange)
# --------------------------------------------------------------------------

def _dedup_sort_cols(cfg: FlattenConfig, columns: list[str]) -> list[str]:
    """The row ordering under which a group's winner is chosen. Local and
    global dedup MUST use the same ordering — lexicographic row-min is
    associative, so local-then-global equals global only when both minimize
    the same keys."""
    keys = {_PC_COL, _CC_COL, _BUCKET_COL, cfg.level_field, cfg.bottom_field,
            cfg.parent_field, cfg.child_field}
    if cfg.has_path:
        return [cfg.path_alias_field]
    return [c for c in columns if c not in keys]


def _sorted_unique(t: pa.Table, sort_cols: list[str],
                   keys: list[str]) -> pa.Table:
    """Stable sort by ``sort_cols`` then keep the first row per ``keys``.
    Uses polars (multithreaded, arrow-native) with a pandas fallback."""
    try:
        import polars as pl

        df = pl.from_arrow(t)
        if sort_cols:
            df = df.sort(sort_cols, maintain_order=True)
        df = df.unique(subset=keys, keep="first", maintain_order=True)
        # polars may emit large_string; realign to the input schema
        return df.to_arrow().select(t.column_names).cast(t.schema)
    except ImportError:  # pragma: no cover
        df = t.to_pandas()
        if sort_cols:
            # na_position="first" matches polars' nulls-first default sort
            df = df.sort_values(sort_cols, kind="stable", na_position="first")
        df = df.drop_duplicates(subset=keys, keep="first")
        return pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)


def _local_output_dedup(t: pa.Table, cfg: FlattenConfig) -> pa.Table:
    """Combiner for the dedup shuffle: merge same-(pc, cc, level) rows within
    one emitted batch under the same winner ordering as the global dedup
    (min is associative, so this never changes the final winner)."""
    keys = [_PC_COL, _CC_COL, cfg.level_field]
    out = _sorted_unique(t, _dedup_sort_cols(cfg, t.column_names), keys)
    return t if out.num_rows == t.num_rows else out


def _dedup_partition_coded(t: pa.Table, cfg: FlattenConfig,
                           out_schema: pa.Schema,
                           node_values: pa.Array) -> pa.Table:
    """Broadcast-path dedup: group keys are the int64 node codes emitted by
    ExpandPaths (no string hashing); min-path row wins deterministically;
    parent/child id values are reconstructed from the codes (they were not
    shipped through the shuffle). ``bottom`` needs no aggregation — it is a
    function of the child node alone, so all rows in a group already agree."""
    if t.num_rows == 0:
        return out_schema.empty_table()
    keys = [_PC_COL, _CC_COL, cfg.level_field]
    sort_cols = _dedup_sort_cols(cfg, t.column_names)
    dedup = _sorted_unique(t, sort_cols, keys)
    pcode = dedup[_PC_COL].combine_chunks()
    ccode = dedup[_CC_COL].combine_chunks()
    cols = []
    for f in out_schema:
        if f.name == cfg.parent_field:
            col = node_values.take(pcode)
        elif f.name == cfg.child_field:
            col = node_values.take(ccode)
        else:
            col = dedup[f.name]
        if col.type != f.type:
            col = col.cast(f.type)
        cols.append(col)
    return pa.table(cols, schema=out_schema)


def _dedup_coded(ds: ray.data.Dataset, cfg: FlattenConfig,
                 out_schema: pa.Schema, index_ref,
                 num_partitions: int) -> ray.data.Dataset:
    """Dedup for the broadcast path: the bucket column is already emitted by
    ExpandPaths (int mix of codes + level), so the exchange is a pure
    partition-map (raycdc.shuffle — no sort, no barrier); node id values
    rejoin from the broadcast index after the exchange."""
    from raycdc.shuffle import partition_map

    def dedup_group(t: pa.Table) -> pa.Table:
        idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        return _dedup_partition_coded(t, cfg, out_schema, idx.node_values)

    return partition_map(ds, _BUCKET_COL, num_partitions, dedup_group,
                         drop_partition_col=False, empty_schema=out_schema)


def _dedup_partition(t: pa.Table, cfg: FlattenConfig, out_schema: pa.Schema) -> pa.Table:
    """Merge duplicate (parent, child, level) rows within one hash partition.

    bottom := max over the group (merges the shuffle variant's leaf-marker
    duplicates, HierarchyFlattener.java:340-342); all other columns come from
    the min-path row (deterministic pin of the reference's ``first()`` +
    ``min(path)`` aggregation, HierarchyFlattener.java:322-342).
    """
    if t.num_rows == 0:
        return out_schema.empty_table()
    if _BUCKET_COL in t.column_names:
        t = t.drop_columns([_BUCKET_COL])
    keys = [cfg.parent_field, cfg.child_field, cfg.level_field]
    sort_cols = [cfg.path_alias_field] if cfg.has_path else [
        c for c in t.column_names if c not in keys and c != cfg.bottom_field
    ]
    # bottom := max over the group. Null group keys are legitimate keys
    # (SQL GROUP BY semantics — polars .over() groups nulls together, as
    # does the pandas dropna=False fallback).
    try:
        import polars as pl

        df = pl.from_arrow(t)
        df = df.with_columns(pl.col(cfg.bottom_field).max().over(keys))
        t = df.to_arrow().select(t.column_names).cast(t.schema)
    except ImportError:  # pragma: no cover
        from raycdc.shuffle import stable_types_mapper

        df = t.to_pandas(types_mapper=stable_types_mapper)
        df[cfg.bottom_field] = df.groupby(
            keys, sort=False, dropna=False)[cfg.bottom_field].transform("max")
        t = pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)
    # Winner selection rides the SAME kernel as the broadcast path
    # (_sorted_unique: polars nulls-first sort, schema-preserving) so both
    # strategies emit identical payload rows for duplicate groups — a plain
    # pandas sort here ordered nulls LAST and degraded nullable ints.
    return _sorted_unique(t, sort_cols, keys).cast(out_schema)


def _dedup(ds: ray.data.Dataset, cfg: FlattenConfig, out_schema: pa.Schema,
           num_partitions: int) -> ray.data.Dataset:
    """Hash-partition rows by (parent, child, level) and merge per partition.

    Implemented as an explicit bucket column + the engine's partition-only
    exchange (``raycdc.shuffle.partition_map`` — no sample/sort/barrier) so
    each shuffle partition is handled by ONE vectorized pandas call, not a
    Python call per (tiny) group. Equivalent to the reference's final
    ``groupBy(parent, child, level)`` shuffle (HierarchyFlattener.java:340).
    """
    from raycdc.shuffle import partition_map

    def add_bucket(t: pa.Table) -> pa.Table:
        from raycdc.shuffle import stable_hash

        # stable_hash: root rows carry a NULL parent — with a plain
        # to_pandas an int-keyed hierarchy batch containing one root would
        # hash (and route) every edge in it differently from rootless ones
        h = stable_hash(t, [cfg.parent_field, cfg.child_field,
                            cfg.level_field])
        return t.append_column(_BUCKET_COL, pa.array((h % num_partitions).astype(np.int64)))

    return partition_map(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        _BUCKET_COL, num_partitions,
        lambda t: _dedup_partition(t, cfg, out_schema),
        empty_schema=out_schema)


# --------------------------------------------------------------------------
# Shuffle-join strategy (edge table too large to broadcast)
# --------------------------------------------------------------------------

def _flatten_shuffle(ds: ray.data.Dataset, cfg: FlattenConfig,
                     out_schema: pa.Schema, num_partitions: int) -> ray.data.Dataset:
    """Per-level left-outer hash join, mirroring the reference dataflow.

    Same asymptotics as the reference (one shuffle join per level,
    HierarchyFlattener.java:214-284): used when the edge table cannot be
    broadcast. Each level's frontier is materialized (Ray Data has no lazy
    lineage reuse across a growing union); the final dedup merges the
    leaf-marker duplicates exactly like the reference's groupBy.
    """
    roots = cfg.roots()
    data_fields = [n for n in out_schema.names[: len(ds.schema().names)]
                   if n not in (cfg.parent_field, cfg.child_field)]

    def make_seeds(batch: pa.Table) -> pa.Table:
        batch = batch.filter(_seed_mask(batch, cfg))
        n = batch.num_rows
        cols = {cfg.parent_field: batch[cfg.parent_field],
                cfg.child_field: batch[cfg.child_field]}
        for f in data_fields:
            cols[f] = batch[f]
        cols[cfg.level_field] = pa.array(np.full(n, 1, dtype=np.int32))
        cols[cfg.bottom_field] = pa.array(np.zeros(n, dtype=bool))
        if cfg.has_path:
            pvals = pc.cast(batch[cfg.path_field], pa.string())
            sep = pa.array([cfg.path_separator] * n, pa.string())
            cols[cfg.path_alias_field] = pc.binary_join_element_wise(
                sep, pc.fill_null(pvals, "null"), pa.scalar("", pa.string()))
        for src, alias in roots.items():
            cols[alias] = batch[src]
        return pa.table(cols).cast(out_schema)

    # Right side of the join: the raw edge table with prefixed column names
    # (only rows with a non-null parent can ever match).
    def prep_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[cfg.parent_field]))
        key = batch[cfg.parent_field]
        batch = batch.rename_columns([_RPREFIX + c for c in batch.column_names])
        # Dedicated join-key copy: Dataset.join drops the right_on column, so
        # join on a throwaway copy and keep the real columns intact.
        batch = batch.append_column(_RPREFIX + "key", key)
        # Non-null marker: detects join matches even if a matched edge has a
        # null child (is_valid on the right child would misreport unmatched).
        return batch.append_column(
            _RPREFIX + "m", pa.array(np.ones(batch.num_rows, dtype=bool)))

    right = ds.map_batches(prep_right, batch_format="pyarrow").materialize()
    cur = ds.map_batches(make_seeds, batch_format="pyarrow").materialize()
    levels = [cur]
    level = 1
    while True:
        if cur.count() == 0:
            break
        if level > cfg.max_depth:
            raise ValueError(
                f"Exceeded maximum depth of {cfg.max_depth}. Ensure there "
                "are no cycles in the hierarchy, or increase the max depth.")
        joined = hash_join(cur, right, on=[cfg.child_field],
                           right_on=[_RPREFIX + "key"], join_type="left_outer",
                           num_partitions=num_partitions,
                           # keep the reference-shaped distributed per-level
                           # join; broadcast-sized edge tables already take
                           # the flattener's own broadcast strategy
                           strategy="shuffle")

        def project(batch: pa.Table) -> pa.Table:
            # O9 conditional projection (HierarchyFlattener.java:239-272).
            # Joins emit schema-less empty blocks for empty partitions;
            # normalize them so downstream joins see a consistent schema.
            if batch.num_rows == 0 or cfg.parent_field not in batch.column_names:
                return out_schema.empty_table()
            rchild = batch[_RPREFIX + cfg.child_field]
            matched = pc.fill_null(pc.equal(batch[_RPREFIX + "m"], True), False)
            cols = {
                cfg.parent_field: pc.if_else(matched, batch[cfg.child_field],
                                             batch[cfg.parent_field]),
                cfg.child_field: pc.if_else(matched, rchild, batch[cfg.child_field]),
            }
            for f in data_fields:
                cols[f] = pc.if_else(matched, batch[_RPREFIX + f], batch[f])
            cols[cfg.level_field] = pc.if_else(
                matched, pc.add(batch[cfg.level_field], pa.scalar(1, pa.int32())),
                batch[cfg.level_field]).cast(pa.int32())
            cols[cfg.bottom_field] = pc.invert(matched)
            if cfg.has_path:
                step = pc.cast(batch[_RPREFIX + cfg.path_field], pa.string())
                extended = pc.if_else(
                    pc.is_valid(step),
                    pc.binary_join_element_wise(
                        pc.fill_null(batch[cfg.path_alias_field], ""),
                        pc.fill_null(step, ""), pa.scalar(cfg.path_separator)),
                    batch[cfg.path_alias_field])
                cols[cfg.path_alias_field] = pc.if_else(
                    matched, extended, batch[cfg.path_alias_field])
            for alias in roots.values():
                cols[alias] = batch[alias]
            return pa.table(cols).cast(out_schema)

        nxt = joined.map_batches(project, batch_format="pyarrow").materialize()
        levels.append(nxt)
        # bottom==False marks matched (extended) rows → next frontier
        # (HierarchyFlattener.java:281-282).
        def keep_frontier(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or cfg.bottom_field not in t.column_names:
                return out_schema.empty_table()
            return t.filter(pc.equal(t[cfg.bottom_field], False))

        cur = nxt.map_batches(keep_frontier, batch_format="pyarrow")
        level += 1

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return _dedup(out, cfg, out_schema, num_partitions)


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------

def _default_expand_concurrency() -> int:
    """Fixed expansion-pool size: 3/8 of the cluster's CPUs (min 2)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - uninitialized ray
        cpus = 8
    return max(2, (cpus * 3) // 8)


def _default_num_partitions() -> int:
    """Dedup-exchange partition count scaled to the cluster: CPUs // 2
    (min 16).  Each partition is one merge task; half the CPUs keeps merge
    parallelism while halving the split fan-out overhead vs one-per-CPU
    (measured 5.12 -> 4.57 s on the sf0.1 DAG flatten at 32 CPUs)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - uninitialized ray
        cpus = 8
    return max(16, cpus // 2)


def flatten_hierarchy(
    ds: ray.data.Dataset,
    cfg: FlattenConfig,
    *,
    strategy: str = "auto",
    batch_size: int = 32768,
    concurrency=None,
    num_partitions: int | None = None,
    broadcast_max_bytes: int = 4 << 30,
    co_locate_seeds: bool = False,
) -> ray.data.Dataset:
    """Flatten an edge-list hierarchy Dataset into path-terminal relation rows.

    strategy:
      - "broadcast" (default for edge tables < ``broadcast_max_bytes``): the
        edge index is built once, put in the object store, and read by an
        actor pool that expands seeds through all levels in one pass.
      - "shuffle": per-level distributed hash join for edge tables too large
        to hold in one index (reference-equivalent dataflow).
      - "auto": choose by the materialized input size.
    """
    if num_partitions is None:
        num_partitions = _default_num_partitions()
    schema = ds.schema()
    pa_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)])
    failures = validate_config(cfg, pa_schema)
    if failures:
        raise ValueError("Invalid flatten config: " + "; ".join(failures))
    out_schema = derive_output_schema(pa_schema, cfg)

    if strategy == "auto":
        ds = ds.materialize()
        size = ds.size_bytes() or 0
        strategy = "broadcast" if size < broadcast_max_bytes else "shuffle"

    if strategy == "shuffle":
        return _flatten_shuffle(ds, cfg, out_schema, num_partitions)

    # Build the index in a remote task: the edge table never lands on the
    # driver; the result goes straight into the object store and only the
    # tiny needs_dedup flag comes back.
    refs = ds.to_arrow_refs()
    index_ref = _build_index_task.remote(cfg, pa_schema, *refs)
    needs_dedup = bool(ray.get(_index_needs_dedup.remote(index_ref)))
    if needs_dedup and co_locate_seeds:
        # Co-locate seeds that share a child value: converging paths then
        # meet inside one expansion batch and collapse in the local output
        # dedup, shrinking the global dedup shuffle. One cheap shuffle of the
        # raw edge rows (no paths yet) buys it.
        sb = "__rcdc_sb"

        def add_seed_bucket(t: pa.Table) -> pa.Table:
            from raycdc.shuffle import stable_hash

            h = stable_hash(t, [cfg.child_field])
            return t.append_column(
                sb, pa.array((h % num_partitions).astype(np.int64)))

        def sort_bucket(t: pa.Table) -> pa.Table:
            return t.take(pc.sort_indices(
                t, sort_keys=[(cfg.child_field, "ascending")]))

        # partition-only exchange (repo invariant: keyed exchanges never
        # ride Ray's sort-based groupby) — co-location plus a local sort
        # inside each bucket is all the convergence optimization needs
        from raycdc.shuffle import partition_map

        bucketed = ds.map_batches(add_seed_bucket, batch_format="pyarrow")
        ds = partition_map(bucketed, sb, num_partitions, sort_bucket,
                           empty_schema=pa_schema)
    expanded = ds.map_batches(
        ExpandPaths,
        fn_constructor_args=(index_ref, cfg, out_schema, num_partitions),
        batch_format="pyarrow",
        batch_size=batch_size,
        # FIXED pool, not an autoscaling range: autoscaling ramps actors
        # lazily and each late actor pays the index fetch + pd.Index build
        # while seed batches queue (measured 5.25 s -> 3.03 s on the sf0.1
        # DAG expansion). 3/8 of the cluster leaves the downstream dedup
        # exchange its share while expansion still saturates its kernel.
        concurrency=concurrency or _default_expand_concurrency(),
    )
    if not needs_dedup:
        # Forest: no node has two in-edges, so no two same-level paths can
        # converge and no duplicate edges exist — the dedup shuffle is a no-op
        # and is skipped entirely.
        return expanded
    return _dedup_coded(expanded, cfg, out_schema, index_ref, num_partitions)


def flatten_hierarchy_table(table: pa.Table, cfg: FlattenConfig) -> pa.Table:
    """Local (single-process) flattener over one Arrow table.

    Same kernels as the distributed broadcast strategy; used for small inputs
    and as a test oracle helper. No Ray required.
    """
    failures = validate_config(cfg, table.schema)
    if failures:
        raise ValueError("Invalid flatten config: " + "; ".join(failures))
    out_schema = derive_output_schema(table.schema, cfg)
    index = build_edge_index(table, cfg)
    expand = ExpandPaths(index, cfg, out_schema)
    out = expand(table)
    if index.needs_dedup:
        out = _dedup_partition_coded(out, cfg, out_schema, index.node_values)
    return out


@ray.remote
def _build_index_task(cfg: FlattenConfig, pa_schema: pa.Schema,
                      *tables: pa.Table) -> EdgeIndex:
    live = [t for t in tables if t.num_rows]
    table = pa.concat_tables(live, promote_options="default") if live \
        else pa_schema.empty_table()
    return build_edge_index(table, cfg)


@ray.remote
def _index_needs_dedup(index: EdgeIndex) -> bool:
    return index.needs_dedup
