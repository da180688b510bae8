"""CDC apply pipeline: changelog segments → url-partitioned lake upsert.

Dataflow (streaming end-to-end; the full log is never materialized)::

    read_parquet(unapplied segments)                # file-level skip by epoch
      → flatten_records (recursive schema walk, zero-copy map_batches)
      → to_versioned_rows (op → _deleted tombstone flag)
      → LocalLwwCombiner (per-batch winner per url — combiner/skew cap)
      → _partitioned_merge                          # the ONE shuffle
           split tasks route blocks by hash(url) % P (partition-only, no
           sort barrier); one merge task per partition consumes its slices:
           base partition file ∪ delta → LWW → atomic file write
      → driver commits the manifest atomically (exactly-once)

Idempotence & resume: segments are the atomic replay unit; the manifest
records ``epochs_applied``. The LWW reduction is associative/commutative, and
partition files are content-addressed by (pid, version), so re-running any
uncommitted epoch — at any parallelism — converges to the identical committed
table state (byte-identical ``text`` per url; tested at two CPU counts).

Hot-key skew: the per-batch combiner bounds any url's shuffle volume to one
row per batch regardless of its event count, which is the salting-equivalent
pre-aggregation for a LWW merge (no residual per-key work grows with skew).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from raycdc.cdc.evolve import align_to_schema, concat_evolved, unify
from raycdc.cdc.lww import DELETED_COL, LocalLwwCombiner, lww_reduce, to_versioned_rows
from raycdc.cdc.sink import (
    LakeManifest,
    atomic_write_parquet,
    commit_manifest,
    read_manifest,
    writer_lock,
)
from raycdc.record_flatten import flatten_records

PID_COL = "_pid"
# merge fan-in width: above this many split-task slices per partition the
# shuffle interleaves a tree-reduce layer of LWW combiners
_FANIN = 64


def _url_pid(urls: pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Routing function every lake exchange / lookup / fsck shares. Rides
    shuffle.stable_hash (the engine-wide exchange hash) — identical values
    for string urls as the former inline pandas hash, so existing lakes'
    routing invariant is unchanged."""
    from raycdc.shuffle import stable_hash

    return (stable_hash(urls) % num_partitions).astype(np.int64)


def _segment_epoch(path: str) -> int:
    # segments are named events-{epoch:05d}.parquet (changelog.py)
    name = os.path.basename(path)
    return int(name.split("-")[1].split(".")[0])


def discover_segments(changelog_dir: str) -> list[str]:
    return sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.startswith("events-") and f.endswith(".parquet")
    )


def _footer_info(path: str) -> tuple[int, int, pa.Schema, int]:
    """One footer open per segment: (max seq, row count, schema,
    num_row_groups) — every fact the driver needs, gathered together
    because driver-side serial footer walks are fixed cost that dents
    scaling efficiency."""
    f = pq.ParquetFile(path)
    md = f.metadata
    schema = md.schema.to_arrow_schema()
    idx = schema.get_field_index("seq")
    hi = -1
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is not None:
            hi = max(hi, st.max)
    return hi, md.num_rows, schema, md.num_row_groups


def _footer_infos(paths: list[str]) -> list[tuple[int, int, pa.Schema, int]]:
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as pool:
        return list(pool.map(_footer_info, paths))


class MergePartition:
    """Per-partition merge task body (one call per url-hash partition).

    Reads the partition's committed base file (if any), concatenates it with
    the incoming delta under the unified (evolved) schema, applies the LWW
    reduction, sorts by url for deterministic bytes, and writes the new
    partition file atomically. Returns one lineage/manifest row.
    """

    lww_cols = ("url", "warc_ts", "seq")  # the LWW total order (north star)

    def __init__(self, lake_dir: str, version: int,
                 base_files: dict[int, list[str]], epochs: list[int]):
        self.lake_dir = lake_dir
        self.version = version
        self.base_files = base_files
        self.epochs = epochs

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group[PID_COL][0].as_py())
        delta = group.drop_columns([PID_COL])
        tables = [pq.read_table(os.path.join(self.lake_dir, f))
                  for f in self.base_files.get(pid, [])]
        tables.append(delta)
        merged = lww_reduce(concat_evolved(tables))
        merged = merged.take(pc.sort_indices(merged, sort_keys=[("url", "ascending")]))
        rel = f"part-{pid:05d}/v{self.version}.parquet"
        size = atomic_write_parquet(merged, os.path.join(self.lake_dir, rel))
        live = int(pc.sum(pc.cast(pc.invert(merged[DELETED_COL]), pa.int64())).as_py() or 0)
        return pa.table({
            "pid": pa.array([pid], pa.int64()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([merged.num_rows], pa.int64()),
            "live_rows": pa.array([live], pa.int64()),
            "bytes": pa.array([size], pa.int64()),
            "delta_rows": pa.array([delta.num_rows], pa.int64()),
        })


def apply_changelog(
    changelog_dir: str,
    lake_dir: str,
    *,
    num_partitions: int = 16,
    epochs: Optional[list[int]] = None,
    batch_size: int = 65536,
    crash_before_commit: bool = False,
) -> dict:
    """Apply all (or the given) unapplied changelog epochs to the lake.

    Returns metrics: events applied, partitions touched, wall seconds,
    events/sec. Safe to re-run after any crash: uncommitted work is invisible
    and re-converges; committed epochs are skipped by manifest lookup.
    Holds the lake's writer lock for the whole job (version allocation →
    file writes → commit): concurrent writers would reuse a (partition,
    version) file name for different content — see sink.writer_lock.
    """
    with writer_lock(lake_dir):
        return _apply_changelog_locked(
            changelog_dir, lake_dir, num_partitions=num_partitions,
            epochs=epochs, batch_size=batch_size,
            crash_before_commit=crash_before_commit)


def _apply_changelog_locked(
    changelog_dir: str,
    lake_dir: str,
    *,
    num_partitions: int,
    epochs: Optional[list[int]],
    batch_size: int,
    crash_before_commit: bool,
) -> dict:
    t0 = time.perf_counter()
    timings: dict[str, float] = {}
    manifest = read_manifest(lake_dir)
    applied = set(manifest.epochs_applied) if manifest else set()
    version = (manifest.version + 1) if manifest else 1
    if manifest and manifest.num_partitions != num_partitions:
        raise ValueError(
            f"lake has {manifest.num_partitions} partitions, got {num_partitions}")

    segs = []
    for path in discover_segments(changelog_dir):
        e = _segment_epoch(path)
        if e in applied:
            continue
        if epochs is not None and e not in epochs:
            continue
        segs.append((e, path))
    if not segs:
        return {"events": 0, "seconds": time.perf_counter() - t0,
                "epochs": [], "partitions": 0, "events_per_sec": 0.0}

    new_epochs = sorted(e for e, _ in segs)
    paths = [p for _, p in segs]
    infos = _footer_infos(paths)
    watermark = max(i[0] for i in infos)
    total_events = sum(i[1] for i in infos)
    timings["meta"] = time.perf_counter() - t0

    # Driver-side static schema derivation (from the footers just read):
    # unify the (possibly evolved) segment schemas, schema-walk them flat,
    # and align every batch to the unified target BEFORE the shuffle so all
    # blocks share one schema regardless of which segment they came from.
    from raycdc.record_flatten import derive_flat_schema

    uni = unify([i[2] for i in infos])
    flat_schema = derive_flat_schema(uni)
    flat_schema = pa.schema(
        [pa.field(f.name.split(".")[-1], f.type) for f in flat_schema])
    target = pa.schema(
        [f for f in flat_schema if f.name not in ("epoch", "op")]
        + [pa.field(DELETED_COL, pa.bool_())])

    # Finer read splits than one-per-file: balances the decode across the
    # pool (a whole segment per task leaves a long straggler tail; measured
    # 11.9s -> 5.8s for the 10M-event map phase at 8 CPUs).
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # 8x CPUs (floor 64): measured best at 8-32 CPUs on the 10M replay
    # (5.4s -> 5.25s at 8 CPUs vs 4x; 16x regresses to 6.5s — per-task
    # overhead outweighs the finer tail).
    nb_factor = int(os.environ.get("RAYCDC_NB_FACTOR", "8"))
    nb = max(64, nb_factor * cpus, 2 * len(paths))
    ds = ray.data.read_parquet(paths, override_num_blocks=nb)
    flat = flatten_records(ds, rename_strategy="leaf")
    versioned = flat.map_batches(
        lambda t: align_to_schema(
            to_versioned_rows(t.drop_columns(["epoch"])), target),
        batch_format="pyarrow")
    combined = versioned.map_batches(
        LocalLwwCombiner(), batch_format="pyarrow", batch_size=batch_size)

    base_files = {}
    if manifest:
        base_files = {int(pid): manifest.partition_files(pid)
                      for pid in manifest.partitions}
    merge = MergePartition(lake_dir, version, base_files, new_epochs)
    t_plan = time.perf_counter()
    timings["plan"] = t_plan - t0 - timings["meta"]
    rows, drain_s = _partitioned_merge(combined, merge, num_partitions)
    timings["drain"] = drain_s
    timings["merge"] = time.perf_counter() - t_plan - drain_s

    partitions = dict(manifest.partitions) if manifest else {}
    for r in rows:
        partitions[str(r["pid"])] = {
            "files": [r["file"]],  # batch apply fully compacts its partition
            "rows": int(r["rows"]),
            "live_rows": int(r["live_rows"]),
            "bytes": int(r["bytes"]),
            "lineage": {"epochs": new_epochs, "version": version,
                        "delta_rows": int(r["delta_rows"])},
        }
    new_manifest = LakeManifest(
        version=version,
        num_partitions=num_partitions,
        epochs_applied=sorted(applied | set(new_epochs)),
        watermark_seq=max(watermark, manifest.watermark_seq if manifest else -1),
        partitions=partitions,
    )
    if not crash_before_commit:
        commit_manifest(lake_dir, new_manifest, expect_base=version - 1)
    dt = time.perf_counter() - t0
    timings["commit"] = dt - sum(timings.values())
    return {
        "events": int(total_events),
        "seconds": dt,
        "epochs": new_epochs,
        "partitions": len(rows),
        "events_per_sec": (total_events / dt) if dt > 0 else 0.0,
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }


@ray.remote
def _split_block(num_slots: int, *blocks: pa.Table, total: int = 0,
                 div: int = 1, offset: int = 0) -> tuple:
    """Split a group of combined blocks into their url-hash partitions (one
    return object per routing slot — a manual hash-shuffle map side).
    Accepting several blocks per task amortizes task scheduling when the map
    phase emits many small blocks. The routing slot is
    ``(url_hash % total) // div - offset`` (``total`` defaults to
    ``num_slots``): defaults give the plain single-level split; the
    two-level exchange (see shuffle.py) routes level 1 with ``div=G`` and
    level 2 with ``offset=s*G``."""
    total = total or num_slots
    # Ray Data can degrade a typed EMPTY output block to a zero-column block
    # (same failure family as the repo's union-branch invariant); they carry
    # no rows, so dropping them is exact.
    blocks = tuple(b for b in blocks
                   if b is not None and "url" in b.column_names)
    if not blocks:
        return (None,) * num_slots if num_slots > 1 else None
    block = blocks[0] if len(blocks) == 1 else pa.concat_tables(
        blocks, promote_options="default")
    pids = _url_pid(block["url"], total)
    if div != 1:
        pids = pids // div
    if offset:
        pids = pids - offset
    order = np.argsort(pids, kind="stable")
    sorted_block = block.take(pa.array(order))
    pids = pids[order]
    bounds = np.nonzero(np.diff(pids))[0] + 1
    starts = np.concatenate([[0], bounds, [len(pids)]]).astype(np.int64)
    out: list = [None] * num_slots
    for i in range(len(starts) - 1):
        lo, hi = int(starts[i]), int(starts[i + 1])
        if hi > lo:
            out[int(pids[lo])] = sorted_block.slice(lo, hi - lo)
    return tuple(out)


@ray.remote
def _combine_slices(key: str, ts: str, seq: str, *slices) -> Optional[pa.Table]:
    """Tree-reduce inner node: concat + LWW-combine a partition's slices.
    Associativity of the LWW reduction makes any fan-in grouping exact."""
    tables = [s for s in slices if s is not None and s.num_rows]
    if not tables:
        return None
    from raycdc.cdc.lww import lww_reduce

    return lww_reduce(pa.concat_tables(tables, promote_options="default"),
                      key, ts, seq)


@ray.remote
def _merge_task(merge: "MergePartition", pid: int, *slices) -> dict:
    tables = [s for s in slices if s is not None and s.num_rows]
    if not tables:
        return None
    group = pa.concat_tables(tables, promote_options="default")
    group = group.append_column(
        PID_COL, pa.array(np.full(group.num_rows, pid, dtype=np.int64)))
    t = merge(group)
    return {name: t[name][0].as_py() for name in t.column_names}


def _partitioned_merge(combined: ray.data.Dataset, merge: "MergePartition",
                       num_partitions: int) -> tuple[list[dict], float]:
    """Manual hash shuffle: the Dataset API's groupby imposes a sort-based
    shuffle (sample + sort + barrier + extra copies); an upsert merge only
    needs *partitioning*. Each combined block is split into its partitions
    by one remote task (``num_returns=P`` — slices stay in the object store,
    zero driver traffic), then one merge task per partition consumes its
    slices. This is the one place the engine drops below the Dataset API,
    precisely because the semantics (partition, don't order) aren't
    expressible without paying for a sort.
    """
    from raycdc.shuffle import _TWO_LEVEL_MIN_PARTITIONS

    t0 = time.perf_counter()
    two_level = num_partitions > _TWO_LEVEL_MIN_PARTITIONS
    if two_level:
        # √P super-partition routing, same plan as shuffle.partition_map:
        # single-level driver refs grow as chunks × P — ~10^9 at the
        # north-star's 65,536 partitions × 10^5 blocks.
        g_size = int(np.ceil(np.sqrt(num_partitions)))
        n_slots = -(-num_partitions // g_size)
    else:
        g_size, n_slots = 1, num_partitions
    # degenerate single partition: with num_returns=1 Ray would hand back
    # one ref to the whole 1-tuple (same guard as shuffle.partition_map) —
    # and no split is needed anyway: every block IS partition 0's slice
    split = _split_block.options(num_returns=n_slots) if n_slots > 1 else None
    per_block = []
    chunk: list = []
    chunk_size = 4

    def flush_chunk():
        if chunk:
            if split is None:
                per_block.extend(chunk)
            else:
                per_block.append(split.remote(
                    n_slots, *chunk, total=num_partitions, div=g_size))
            chunk.clear()

    try:
        # Stream blocks into split tasks as the map phase produces them —
        # no materialization barrier between map and shuffle-map.
        for bundle in combined.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                chunk.append(block_ref)
                if len(chunk) >= chunk_size:
                    flush_chunk()
    except AttributeError:  # older Ray: fall back to full materialization
        for block_ref in combined.to_arrow_refs():
            chunk.append(block_ref)
            if len(chunk) >= chunk_size:
                flush_chunk()
    flush_chunk()
    drain_s = time.perf_counter() - t0
    if two_level:
        # level 2: each super-group's slices split to its final partitions;
        # a level-2 task ingests ≤ n_slots slices of ~1/n_slots chunk each
        columns = [[] for _ in range(num_partitions)]
        l2_chunk = max(chunk_size, n_slots)
        for s in range(n_slots):
            lo = s * g_size
            gs = min(g_size, num_partitions - lo)
            slices = [refs[s] for refs in per_block]
            if gs == 1:
                # the super-group IS one final partition; no second split
                # (num_returns=1 would collapse the returned tuple)
                columns[lo] = slices
                continue
            split2 = _split_block.options(num_returns=gs)
            sub = [split2.remote(gs, *slices[i:i + l2_chunk],
                                 total=num_partitions, offset=lo)
                   for i in range(0, len(slices), l2_chunk)]
            for g in range(gs):
                columns[lo + g] = [r[g] for r in sub]
    elif n_slots == 1:
        columns = [list(per_block)]  # raw block refs are the slices
    else:
        columns = [[refs[pid] for refs in per_block]
                   for pid in range(num_partitions)]
    # Tree fan-in: one merge task per partition takes one slice argument per
    # split task, which at very large block counts (10^10-event jobs produce
    # tens of thousands of map blocks) would mean tens of thousands of task
    # arguments. Above _FANIN slices per partition, interleave a layer of
    # LWW-combining reduce tasks (exact: the reduction is associative).
    if max(map(len, columns), default=0) > _FANIN:
        key, ts, seq = merge.lww_cols
        columns = [
            col if len(col) <= _FANIN else
            [_combine_slices.remote(key, ts, seq, *col[i:i + _FANIN])
             for i in range(0, len(col), _FANIN)]
            for col in columns
        ]
    merge_refs = [
        _merge_task.remote(merge, pid, *columns[pid])
        for pid in range(num_partitions)
    ]
    return [r for r in ray.get(merge_refs) if r is not None], drain_s


@ray.remote(num_returns=2)
def _compact_partition(lake_dir: str, pid: int, files: list[str],
                       version: int) -> tuple:
    """Merge one partition's LSM run set into a single base file."""
    tables = [pq.read_table(os.path.join(lake_dir, f)) for f in files]
    merged = lww_reduce(concat_evolved(tables))
    merged = merged.take(pc.sort_indices(merged, sort_keys=[("url", "ascending")]))
    rel = f"part-{pid:05d}/v{version}.parquet"
    size = atomic_write_parquet(merged, os.path.join(lake_dir, rel))
    live = int(pc.sum(pc.cast(pc.invert(merged[DELETED_COL]), pa.int64())).as_py() or 0)
    return pid, {"file": rel, "rows": merged.num_rows, "live_rows": live,
                 "bytes": size}


def compact_lake(lake_dir: str) -> dict:
    """Maintenance compaction: collapse every partition's delta-run set
    (produced by the streaming engine's L0 flushes) into one base file per
    partition and commit a new manifest version.

    One parallel task per multi-file partition; single-file partitions are
    untouched. Readers are never blocked: until the commit, the old manifest
    (and its files) stay the visible truth; the commit is the usual atomic
    manifest replace. Returns {partitions_compacted, files_removed}.
    Holds the lake's writer lock (see sink.writer_lock).
    """
    with writer_lock(lake_dir):
        return _compact_lake_locked(lake_dir)


def _compact_lake_locked(lake_dir: str) -> dict:
    manifest = read_manifest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest in {lake_dir}")
    version = manifest.version + 1
    todo = {int(pid): manifest.partition_files(pid)
            for pid in manifest.partitions
            if len(manifest.partition_files(pid)) > 1}
    if not todo:
        return {"partitions_compacted": 0, "files_removed": 0}
    pid_refs, row_refs = [], []
    for pid, files in sorted(todo.items()):
        pr, rr = _compact_partition.remote(lake_dir, pid, files, version)
        pid_refs.append(pr)
        row_refs.append(rr)
    results = dict(zip(ray.get(pid_refs), ray.get(row_refs)))
    partitions = dict(manifest.partitions)
    removed = 0
    for pid, r in results.items():
        old = partitions[str(pid)]
        removed += len(old["files"])
        partitions[str(pid)] = {
            "files": [r["file"]], "rows": int(r["rows"]),
            "live_rows": int(r["live_rows"]), "bytes": int(r["bytes"]),
            "lineage": {**old.get("lineage", {}), "compacted_from": old["files"],
                        "version": version},
        }
    commit_manifest(lake_dir, LakeManifest(
        version=version, num_partitions=manifest.num_partitions,
        epochs_applied=manifest.epochs_applied,
        watermark_seq=manifest.watermark_seq, partitions=partitions),
        expect_base=version - 1)
    return {"partitions_compacted": len(results), "files_removed": removed}


def merge_into(
    lake_dir: str,
    source: ray.data.Dataset,
    *,
    num_partitions: Optional[int] = None,
    delete_col: Optional[str] = None,
) -> dict:
    """MERGE INTO the lake from an arbitrary flat Dataset (a fresh crawl
    snapshot, a correction batch, a backfill) — the general upsert surface
    for sources that are not WAL segments.

    ``source`` rows must carry the LWW key/order columns (``url``,
    ``warc_ts``, ``seq``); everything else is payload, unified into the
    lake schema at merge time (new columns evolve the schema, missing ones
    fill with nulls — the same rule as replay). A row wins against the
    lake's current row for its url iff its (warc_ts, seq) is greater: a
    stale source row loses silently, exactly like a late WAL event.
    ``delete_col`` names an optional boolean column marking deletion rows
    (tombstones) instead of upserts.

    Idempotent BY VALUE (not by epoch): re-merging the same source
    converges to the same state because the LWW reduction is idempotent —
    but unlike `apply_changelog` there is no epoch ledger to skip a repeat,
    so each call rewrites its touched partitions and bumps the version.
    ``epochs_applied``/``watermark_seq`` are NOT advanced: they track WAL
    offsets only, and a merge is not a WAL read.
    Holds the lake's writer lock (see sink.writer_lock).
    """
    with writer_lock(lake_dir):
        return _merge_into_locked(lake_dir, source,
                                  num_partitions=num_partitions,
                                  delete_col=delete_col)


def _merge_into_locked(
    lake_dir: str,
    source: ray.data.Dataset,
    *,
    num_partitions: Optional[int],
    delete_col: Optional[str],
) -> dict:
    t0 = time.perf_counter()
    manifest = read_manifest(lake_dir)
    if manifest is not None:
        if num_partitions is not None \
                and num_partitions != manifest.num_partitions:
            raise ValueError(
                f"lake has {manifest.num_partitions} partitions, got "
                f"{num_partitions} (repartition_lake first)")
        num_partitions = manifest.num_partitions
    elif num_partitions is None:
        num_partitions = 16
    version = (manifest.version + 1) if manifest else 1

    from raycdc.joins import _pa_schema

    sschema = _pa_schema(source)
    for col in ("url", "warc_ts", "seq"):
        if col not in sschema.names:
            raise ValueError(f"merge_into source must carry {col!r}")
    if delete_col is None and DELETED_COL in sschema.names:
        # e.g. a read_lake(include_deleted=True) export: treat the lake's
        # own tombstone column as the implicit delete_col instead of
        # duplicating it and failing opaquely in the LWW combiner
        delete_col = DELETED_COL
    elif delete_col is not None and delete_col != DELETED_COL \
            and DELETED_COL in sschema.names:
        raise ValueError(
            f"merge_into source already carries {DELETED_COL!r}; pass it "
            f"as delete_col or drop it — it would collide with the "
            f"tombstone column the merge appends")

    def to_rows(t: pa.Table) -> pa.Table:
        if delete_col is not None:
            deleted = pc.fill_null(pc.cast(t[delete_col], pa.bool_()), False)
            t = t.drop_columns([delete_col])
        else:
            deleted = pa.array(np.zeros(t.num_rows, dtype=bool))
        return t.append_column(DELETED_COL, deleted)

    combined = source.map_batches(to_rows, batch_format="pyarrow") \
        .map_batches(LocalLwwCombiner(), batch_format="pyarrow")

    base_files = {}
    epochs = []
    if manifest:
        base_files = {int(pid): manifest.partition_files(pid)
                      for pid in manifest.partitions}
        epochs = manifest.epochs_applied
    merge = MergePartition(lake_dir, version, base_files, epochs)
    rows, _ = _partitioned_merge(combined, merge, num_partitions)

    partitions = dict(manifest.partitions) if manifest else {}
    source_rows = 0
    for r in rows:
        source_rows += int(r["delta_rows"])
        partitions[str(r["pid"])] = {
            "files": [r["file"]],
            "rows": int(r["rows"]),
            "live_rows": int(r["live_rows"]),
            "bytes": int(r["bytes"]),
            "lineage": {"epochs": epochs, "version": version,
                        "delta_rows": int(r["delta_rows"]),
                        "merge": True},
        }
    commit_manifest(lake_dir, LakeManifest(
        version=version,
        num_partitions=num_partitions,
        epochs_applied=epochs,
        watermark_seq=manifest.watermark_seq if manifest else -1,
        partitions=partitions,
    ), expect_base=version - 1)
    dt = time.perf_counter() - t0
    return {"delta_rows": source_rows, "partitions": len(rows),
            "version": version, "seconds": round(dt, 3)}


def repartition_lake(lake_dir: str, num_partitions: int) -> dict:
    """Re-route the lake to a new url-hash partition count (scale the lake
    out/in as it grows/shrinks) — one read task per old partition, the same
    split + merge exchange as the apply path, one atomic manifest commit.

    State is preserved exactly: every row (INCLUDING tombstones — replay
    idempotence needs them) lands in its new partition, each new partition
    file is LWW-reduced and url-sorted like any apply output, and
    ``epochs_applied``/``watermark_seq`` carry over so subsequent
    ``apply_changelog`` calls (with the NEW count) resume exactly where the
    old layout stopped. Earlier snapshots keep the old layout — time travel
    still works; ``lake_changes`` across the boundary raises (by design:
    partition pruning compares like-for-like layouts only). A crash before
    the commit leaves the head untouched; re-running converges (writes are
    atomic and deterministic). Holds the lake's writer lock (see
    sink.writer_lock).
    """
    with writer_lock(lake_dir):
        return _repartition_lake_locked(lake_dir, num_partitions)


def _repartition_lake_locked(lake_dir: str, num_partitions: int) -> dict:
    head = read_manifest(lake_dir)
    if head is None:
        raise FileNotFoundError(f"no committed manifest in {lake_dir}")
    if head.num_partitions == num_partitions:
        return {"noop": True, "version": head.version,
                "num_partitions": num_partitions, "partitions": 0}
    t0 = time.perf_counter()
    version = head.version + 1
    per_part = {pid: head.partition_files(pid)
                for pid in sorted(head.partitions, key=int)}
    all_files = [os.path.join(lake_dir, f)
                 for files in per_part.values() for f in files]
    target = unify([pq.read_schema(f) for f in all_files])
    refs = [_read_partition.remote(lake_dir, files, target)
            for files in per_part.values() if files]
    ds = ray.data.from_arrow_refs(refs)
    merge = MergePartition(lake_dir, version, {}, head.epochs_applied)
    rows, _ = _partitioned_merge(ds, merge, num_partitions)
    partitions = {}
    for r in rows:
        partitions[str(r["pid"])] = {
            "files": [r["file"]],
            "rows": int(r["rows"]),
            "live_rows": int(r["live_rows"]),
            "bytes": int(r["bytes"]),
            "lineage": {"epochs": head.epochs_applied, "version": version,
                        "delta_rows": int(r["delta_rows"]),
                        "repartitioned_from": head.num_partitions},
        }
    commit_manifest(lake_dir, LakeManifest(
        version=version,
        num_partitions=num_partitions,
        epochs_applied=head.epochs_applied,
        watermark_seq=head.watermark_seq,
        partitions=partitions,
    ), expect_base=version - 1)
    return {"noop": False, "version": version,
            "num_partitions": num_partitions, "partitions": len(rows),
            "seconds": round(time.perf_counter() - t0, 3)}


def read_partition_table(lake_dir: str, files: list[str],
                         target: pa.Schema) -> pa.Table:
    """Read one partition's LSM run set and LWW-merge it (delta files from
    the streaming engine may supersede base rows). Only ``target``'s
    columns are decoded — a pruned read never touches the other columns'
    pages. The single-file path skips the reduce — sound ONLY while every
    lake file is url-unique (the writer contract deep fsck polices).

    Plain function (not a Ray task) so a task that must read several
    partitions — the co-partitioned join — can call it without nesting
    remote calls; :func:`_read_partition` is the one-partition task
    wrapper. THE one read path: fixes here reach every reader."""
    tables = []
    for f in files:
        path = os.path.join(lake_dir, f)
        names = [n for n in pq.read_schema(path).names if n in target.names]
        tables.append(pq.read_table(path, columns=names))
    if not tables:
        merged = target.empty_table()
    elif len(tables) > 1:
        merged = lww_reduce(concat_evolved(tables))
    else:
        merged = tables[0]
    from raycdc.cdc.evolve import align_to_schema

    return align_to_schema(merged, target)


@ray.remote
def _read_partition(lake_dir: str, files: list[str],
                    target: pa.Schema) -> pa.Table:
    return read_partition_table(lake_dir, files, target)


@ray.remote
def _lookup_partition(lake_dir: str, files: list[str], target: pa.Schema,
                      urls: list[str], include_deleted: bool) -> pa.Table:
    """Point-read one partition: parquet row-group pruning does the heavy
    lifting (partition files are url-SORTED, so a handful of urls touches a
    handful of row groups), then LWW across the partition's run set.
    Filtering to the requested urls BEFORE the reduce is sound — the
    reduction is per-url."""
    expr = pc.field("url").isin(urls)
    tables = [pq.read_table(os.path.join(lake_dir, f), filters=expr)
              for f in files]
    merged = lww_reduce(concat_evolved(tables)) if len(tables) > 1 \
        else tables[0]
    merged = align_to_schema(merged, target)
    if not include_deleted:
        merged = merged.filter(
            pc.invert(pc.fill_null(merged[DELETED_COL], False))
        ).drop_columns([DELETED_COL])
    return merged


def lookup_urls(lake_dir: str, urls: list[str], *,
                columns: Optional[list[str]] = None,
                include_deleted: bool = False,
                as_of_version: Optional[int] = None,
                as_of_epoch: Optional[int] = None) -> pa.Table:
    """Point lookup: the current (or as-of) row for each given url.

    The serving-path read: urls hash straight to their partitions, so the
    lookup opens ONLY the partitions the keys live in (≤ len(urls) of
    them), and inside each file the url-sorted layout lets parquet
    row-group statistics prune the scan. Absent and (by default)
    tombstoned urls simply do not appear — point-lookup semantics. Returns
    an url-sorted Arrow table (lookups are small by contract; the result
    never needs a Dataset)."""
    manifest = _resolve_manifest(lake_dir, as_of_version, as_of_epoch)
    uarr = pa.array(list(urls), pa.string())
    pids = _url_pid(pa.chunked_array([uarr]), manifest.num_partitions)
    by_pid: dict[int, list[str]] = {}
    for u, pid in zip(urls, pids):
        by_pid.setdefault(int(pid), []).append(u)
    touched = {pid: manifest.partition_files(pid) for pid in sorted(by_pid)}
    all_files = [os.path.join(lake_dir, f)
                 for fs in touched.values() for f in fs]
    if not all_files:
        # every requested url hashes to a partition with no files: type the
        # empty result from any committed file (point-lookup miss, not error)
        any_files = sorted({f for pid in manifest.partitions
                            for f in manifest.partition_files(pid)})
        if not any_files:
            raise FileNotFoundError(f"no committed files in {lake_dir}")
        all_files = [os.path.join(lake_dir, any_files[0])]
        touched = {}
    target = unify([pq.read_schema(f) for f in all_files])
    if not touched:
        empty = pa.schema([f for f in target if include_deleted
                           or f.name != DELETED_COL]).empty_table()
        return empty.select(columns) if columns is not None else empty
    refs = [_lookup_partition.remote(lake_dir, fs, target, by_pid[pid],
                                     include_deleted)
            for pid, fs in touched.items() if fs]
    out = pa.concat_tables(ray.get(refs), promote_options="default")
    # sort BEFORE projecting: a columns list omitting 'url' must still get
    # the url-sorted result contract, not an ArrowInvalid from sort_indices
    out = out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))
    if columns is not None:
        out = out.select(columns)
    return out


def _resolve_manifest(lake_dir: str, as_of_version, as_of_epoch):
    """Pick the manifest a read should resolve through.

    ``as_of_version`` names a retained snapshot exactly; ``as_of_epoch``
    picks the NEWEST committed manifest whose applied epochs all fall at or
    before that epoch (so a later compaction of the same epochs wins).
    Only versions ≤ the head are committed truth — a crash between the
    snapshot write and the head replace can orphan a newer snapshot."""
    from raycdc.cdc.sink import list_snapshots

    head = read_manifest(lake_dir)
    if head is None:
        raise FileNotFoundError(f"no committed manifest in {lake_dir}")
    if as_of_version is not None and as_of_epoch is not None:
        raise ValueError("pass as_of_version OR as_of_epoch, not both")
    if as_of_version is None and as_of_epoch is None:
        return head
    if as_of_version is not None:
        if as_of_version > head.version:
            raise ValueError(
                f"version {as_of_version} is not committed "
                f"(head is v{head.version})")
        m = read_manifest(lake_dir, version=as_of_version)
        if m is None:
            raise ValueError(
                f"no retained snapshot v{as_of_version} in {lake_dir} "
                f"(expired? see expire_snapshots)")
        return m
    versions = {v for v in list_snapshots(lake_dir) if v <= head.version}
    versions.add(head.version)  # pre-snapshot lakes have a head only
    for v in sorted(versions, reverse=True):
        m = head if v == head.version else read_manifest(lake_dir, version=v)
        if m is not None and m.epochs_applied \
                and max(m.epochs_applied) <= as_of_epoch:
            return m
    raise ValueError(
        f"no committed snapshot at or before epoch {as_of_epoch} "
        f"in {lake_dir}")


def read_lake(lake_dir: str, include_deleted: bool = False, *,
              columns: Optional[list[str]] = None,
              as_of_version: Optional[int] = None,
              as_of_epoch: Optional[int] = None) -> ray.data.Dataset:
    """Read the committed lake state (manifest-resolved files only), LWW-
    merging per-partition delta runs and unifying evolved schemas (missing
    columns → nulls).

    ``columns`` prunes AT THE SCAN (parquet column projection — a
    two-column read never decodes the html payload); the LWW order columns
    are still read internally when a partition has a multi-file run set to
    merge, but only the requested columns leave the read.

    Time travel: ``as_of_epoch=k`` reads the lake as it stood once every
    epoch ≤ k was applied (exactly the state a replay of the WAL prefix
    would produce); ``as_of_version=v`` reads a specific retained manifest
    snapshot. History is retained until ``expire_snapshots`` + ``vacuum``.
    """
    manifest = _resolve_manifest(lake_dir, as_of_version, as_of_epoch)
    if not manifest.partitions:
        raise FileNotFoundError(f"no committed manifest in {lake_dir}")
    per_part = {pid: manifest.partition_files(pid)
                for pid in sorted(manifest.partitions, key=int)}
    all_files = [os.path.join(lake_dir, f)
                 for files in per_part.values() for f in files]
    file_schemas = [pq.read_schema(f) for f in all_files]
    target = unify(file_schemas)
    prune = None
    if columns is not None:
        unknown = [c for c in columns if c not in target.names]
        if unknown:
            raise KeyError(f"columns not in lake schema: {unknown} "
                           f"(have {target.names})")
        # the multi-file merge needs the LWW order columns and the
        # tombstone flag even when the caller did not ask for them
        prune = list(dict.fromkeys(
            list(columns) + ["url", "warc_ts", "seq", DELETED_COL]))
        target = pa.schema([f for f in target if f.name in prune])
    if all(len(files) == 1 for files in per_part.values()) \
            and (prune is None
                 or all(set(prune) <= set(s.names) for s in file_schemas)):
        # fully compacted lake: plain parallel parquet scan. The pruned
        # projection is pushed into the read only when every file carries
        # every requested column (read_parquet's `columns` kwarg rejects
        # files that predate an evolved column; those lakes take the
        # per-partition path below, which intersects per file).
        kw = {"columns": list(target.names)} if prune is not None else {}
        ds = ray.data.read_parquet(all_files, schema=target, **kw)
    else:
        refs = [_read_partition.remote(lake_dir, files, target)
                for files in per_part.values() if files]
        ds = ray.data.from_arrow_refs(refs)

    sel = None
    if columns is not None:
        sel = list(dict.fromkeys(
            list(columns) + ([DELETED_COL] if include_deleted else [])))
    if include_deleted and sel is None:
        return ds

    def finalize(t: pa.Table) -> pa.Table:
        if not include_deleted:
            t = t.filter(
                pc.invert(pc.fill_null(t[DELETED_COL], False))
            ).drop_columns([DELETED_COL])
        if sel is not None:
            t = t.select(sel)
        return t

    return ds.map_batches(finalize, batch_format="pyarrow")


def _changed_pids(m_old, m_new) -> list[int]:
    """Partitions whose manifest file sets differ between two versions.
    Writers never reuse a (partition, version) file name for different
    content, so identical file lists imply identical partition state —
    a CDF read can prune every unchanged partition without opening it."""
    pids = {int(p) for p in m_old.partitions} | \
           {int(p) for p in m_new.partitions}
    return sorted(p for p in pids
                  if m_old.partition_files(p) != m_new.partition_files(p))


def _live_view(lake_dir: str, manifest, pids: list[int],
               target: pa.Schema) -> ray.data.Dataset:
    """The live (tombstones dropped) rows of the given partitions under
    the given manifest, aligned to ``target``."""
    from raycdc.joins import pin_schema

    refs = [_read_partition.remote(lake_dir, manifest.partition_files(pid),
                                   target)
            for pid in pids if manifest.partition_files(pid)]
    ds = ray.data.from_arrow_refs(refs) if refs \
        else ray.data.from_arrow(target.empty_table())
    out = ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.fill_null(t[DELETED_COL], False))
        ).drop_columns([DELETED_COL]),
        batch_format="pyarrow")
    # an all-pruned (or all-tombstone) view has zero rows and loses its
    # schema through map_batches (repo invariant) — pin it so table_diff
    # can always derive its tagged schemas
    return pin_schema(
        out, pa.schema([f for f in target if f.name != DELETED_COL]))


def lake_changes(
    lake_dir: str,
    *,
    from_version: Optional[int] = None,
    from_epoch: Optional[int] = None,
    to_version: Optional[int] = None,
    to_epoch: Optional[int] = None,
    compare_cols: Optional[list[str]] = None,
    num_partitions: int = 16,
    include_old: bool = False,
) -> ray.data.Dataset:
    """Change data feed between two committed lake states: one ``I``/``U``/
    ``D`` row per url whose live value differs (the ``cdc/diff.table_diff``
    contract — new values for I/U, nulls for D, ``IS DISTINCT FROM``
    comparison over ``compare_cols``, default every non-nested non-key
    column;
    ``include_old`` adds ``old_<c>`` columns carrying the previous values
    for U/D rows — what an incremental view maintainer consumes).

    Reads ONLY partitions whose manifest file sets differ between the two
    versions — unchanged partitions are pruned at the manifest, so the scan
    is sized by the churn, not the corpus. Each endpoint resolves like
    ``read_lake``: by version, by epoch (newest manifest with all applied
    epochs ≤ it), or the head when neither is given.
    """
    from raycdc.cdc.diff import table_diff

    m_old = _resolve_manifest(lake_dir, from_version, from_epoch)
    m_new = _resolve_manifest(lake_dir, to_version, to_epoch)
    if m_old.num_partitions != m_new.num_partitions:
        raise ValueError("lake partition count changed between versions")
    changed = _changed_pids(m_old, m_new)
    files = sorted({f for m in (m_old, m_new) for pid in changed
                    for f in m.partition_files(pid)})
    if not files:
        # identical manifests: type the empty feed from any live file
        files = sorted({f for pid in m_new.partitions
                        for f in m_new.partition_files(pid)})[:1]
    target = unify([pq.read_schema(os.path.join(lake_dir, f))
                    for f in files])
    if compare_cols is None:
        # nested payloads (merge_into admits e.g. fixed_size_list
        # embeddings) are excluded from the default compare set — the same
        # Acero/not_equal limitation cojoin's defaults honor; a row whose
        # ONLY change is a nested column emits no feed row under the
        # default (compare it via a binary-blob column upstream instead).
        # Passing such a column explicitly raises upfront in table_diff.
        compare_cols = [n for n in target.names
                        if n not in ("url", DELETED_COL)
                        and not pa.types.is_nested(target.field(n).type)]
    return table_diff(
        _live_view(lake_dir, m_old, changed, target),
        _live_view(lake_dir, m_new, changed, target),
        key_cols=["url"], compare_cols=compare_cols,
        num_partitions=num_partitions, include_old=include_old)


def oracle_final_state(events: pa.Table) -> pa.Table:
    """In-memory oracle for tests: expected final lake state from the raw
    nested event table (winner per url by (warc_ts, seq); deletes dropped)."""
    from raycdc.record_flatten import flatten_record_table

    flat = flatten_record_table(events)
    flat = flat.rename_columns([c.split(".")[-1] for c in flat.column_names])
    flat = to_versioned_rows(flat.drop_columns(["epoch"]))
    win = lww_reduce(flat)
    win = win.filter(pc.invert(win[DELETED_COL]))
    return win.take(pc.sort_indices(win, sort_keys=[("url", "ascending")]))
