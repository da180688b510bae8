"""Streaming CDC engine: per-partition stateful merge actors (LSM-lite).

The batch path (:mod:`raycdc.cdc.apply`) re-merges a partition's base file on
every commit. When tailing a live WAL with many small epochs that is wasteful;
the north star calls for *stateful actor pools keeping an LSM-style in-memory
delta map keyed (url, warc_ts) with last-writer-wins*. This module is that
path — the one place the engine drops below the Dataset API, because a
shared mutable index across micro-batches is exactly what ``map_batches``
cannot express (stateless tasks; actor pools shard by batch, not by key).

Topology::

    segment Dataset ─ map_batches(PartitionRouter) ─┐   (stateless tasks,
                                                    ├─► MergeActor[pid]   xP
    counts / acks  ◄────────────────────────────────┘   (ray.remote actors)

- ``PartitionRouter`` splits each flattened batch by ``hash(url) % P`` and
  pushes the slices to the owning actor (zero-copy Arrow through the object
  store); it returns only row counts, so the Dataset pipeline stays tiny.
- ``MergeActor`` holds the partition's memtable: appended Arrow deltas,
  LWW-compacted in place when they exceed a row budget (the L0 of an LSM).
  ``flush(version)`` merges memtable + base file, writes the new partition
  file atomically and returns a manifest row; the driver commits the epoch's
  manifest exactly like the batch path (same files, same manifest schema, so
  batch and streaming runs are interchangeable and equally resumable).

Ordering: all events of a url route to one actor; within the actor the LWW
reduction orders by (warc_ts, seq) — global ordering is never needed
(SURVEY.md §7 "Ordered replay vs parallelism").
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from raycdc.cdc.apply import (
    PID_COL,
    _footer_infos,
    _segment_epoch,
    _url_pid,
    discover_segments,
)
from raycdc.cdc.evolve import concat_evolved
from raycdc.cdc.lww import DELETED_COL, lww_reduce, to_versioned_rows
from raycdc.cdc.sink import LakeManifest, atomic_write_parquet, commit_manifest, \
    read_manifest, writer_lock
from raycdc.record_flatten import RecordFlattener


@ray.remote
class MergeActor:
    """Owns one url-hash partition: in-memory LWW memtable + on-disk LSM runs.

    ``flush`` writes only the memtable as a new L0 delta file — the base is
    NOT rewritten per epoch (that would be O(partition) write amplification
    per commit). When the run set exceeds ``compact_threshold`` files, flush
    performs a full compaction into a single base. Readers LWW-merge the run
    set (apply.read_lake), which is order-independent.
    """

    def __init__(self, pid: int, lake_dir: str, files: Optional[list[str]],
                 memtable_budget_rows: int = 200_000,
                 compact_threshold: int = 4):
        self.pid = pid
        self.lake_dir = lake_dir
        self.files: list[str] = list(files or [])
        self.fragments: list[pa.Table] = []
        self.frag_rows = 0
        self.budget = memtable_budget_rows
        self.compact_threshold = compact_threshold
        self.ingested = 0

    def ingest(self, delta: pa.Table) -> int:
        """Append a delta fragment; compact the memtable when over budget."""
        self.fragments.append(delta)
        self.frag_rows += delta.num_rows
        self.ingested += delta.num_rows
        if self.frag_rows > self.budget:
            self._compact_memtable()
        return delta.num_rows

    def _compact_memtable(self) -> None:
        merged = lww_reduce(concat_evolved(self.fragments))
        self.fragments = [merged]
        self.frag_rows = merged.num_rows

    def flush(self, version: int) -> dict:
        """Persist the memtable as an L0 delta (or fully compact)."""
        if not self.fragments and not self.files:
            return {"pid": self.pid, "files": [], "rows": 0,
                    "live_rows": None, "bytes": 0, "delta_rows": 0}
        delta_rows = self.ingested
        if not self.fragments:
            # nothing new this epoch: keep the existing run set AND tell the
            # driver to leave the manifest entry alone — overwriting it with
            # rows=0/bytes=0 and this epoch's lineage would corrupt lake
            # stats and fail fsck's footer check on a healthy partition
            return {"pid": self.pid, "files": list(self.files), "rows": 0,
                    "live_rows": None, "bytes": 0, "delta_rows": 0,
                    "unchanged": True}
        if len(self.files) + 1 > self.compact_threshold:
            # full compaction: merge base + deltas + memtable into one run
            tables = [pq.read_table(os.path.join(self.lake_dir, f))
                      for f in self.files] + self.fragments
            merged = lww_reduce(concat_evolved(tables))
            merged = merged.take(
                pc.sort_indices(merged, sort_keys=[("url", "ascending")]))
            rel = f"part-{self.pid:05d}/v{version}.parquet"
            size = atomic_write_parquet(merged,
                                        os.path.join(self.lake_dir, rel))
            live = int(pc.sum(pc.cast(pc.invert(merged[DELETED_COL]),
                                      pa.int64())).as_py() or 0)
            self.files = [rel]
            out = {"pid": self.pid, "files": [rel], "rows": merged.num_rows,
                   "live_rows": live, "bytes": size, "delta_rows": delta_rows}
        else:
            memtable = lww_reduce(concat_evolved(self.fragments))
            memtable = memtable.take(
                pc.sort_indices(memtable, sort_keys=[("url", "ascending")]))
            rel = f"part-{self.pid:05d}/d{version}.parquet"
            size = atomic_write_parquet(memtable,
                                        os.path.join(self.lake_dir, rel))
            self.files.append(rel)
            out = {"pid": self.pid, "files": list(self.files),
                   "rows": memtable.num_rows, "live_rows": None,
                   "bytes": size, "delta_rows": delta_rows}
        self.fragments, self.frag_rows, self.ingested = [], 0, 0
        return out


class PartitionRouter:
    """Stateless map_batches stage that pushes per-partition slices to the
    merge actors and emits only counts (backpressure via bounded in-flight
    acks per task)."""

    def __init__(self, actor_handles: list, num_partitions: int,
                 max_in_flight: int = 32):
        self.actors = actor_handles
        self.p = num_partitions
        self.max_in_flight = max_in_flight
        self.flatten = RecordFlattener(rename_strategy="leaf")
        self.pending: list = []

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = self.flatten(batch)
        flat = to_versioned_rows(flat.drop_columns(["epoch"]))
        flat = lww_reduce(flat)  # local combine before routing
        pids = _url_pid(flat["url"], self.p)
        order = np.argsort(pids, kind="stable")
        flat = flat.take(pa.array(order))
        pids = pids[order]
        bounds = np.nonzero(np.diff(pids))[0] + 1
        starts = np.concatenate([[0], bounds, [len(pids)]])
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            if hi == lo:
                continue
            pid = int(pids[lo])
            self.pending.append(
                self.actors[pid].ingest.remote(flat.slice(lo, hi - lo)))
            if len(self.pending) >= self.max_in_flight:
                done, self.pending = ray.wait(
                    self.pending, num_returns=len(self.pending) // 2)
                # fetch, don't just drop: a discarded errored ref would be
                # treated as an ack and its events silently lost (epoch-skip
                # means the segment is never replayed)
                ray.get(done)
        # Drain ALL acks before this batch returns: actor messages from
        # different senders are unordered, so the driver's flush() could
        # otherwise overtake in-flight ingests and miss (or even lose, at
        # shutdown) routed events. An ack means the actor has fully executed
        # the ingest, so "routed dataset complete" ⇒ "every event ingested".
        if self.pending:
            ray.get(self.pending)
            self.pending = []
        return pa.table({"routed": pa.array([flat.num_rows], pa.int64())})


@ray.remote
def _route_chunk(actor_handles: list, num_partitions: int, path: str,
                 row_groups: list) -> int:
    """One routing task: read a row-group slice of a segment, flatten +
    LWW-combine + push per-partition slices to the merge actors (reuses
    PartitionRouter's kernel); returns the routed (post-combine) row
    count after all ingest acks have drained."""
    t = pq.ParquetFile(path).read_row_groups(row_groups)
    router = PartitionRouter(actor_handles, num_partitions)
    out = router(t)
    return int(out["routed"][0].as_py())


class CdcEngine:
    """Tail a changelog directory with a persistent merge-actor pool.

    One commit per ``advance()`` call (or per epoch in ``tail()``); produces
    the same manifest/lake layout as the batch path.
    """

    def __init__(self, changelog_dir: str, lake_dir: str,
                 num_partitions: int = 8,
                 memtable_budget_rows: int = 200_000,
                 compact_threshold: int = 4):
        self.changelog_dir = changelog_dir
        self.lake_dir = lake_dir
        self.p = num_partitions
        manifest = read_manifest(lake_dir)
        if manifest and manifest.num_partitions != num_partitions:
            raise ValueError("partition count mismatch with committed lake")
        base = {int(k): manifest.partition_files(k)
                for k in manifest.partitions} if manifest else {}
        self.manifest = manifest
        self.actors = [
            MergeActor.remote(pid, lake_dir, base.get(pid),
                              memtable_budget_rows, compact_threshold)
            for pid in range(num_partitions)
        ]

    def _unapplied(self) -> list[tuple[int, str]]:
        applied = set(self.manifest.epochs_applied) if self.manifest else set()
        return [(e, p) for p in discover_segments(self.changelog_dir)
                if (e := _segment_epoch(p)) not in applied]

    def advance(self, max_epochs: int = 1,
                max_in_flight_tasks: int = 16) -> dict:
        """Ingest up to ``max_epochs`` unapplied epochs and commit once.

        The read+route phase is raw Ray tasks over row-group splits rather
        than a Ray Data pipeline: a streaming commit pays this phase once
        PER COMMIT, and the Dataset executor's ~0.5 s spin-up dominated the
        measured per-commit fixed cost (BASELINE.md cadence table). The
        driver bounds in-flight routing tasks (backpressure); each task
        additionally bounds its in-flight actor-ingest acks.

        Holds the lake's writer lock per commit; the commit itself CASes on
        the head version — if a batch apply_changelog (or another engine)
        advanced the lake between this engine's commits, its cached base
        files are stale and committing would clobber that writer's state,
        so the commit raises loudly instead.
        """
        with writer_lock(self.lake_dir):
            return self._advance_locked(max_epochs, max_in_flight_tasks)

    def _advance_locked(self, max_epochs: int,
                        max_in_flight_tasks: int) -> dict:
        todo = self._unapplied()[:max_epochs]
        if not todo:
            return {"events": 0, "epochs": []}
        epochs = [e for e, _ in todo]
        paths = [p for _, p in todo]
        version = (self.manifest.version + 1) if self.manifest else 1

        infos = _footer_infos(paths)
        raw_events = sum(i[1] for i in infos)
        watermark = max(i[0] for i in infos)
        # row-group-granular routing tasks, bounded in flight (row-group
        # counts come from the one parallel footer pass above — no extra
        # footer opens)
        specs = []
        for p, info in zip(paths, infos):
            n_rg = info[3]
            for rg in range(0, n_rg, 2):
                specs.append((p, list(range(rg, min(rg + 2, n_rg)))))
        pending, counts = [], []
        for spec in specs:
            pending.append(_route_chunk.remote(
                self.actors, self.p, spec[0], spec[1]))
            if len(pending) >= max_in_flight_tasks:
                done, pending = ray.wait(pending, num_returns=1)
                counts.extend(ray.get(done))
        counts.extend(ray.get(pending))
        total = sum(counts)

        flush_rows = ray.get([a.flush.remote(version) for a in self.actors])
        partitions = dict(self.manifest.partitions) if self.manifest else {}
        for r in flush_rows:
            if not r["files"] or r.get("unchanged"):
                continue  # quiet partition: its committed entry stays truth
            partitions[str(r["pid"])] = {
                "files": r["files"], "rows": int(r["rows"]),
                "live_rows": r["live_rows"], "bytes": int(r["bytes"]),
                "lineage": {"epochs": epochs, "version": version,
                            "delta_rows": int(r["delta_rows"])},
            }
        applied = set(self.manifest.epochs_applied) if self.manifest else set()
        new_manifest = LakeManifest(
            version=version, num_partitions=self.p,
            epochs_applied=sorted(applied | set(epochs)),
            watermark_seq=max(watermark,
                              self.manifest.watermark_seq if self.manifest else -1),
            partitions=partitions)
        commit_manifest(self.lake_dir, new_manifest,
                        expect_base=version - 1)
        self.manifest = new_manifest
        return {"events": int(raw_events), "routed_rows": int(total),
                "epochs": epochs}

    def tail(self, epochs_per_commit: int = 1) -> dict:
        """Apply everything unapplied. ``epochs_per_commit`` trades commit
        frequency (bounded recovery window) against per-commit fixed costs —
        1 = a manifest per epoch; larger batches amortize pipeline spin-up."""
        totals = {"events": 0, "epochs": []}
        while True:
            m = self.advance(epochs_per_commit)
            if not m["epochs"]:
                return totals
            totals["events"] += m["events"]
            totals["epochs"] += m["epochs"]

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
