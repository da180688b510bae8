"""Exactly-once Parquet lake sink: per-partition files + atomic manifest.

Layout::

    lake_dir/
      _manifest.json            # the ONLY committed truth
      part-00000/v3.parquet     # content-addressed: (partition, table version)
      part-00001/v3.parquet
      ...

Two-phase commit: (1) every merge task writes its partition file under a
deterministic name ``part-{pid}/v{version}.parquet`` via tmp + ``os.replace``
(idempotent on retry — a re-executed task rewrites identical bytes); (2) the
driver atomically replaces ``_manifest.json`` listing the surviving file per
partition, the applied epochs, the sequence watermark, and per-partition
lineage. A crash before (2) leaves orphan files that are simply not visible;
re-running the epoch converges to the identical committed state (tested).

Readers resolve data strictly through the manifest, so partially-written
states are never observable. This is the engine's counterpart of the host
platform persistence the reference delegates to CDAP (SURVEY.md §2
sources/sinks note) plus the north star's per-partition lineage requirement.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
from typing import Any, Optional

MANIFEST_NAME = "_manifest.json"
SNAPSHOT_DIR = "_manifests"
LOCK_NAME = ".writer.lock"


@contextlib.contextmanager
def writer_lock(lake_dir: str):
    """Single-writer guard for a lake: an exclusive, non-blocking flock on
    ``lake_dir/.writer.lock`` held for the whole job (version allocation →
    file writes → manifest commit). Two concurrent writers would both read
    head vN, both write ``part-X/v{N+1}.parquet`` with DIFFERENT bytes (last
    ``os.replace`` wins) and the committed manifest could reference the
    loser's bytes — silently losing an epoch and breaking the
    (partition, version)-content-addressing invariant vacuum and CDF pruning
    rely on. The lock is released automatically if the holder crashes.

    Contention raises immediately (retry after the holder commits — the
    retry re-reads the head and converges). Works on any POSIX filesystem
    the coordinating drivers share; on shared object storage, replace with
    a conditional put — ``commit_manifest(expect_base=...)`` is the
    commit-time CAS backstop either way.
    """
    import fcntl

    os.makedirs(lake_dir, exist_ok=True)
    f = open(os.path.join(lake_dir, LOCK_NAME), "w")
    try:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            raise RuntimeError(
                f"another writer holds the lake lock on {lake_dir}; "
                f"retry after it commits") from None
        yield
    finally:
        try:
            fcntl.flock(f, fcntl.LOCK_UN)
        finally:
            f.close()


@dataclasses.dataclass
class LakeManifest:
    version: int
    num_partitions: int
    epochs_applied: list[int]
    watermark_seq: int
    # pid -> {files: [rel...], rows, bytes, lineage}. ``files`` is the
    # partition's LSM run set (base + L0 deltas); the LWW reduction is
    # order-independent, so readers may merge them in any order.
    partitions: dict[str, dict[str, Any]]

    def partition_files(self, pid) -> list[str]:
        info = self.partitions.get(str(pid))
        if not info:
            return []
        if "files" in info:
            return list(info["files"])
        return [info["file"]]  # pre-LSM manifests

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "LakeManifest":
        d = json.loads(text)
        return LakeManifest(
            version=d["version"],
            num_partitions=d["num_partitions"],
            epochs_applied=list(d["epochs_applied"]),
            watermark_seq=d["watermark_seq"],
            partitions=dict(d["partitions"]),
        )


def manifest_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, MANIFEST_NAME)


def snapshot_path(lake_dir: str, version: int) -> str:
    return os.path.join(lake_dir, SNAPSHOT_DIR, f"v{version:06d}.json")


def list_snapshots(lake_dir: str) -> list[int]:
    """Retained snapshot manifest versions, ascending. Includes any
    uncommitted orphan a crash left behind (version > head) — callers that
    need committed-only must clamp to ``head.version``."""
    d = os.path.join(lake_dir, SNAPSHOT_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def read_manifest(lake_dir: str,
                  version: Optional[int] = None) -> Optional[LakeManifest]:
    """Read the head manifest (``version=None``) or a retained snapshot.

    Snapshot reads fall back to the head when it carries the requested
    version — lakes committed before snapshots existed have a head but no
    ``_manifests/`` history."""
    path = manifest_path(lake_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        head = LakeManifest.from_json(f.read())
    if version is None or version == head.version:
        return head
    spath = snapshot_path(lake_dir, version)
    if not os.path.exists(spath):
        return None
    with open(spath) as f:
        return LakeManifest.from_json(f.read())


def _atomic_write_text(path: str, text: str) -> None:
    # pid-unique tmp (repo invariant): two committers racing on one lake
    # must not interleave writes into one shared .tmp file.
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def commit_manifest(lake_dir: str, manifest: LakeManifest, *,
                    expect_base: Optional[int] = None) -> None:
    """Atomic publish: write tmp, fsync, rename over the live manifest.

    An immutable per-version snapshot copy is retained under
    ``_manifests/v{version}.json`` BEFORE the head replace, enabling
    time-travel reads (``read_lake(as_of_epoch=...)``). A crash between the
    two writes leaves an orphan snapshot with ``version > head.version``;
    readers treat only versions ≤ head as committed, and a re-run of the
    same epoch rewrites the orphan with identical content (deterministic
    merge), so convergence is unaffected.

    ``expect_base`` (engine writers pass ``manifest.version - 1``; 0 means
    "expect an uncommitted lake") is a commit-time CAS: if another writer
    advanced the head since this job allocated its version, raise instead
    of silently clobbering their commit. The loser's already-written data
    files stay unreferenced (vacuum candidates); a retry re-reads the head
    and converges. The real exclusion is :func:`writer_lock` — this is the
    backstop for writers that bypassed it."""
    head_v = None
    if expect_base is not None:
        head = read_manifest(lake_dir)
        head_v = head.version if head else 0
        if head_v != expect_base:
            raise RuntimeError(
                f"concurrent writer detected on {lake_dir}: head moved to "
                f"v{head_v} (expected v{expect_base}) while this job was "
                f"writing v{manifest.version}; its commit was NOT applied — "
                f"retry from the new head")
    os.makedirs(os.path.join(lake_dir, SNAPSHOT_DIR), exist_ok=True)
    text = manifest.to_json()
    _atomic_write_text(snapshot_path(lake_dir, manifest.version), text)
    _atomic_write_text(manifest_path(lake_dir), text)


def expire_snapshots(lake_dir: str, keep_last: int = 2) -> list[int]:
    """Drop time-travel history: delete all but the newest ``keep_last``
    committed snapshot manifests (the head's version is always kept). The
    data files they referenced become vacuum-able afterwards. Returns the
    expired versions. Holds the lake's :func:`writer_lock`: a concurrent
    vacuum enumerates the snapshot set while deciding which data files are
    live, so unlinking snapshots under it would let vacuum read a manifest
    file mid-delete."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    with writer_lock(lake_dir):
        return _expire_snapshots_locked(lake_dir, keep_last)


def _expire_snapshots_locked(lake_dir: str, keep_last: int) -> list[int]:
    head = read_manifest(lake_dir)
    if head is None:
        return []
    committed = [v for v in list_snapshots(lake_dir) if v <= head.version]
    expired = []
    for v in committed[:-keep_last] if len(committed) > keep_last else []:
        if v == head.version:
            continue
        os.unlink(snapshot_path(lake_dir, v))
        expired.append(v)
    return expired


def vacuum(lake_dir: str, stale_tmp_seconds: float = 600.0) -> list[str]:
    """Delete data files not referenced by the head manifest or any
    retained snapshot manifest (time-travel readers resolve through
    snapshots, so their files stay live until ``expire_snapshots``).

    Safe at any time: readers resolve files only through manifests, and
    vacuum runs under the lake's :func:`writer_lock`, so it can never race a
    writer whose freshly-written final-name files are not yet referenced by
    a committed manifest (they would otherwise look unreferenced and be
    deleted out from under the pending commit). Orphaned ``*.tmp.<pid>``
    files from crashed writers are also removed, but only once older than
    ``stale_tmp_seconds`` so an in-flight writer's tmp is never unlinked
    mid-write. Returns the deleted relative paths.
    """
    import time

    with writer_lock(lake_dir):
        return _vacuum_locked(lake_dir, stale_tmp_seconds, time)


def _vacuum_locked(lake_dir: str, stale_tmp_seconds: float,
                   time) -> list[str]:
    manifests = [read_manifest(lake_dir)]
    manifests += [read_manifest(lake_dir, version=v)
                  for v in list_snapshots(lake_dir)]
    live = set()
    for manifest in manifests:
        if manifest:
            for pid in manifest.partitions:
                live.update(manifest.partition_files(pid))
    deleted = []
    now = time.time()
    for root, _, files in os.walk(lake_dir):
        for f in files:
            full = os.path.join(root, f)
            rel = os.path.relpath(full, lake_dir)
            if rel == MANIFEST_NAME:
                continue
            if ".tmp." in f:
                try:
                    if now - os.path.getmtime(full) > stale_tmp_seconds:
                        os.unlink(full)
                        deleted.append(rel)
                except FileNotFoundError:
                    pass  # a concurrent vacuum or writer already moved it
                continue
            if not f.endswith(".parquet"):
                continue
            if rel not in live:
                os.unlink(full)
                deleted.append(rel)
    return deleted


def atomic_write_parquet(table, final_path: str) -> int:
    """Write a parquet file atomically (tmp + rename); returns byte size."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    # pid-unique tmp (repo invariant): a retried merge task can overlap its
    # original attempt in another worker process; both rewriting identical
    # bytes is safe ONLY if they never share one .tmp inode.
    tmp = f"{final_path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final_path)
    return os.path.getsize(final_path)
