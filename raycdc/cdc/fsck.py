"""Lake consistency checker (`python -m raycdc fsck`).

Validates the invariants every other component relies on, without trusting
any of their code paths:

shallow (metadata-only, O(files) footer reads — safe on a huge lake):
  - the head manifest parses and every referenced data file exists
  - manifest per-partition ``rows``/``bytes`` match the parquet footers
  - every referenced file lives under its own partition's directory
  - retained snapshot manifests at or below the head parse and their files
    exist (time travel is intact); snapshots ABOVE the head are flagged as
    crash orphans (readers clamp — sink.py contract)
  - unreferenced data files are counted as vacuum candidates (warning)

deep (adds one Ray task per partition — reads data):
  - every row's url actually hashes to the partition that holds it (the
    routing invariant all exchanges, lookups, and co-partitioned joins
    assume)
  - urls are unique and non-null within EACH file (every lake file is
    written post-``lww_reduce``, so an in-file duplicate means a broken
    writer; across files of an LSM run set duplicates are legitimate —
    newer deltas supersede the base at read time)
  - each file is url-sorted (the point-lookup row-group-pruning contract)

Returns a report dict; ``ok`` is True iff there are no errors (warnings —
vacuum candidates, orphan snapshots — do not fail the check).
"""
from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from raycdc.cdc.sink import list_snapshots, read_manifest


@ray.remote
def _deep_check_partition(lake_dir: str, pid: int, files: list[str],
                          num_partitions: int) -> list[str]:
    from raycdc.cdc.apply import _url_pid

    errors = []
    for f in files:
        t = pq.read_table(os.path.join(lake_dir, f), columns=["url"])
        urls = t["url"]
        if t.num_rows > 1:
            arr = urls.combine_chunks()
            if not pc.all(pc.less_equal(arr.slice(0, len(arr) - 1),
                                        arr.slice(1))).as_py():
                errors.append(f"{f}: urls not sorted")
        pids = _url_pid(urls, num_partitions)
        wrong = int((pids != pid).sum())
        if wrong:
            errors.append(f"{f}: {wrong} rows hash to another partition")
        # per-FILE uniqueness is the writer contract (every file is written
        # post-lww_reduce); the former whole-run-set check re-reduced the
        # concatenated files first, so it could never fire on a multi-file
        # run (lww_reduce emits one row per key by construction) AND paid
        # extra column reads for it. Across files, duplicates are the
        # normal LSM shape.
        nulls = urls.null_count
        if nulls:
            errors.append(f"{f}: {nulls} null urls")
        dup = t.num_rows - nulls - pc.count_distinct(
            urls, mode="only_valid").as_py()
        if dup:
            errors.append(f"{f}: {dup} duplicate urls within one file")
    return errors


def check_lake(lake_dir: str, *, deep: bool = False) -> dict:
    errors: list[str] = []
    warnings: list[str] = []
    head = read_manifest(lake_dir)
    if head is None:
        return {"ok": False, "errors": [f"no committed manifest in "
                                        f"{lake_dir}"], "warnings": []}

    files_checked = 0
    referenced: set[str] = set()
    for pid in head.partitions:
        info = head.partitions[pid]
        expected_rows = info.get("rows")
        got_rows = 0
        got_bytes = 0
        for rel in head.partition_files(pid):
            referenced.add(rel)
            if not rel.startswith(f"part-{int(pid):05d}/"):
                errors.append(f"{rel}: filed under partition {pid} but "
                              f"named for another")
            path = os.path.join(lake_dir, rel)
            if not os.path.exists(path):
                errors.append(f"{rel}: referenced by head v{head.version} "
                              f"but missing on disk")
                continue
            md = pq.read_metadata(path)
            got_rows += md.num_rows
            got_bytes += os.path.getsize(path)
            files_checked += 1
        # rows/bytes equality only holds for single-file partitions: a
        # streaming L0 run set's manifest records the NEWEST flush's counts
        # while `files` lists the whole run (actors.py) — the deep check
        # still validates multi-file partitions via routing/uniqueness.
        if len(head.partition_files(pid)) == 1:
            if expected_rows is not None and got_rows != expected_rows:
                errors.append(f"partition {pid}: manifest says "
                              f"{expected_rows} rows, footers say {got_rows}")
            if info.get("bytes") is not None and got_bytes != info["bytes"]:
                errors.append(f"partition {pid}: manifest says "
                              f"{info['bytes']} bytes, disk says {got_bytes}")

    snapshots = list_snapshots(lake_dir)
    orphans = [v for v in snapshots if v > head.version]
    if orphans:
        warnings.append(f"orphan snapshots above head v{head.version}: "
                        f"{orphans} (crash between snapshot write and head "
                        f"replace; readers clamp)")
    snapshot_refs: set[str] = set(referenced)
    for v in snapshots:
        if v > head.version:
            continue
        m = read_manifest(lake_dir, version=v)
        if m is None:
            errors.append(f"snapshot v{v} listed but unreadable")
            continue
        for pid in m.partitions:
            for rel in m.partition_files(pid):
                snapshot_refs.add(rel)
                if not os.path.exists(os.path.join(lake_dir, rel)):
                    errors.append(f"{rel}: referenced by snapshot v{v} but "
                                  f"missing on disk (history broken — was "
                                  f"vacuum run without expire_snapshots?)")

    on_disk = set()
    for root, _dirs, names in os.walk(lake_dir):
        for name in names:
            rel = os.path.relpath(os.path.join(root, name), lake_dir)
            if rel.endswith(".parquet") and rel.startswith("part-"):
                on_disk.add(rel)
    unreferenced = sorted(on_disk - snapshot_refs)
    if unreferenced:
        warnings.append(f"{len(unreferenced)} unreferenced data files "
                        f"(vacuum candidates)")

    deep_errors: list[str] = []
    if deep and not errors:
        refs = [_deep_check_partition.remote(
            lake_dir, int(pid), head.partition_files(pid),
            head.num_partitions)
            for pid in head.partitions if head.partition_files(pid)]
        for errs in ray.get(refs):
            deep_errors.extend(errs)
        errors.extend(deep_errors)

    return {
        "ok": not errors,
        "version": head.version,
        "num_partitions": head.num_partitions,
        "files_checked": files_checked,
        "snapshots": len(snapshots),
        "unreferenced_files": len(unreferenced),
        "deep": deep,
        "errors": errors,
        "warnings": warnings,
    }
