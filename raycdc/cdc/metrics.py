"""Lake / run metrics: per-partition lineage summaries from the manifest.

The manifest already records per-partition lineage (epochs, file, row and
byte counts, delta sizes — sink.py); this module aggregates it into the
run-level metrics the north star asks for.
"""

from __future__ import annotations

from raycdc.cdc.sink import list_snapshots, read_manifest


def lake_stats(lake_dir: str) -> dict:
    m = read_manifest(lake_dir)
    if m is None:
        return {"committed": False}
    rows = sum(p["rows"] for p in m.partitions.values())
    live_known = [p.get("live_rows") for p in m.partitions.values()]
    live = sum(v for v in live_known if v is not None)
    size = sum(p["bytes"] for p in m.partitions.values())
    n_files = sum(len(m.partition_files(pid)) for pid in m.partitions)
    return {
        "committed": True,
        "version": m.version,
        "epochs_applied": m.epochs_applied,
        "watermark_seq": m.watermark_seq,
        "num_partitions": m.num_partitions,
        "files": n_files,
        "rows": rows,
        # live/tombstone counts are exact only for fully-compacted
        # partitions; delta runs report live_rows=None until compaction
        "live_rows": live if all(v is not None for v in live_known) else None,
        "tombstones": (rows - live)
        if all(v is not None for v in live_known) else None,
        "bytes": size,
        # retained time-travel history (committed snapshot manifests)
        "snapshots": [v for v in list_snapshots(lake_dir)
                      if v <= m.version],
        "skew": _skew(m),
    }


def _skew(m) -> dict:
    """Partition-size skew indicators (hot-key visibility)."""
    sizes = sorted(p["rows"] for p in m.partitions.values())
    if not sizes:
        return {}
    n = len(sizes)
    return {
        "min_rows": sizes[0],
        "p50_rows": sizes[n // 2],
        "max_rows": sizes[-1],
        "max_over_mean": round(sizes[-1] / (sum(sizes) / n), 3) if sum(sizes) else 0,
    }


def partition_lineage(lake_dir: str) -> list[dict]:
    m = read_manifest(lake_dir)
    if m is None:
        return []
    return [
        {"pid": int(pid), "files": m.partition_files(pid),
         **p.get("lineage", {})}
        for pid, p in sorted(m.partitions.items(), key=lambda kv: int(kv[0]))
    ]
