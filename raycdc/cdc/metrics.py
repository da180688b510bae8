"""Lake / run metrics: per-partition lineage summaries from the manifest.

The manifest already records per-partition lineage (epochs, file, row and
byte counts, delta sizes — sink.py); this module aggregates it into the
run-level metrics the north star asks for.
"""

from __future__ import annotations

from raycdc.cdc.sink import read_manifest


def lake_stats(lake_dir: str) -> dict:
    m = read_manifest(lake_dir)
    if m is None:
        return {"committed": False}
    rows = sum(p["rows"] for p in m.partitions.values())
    live = sum(p.get("live_rows", p["rows"]) for p in m.partitions.values())
    size = sum(p["bytes"] for p in m.partitions.values())
    return {
        "committed": True,
        "version": m.version,
        "epochs_applied": m.epochs_applied,
        "watermark_seq": m.watermark_seq,
        "num_partitions": m.num_partitions,
        "rows": rows,
        "live_rows": live,
        "tombstones": rows - live,
        "bytes": size,
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
        {"pid": int(pid), "file": p["file"], **p.get("lineage", {})}
        for pid, p in sorted(m.partitions.items(), key=lambda kv: int(kv[0]))
    ]
