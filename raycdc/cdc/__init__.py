"""CDC / incremental-ingest engine (BASELINE.json north star).

Pipeline: tail a simulated binlog/WAL of nested hierarchical change events →
recursive schema-walk flatten (:mod:`raycdc.record_flatten`) → per-batch local
LWW combine → url-hash-partitioned shuffle → per-partition merge into Parquet
lake partitions → atomic manifest commit (exactly-once, resumable).
"""

from raycdc.cdc.changelog import ChangelogSpec, generate_changelog
from raycdc.cdc.apply import (
    apply_changelog,
    compact_lake,
    lake_changes,
    lookup_urls,
    merge_into,
    oracle_final_state,
    read_lake,
    repartition_lake,
)
from raycdc.cdc.sink import (
    LakeManifest,
    expire_snapshots,
    list_snapshots,
    read_manifest,
    vacuum,
)
from raycdc.cdc.views import (
    count_view,
    extreme_view,
    maintain_count_view,
    maintain_extreme_view,
    merge_view,
    view_delta,
)
