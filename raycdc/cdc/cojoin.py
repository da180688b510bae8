"""Co-partitioned lake join: ZERO-exchange joins between committed lakes.

Every lake partitions rows by the same engine-wide url hash
(`cdc/apply._url_pid`), so two lakes with equal partition counts are
storage-co-partitioned: url X can only live in partition i of BOTH lakes.
A join on url therefore never needs a shuffle — partition i of A joins
partition i of B in one task, reading both partitions' manifest-resolved
run sets directly. This is the "pick ONE partitioning key and reuse it
across stages" scale rule as an operator: at 10^10 rows the all-to-all
exchange a generic hash join would pay simply disappears, and the join
parallelism is the partition count.

Both sides resolve like `read_lake` (head, `as_of_version`, or
`as_of_epoch`) — joining a lake against its OWN earlier snapshot
(what changed / what didn't) is the expected first use.

Non-key output columns are ALWAYS suffixed (default ``_a``/``_b``) so the
output schema is predictable regardless of the two lakes' overlap.
"""
from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from raycdc.cdc.apply import _resolve_manifest
from raycdc.cdc.lww import DELETED_COL
from raycdc.cdc.evolve import unify


def _live_partition_table(lake_dir: str, files: list[str],
                          target: pa.Schema) -> pa.Table:
    """One partition's live rows: apply.read_partition_table (THE shared
    read-project-LWW-align path — plain function, so both sides read inside
    one join task without nested remote calls) with tombstones dropped.
    ``target`` is pre-pruned to the join's projection plus the
    LWW/tombstone internals."""
    from raycdc.cdc.apply import read_partition_table

    merged = read_partition_table(lake_dir, files, target)
    live = merged.filter(
        pc.invert(pc.fill_null(merged[DELETED_COL], False)))
    return live.drop_columns([DELETED_COL])


def _suffixed(t: pa.Table, key: str, cols: list[str],
              suffix: str) -> pa.Table:
    return pa.table({key: t[key],
                     **{f"{c}{suffix}": t[c] for c in cols}})


@ray.remote
def _join_partition(lake_a: str, files_a: list[str], target_a: pa.Schema,
                    lake_b: str, files_b: list[str], target_b: pa.Schema,
                    cols_a: list[str], cols_b: list[str],
                    suffixes: tuple[str, str], verb: str) -> pa.Table:
    ta = _suffixed(_live_partition_table(lake_a, files_a, target_a),
                   "url", cols_a, suffixes[0])
    tb = _suffixed(_live_partition_table(lake_b, files_b, target_b),
                   "url", cols_b, suffixes[1])
    return ta.join(tb, keys=["url"], right_keys=["url"], join_type=verb,
                   coalesce_keys=True)


def _lake_targets(lake_dir: str, manifest) -> pa.Schema:
    files = [os.path.join(lake_dir, f) for pid in manifest.partitions
             for f in manifest.partition_files(pid)]
    if not files:
        raise FileNotFoundError(f"lake {lake_dir} has no committed files")
    return unify([pq.read_schema(f) for f in files])


def copartitioned_lake_join(
    lake_a: str,
    lake_b: Optional[str] = None,
    *,
    join_type: str = "inner",
    columns_a: Optional[list[str]] = None,
    columns_b: Optional[list[str]] = None,
    suffixes: tuple[str, str] = ("_a", "_b"),
    as_of_version_a: Optional[int] = None,
    as_of_epoch_a: Optional[int] = None,
    as_of_version_b: Optional[int] = None,
    as_of_epoch_b: Optional[int] = None,
) -> ray.data.Dataset:
    """Join the live states of two lakes on ``url`` with NO exchange.

    ``lake_b=None`` joins ``lake_a`` against itself (pass different
    ``as_of_*`` endpoints — e.g. head vs an earlier snapshot). Output:
    ``url`` plus every selected non-key column suffixed per side. Both
    lakes must share the partition count (the engine's url-hash routing is
    global, so equal counts ⇒ co-partitioned); mismatched counts raise —
    re-route through `raycdc.joins.hash_join` in that case.
    """
    from raycdc.joins import _ARROW_VERBS, pin_schema

    verb = _ARROW_VERBS[join_type]
    if join_type in ("left_semi", "left_anti"):
        raise ValueError("semi/anti joins drop the b side; use "
                         "joins.hash_join / bloom_anti_join instead")
    lake_b = lake_b or lake_a
    m_a = _resolve_manifest(lake_a, as_of_version_a, as_of_epoch_a)
    m_b = _resolve_manifest(lake_b, as_of_version_b, as_of_epoch_b)
    if m_a.num_partitions != m_b.num_partitions:
        raise ValueError(
            f"lakes are not co-partitioned ({m_a.num_partitions} vs "
            f"{m_b.num_partitions} partitions); use joins.hash_join")
    target_a = _lake_targets(lake_a, m_a)
    target_b = _lake_targets(lake_b, m_b)
    def _default_cols(target: pa.Schema) -> list[str]:
        # Acero (pa.Table.join) rejects nested non-key fields (the repo's
        # documented invariant), and merge_into admits arbitrary payloads —
        # e.g. fixed_size_list embeddings — so defaults skip nested types
        # rather than crash every partition task.
        return [f.name for f in target
                if f.name not in ("url", DELETED_COL)
                and not pa.types.is_nested(f.type)]

    def _reject_nested(target: pa.Schema, cols: list[str], side: str):
        nested = [c for c in cols if c in target.names
                  and pa.types.is_nested(target.field(c).type)]
        if nested:
            raise ValueError(
                f"columns_{side}={nested} are nested-typed; Acero joins "
                f"reject nested non-key fields — cast them to binary blobs "
                f"upstream (see raycdc/joins) or drop them")

    cols_a = columns_a if columns_a is not None else _default_cols(target_a)
    cols_b = columns_b if columns_b is not None else _default_cols(target_b)
    _reject_nested(target_a, cols_a, "a")
    _reject_nested(target_b, cols_b, "b")

    def _prune(target: pa.Schema, cols: list[str]) -> pa.Schema:
        unknown = [c for c in cols if c not in target.names]
        if unknown:
            raise KeyError(f"columns not in lake schema: {unknown} "
                           f"(have {target.names})")
        # the join's projection, plus what the per-partition read needs
        # internally: the key, the LWW order columns (multi-file run sets
        # re-reduce), and the tombstone flag
        keep = set(cols) | {"url", "warc_ts", "seq", DELETED_COL}
        return pa.schema([f for f in target if f.name in keep])

    target_a, target_b = _prune(target_a, cols_a), _prune(target_b, cols_b)

    refs = []
    for pid in range(m_a.num_partitions):
        fa, fb = m_a.partition_files(pid), m_b.partition_files(pid)
        if not fa and not fb:
            continue
        if join_type == "inner" and (not fa or not fb):
            continue  # an absent side cannot produce inner matches
        refs.append(_join_partition.remote(
            lake_a, fa, target_a, lake_b, fb, target_b,
            cols_a, cols_b, suffixes, verb))

    out_schema = pa.schema(
        [pa.field("url", target_a.field("url").type)]
        + [pa.field(f"{c}{suffixes[0]}", target_a.field(c).type)
           for c in cols_a]
        + [pa.field(f"{c}{suffixes[1]}", target_b.field(c).type)
           for c in cols_b])
    ds = ray.data.from_arrow_refs(refs) if refs \
        else ray.data.from_arrow(out_schema.empty_table())
    # column order out of Acero's full/right outer can differ per task only
    # in theory; select to the declared schema for a stable contract, and
    # pin it (a churn-free inner self-join can be legitimately empty)
    return pin_schema(
        ds.map_batches(lambda t: t.select(out_schema.names),
                       batch_format="pyarrow"),
        out_schema)
