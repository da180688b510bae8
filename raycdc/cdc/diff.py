"""Snapshot diff: derive a changelog from two table states.

The inverse of the replay path (`cdc/apply.py` folds a changelog INTO a
table; this folds two table snapshots into a changelog): given the
previous crawl and the current crawl keyed by url/doc id, emit one row
per difference — ``I`` (key only in the new snapshot), ``D`` (key only in
the old), ``U`` (key in both with any compared column changed, null-safe).
Unchanged rows are omitted, so the output is sized by the churn, not the
corpus — exactly what an incremental downstream (index refresh, re-embed,
re-train delta) wants to consume.

One keyed full-outer co-partition exchange (the same machinery as every
hash join) plus a stateless vectorized classify per bucket output. The
comparison is exact and null-safe (SQL ``IS DISTINCT FROM``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def table_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key_cols: list[str],
    compare_cols: list[str],
    num_partitions: int = 32,
    include_old: bool = False,
    old_prefix: str = "old_",
) -> ray.data.Dataset:
    """Changelog between two snapshots sharing ``key_cols + compare_cols``.

    Output columns: ``op`` ('I'/'U'/'D'), the key columns, then the
    compared columns carrying the NEW value for I/U and null for D.
    With ``include_old`` each compared column also appears as
    ``old_<c>`` carrying the OLD value for U/D and null for I — the shape
    an incremental view maintainer needs (retract the old contribution,
    add the new one).
    Deterministic; both inputs stream into one co-partition exchange.
    """
    from raycdc.joins import (
        _common_key_type, _pa_schema, hash_join, pin_schema)

    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    oschema, nschema = _pa_schema(old), _pa_schema(new)
    # fail fast on nested compare columns (same contract as cojoin): the
    # tagged tables carry them as non-key join fields, which Acero rejects,
    # and pc.not_equal has no nested kernel — the error would otherwise
    # surface deep inside the exchange
    nested = [c for c in compare_cols
              if (c in nschema.names and
                  pa.types.is_nested(nschema.field(c).type))
              or (c in oschema.names and
                  pa.types.is_nested(oschema.field(c).type))]
    if nested:
        raise ValueError(
            f"compare_cols={nested} are nested-typed; joins and not_equal "
            f"reject nested fields — cast them to binary blobs upstream "
            f"(see raycdc/joins) or exclude them")

    def _key_type(k: str) -> pa.DataType:
        # hash_join widens mismatched key dtypes to a common type (int32 vs
        # int64 → int64); the pinned output schema must declare what the
        # data blocks actually carry, or the typed-empty union diverges
        lt, rt = oschema.field(k).type, nschema.field(k).type
        return rt if lt == rt else _common_key_type(lt, rt)

    def tagged_schema(s: pa.Schema, side: str) -> pa.Schema:
        return pa.schema(
            [pa.field(k, s.field(k).type) for k in key_cols]
            + [pa.field(f"__rcdc_{side}_{c}", s.field(c).type)
               for c in compare_cols]
            + [pa.field(f"__rcdc_{side}", pa.int8())])

    def tag(side: str):
        old_names = {c: f"__rcdc_{side}_{c}" for c in compare_cols}
        empty = tagged_schema(nschema if side == "n" else oschema,
                              side).empty_table()

        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 and key_cols[0] not in t.column_names:
                # repo invariant: Ray can degrade typed EMPTY upstream
                # blocks to zero-column blocks (CLAUDE.md)
                return empty
            cols = {k: t[k] for k in key_cols}
            for c in compare_cols:
                cols[old_names[c]] = t[c]
            cols[f"__rcdc_{side}"] = pa.array(
                np.ones(t.num_rows, dtype=np.int8))
            return pa.table(cols)
        return fn

    # Pin both tagged lineages: an empty snapshot (first crawl, or a
    # filtered slice) yields zero blocks with no schema, which hash_join
    # cannot consume.
    joined = hash_join(
        pin_schema(old.map_batches(tag("o"), batch_format="pyarrow"),
                   tagged_schema(oschema, "o")),
        pin_schema(new.map_batches(tag("n"), batch_format="pyarrow"),
                   tagged_schema(nschema, "n")),
        on=key_cols, join_type="full_outer",
        num_partitions=num_partitions)

    out_schema = pa.schema(
        [pa.field("op", pa.string())]
        + [pa.field(k, _key_type(k)) for k in key_cols]
        + [pa.field(c, nschema.field(c).type) for c in compare_cols]
        + ([pa.field(f"{old_prefix}{c}", oschema.field(c).type)
            for c in compare_cols] if include_old else []))

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "__rcdc_o" not in t.column_names:
            return out_schema.empty_table()  # zero-column empty (see tag)
        in_old = pc.fill_null(pc.is_valid(t["__rcdc_o"]), False) \
            .to_numpy(zero_copy_only=False)
        in_new = pc.is_valid(t["__rcdc_n"]).to_numpy(zero_copy_only=False)
        changed = np.zeros(t.num_rows, dtype=bool)
        for c in compare_cols:
            a, b = t[f"__rcdc_o_{c}"], t[f"__rcdc_n_{c}"]
            av = pc.is_valid(a).to_numpy(zero_copy_only=False)
            bv = pc.is_valid(b).to_numpy(zero_copy_only=False)
            neq = pc.fill_null(pc.not_equal(a, b), False) \
                .to_numpy(zero_copy_only=False)
            # IS DISTINCT FROM: validity differs, or both valid and unequal
            changed |= (av != bv) | (av & bv & neq)
        op = np.where(~in_old, "I", np.where(~in_new, "D", "U"))
        keep = ~in_old | ~in_new | (in_old & in_new & changed)
        cols = {"op": pa.array(op[keep], pa.string())}
        kt = t.filter(pa.array(keep))
        for k in key_cols:
            cols[k] = kt[k]
        for c in compare_cols:
            cols[c] = kt[f"__rcdc_n_{c}"]  # new value; null for D rows
        if include_old:
            for c in compare_cols:
                # old value; null for I rows
                cols[f"{old_prefix}{c}"] = kt[f"__rcdc_o_{c}"]
        return pa.table(cols)

    # Pin the final stage too: identical snapshots classify every row
    # away and the pin above does not survive map_batches over zero rows.
    return pin_schema(joined.map_batches(classify, batch_format="pyarrow"),
                      out_schema)
