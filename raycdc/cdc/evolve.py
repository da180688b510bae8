"""Arrow schema evolution: column add / type widen at merge time.

The north star requires merging deltas whose flattened schema gained columns
or widened numeric types against older base partitions without rewriting
history. ``pa.unify_schemas`` computes the union schema (with permissive
numeric promotion); :func:`align_to_schema` pads missing columns with nulls
and casts widened columns.
"""

from __future__ import annotations

import pyarrow as pa


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    return pa.unify_schemas(schemas, promote_options="permissive")


def align_to_schema(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``target``: missing columns become nulls,
    differing types are cast (widening)."""
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.chunked_array([pa.nulls(table.num_rows, f.type)]))
    return pa.table(cols, schema=target)


def concat_evolved(tables: list[pa.Table]) -> pa.Table:
    """Concatenate tables with (possibly) different schemas under the unified
    schema."""
    tables = [t for t in tables if t is not None]
    if not tables:
        raise ValueError("no tables to concat")
    target = unify([t.schema for t in tables])
    return pa.concat_tables([align_to_schema(t, target) for t in tables])
