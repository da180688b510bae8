"""Recursive schema-walk flattener: nested Arrow records → relational columns.

The engine's core stateless transform (BASELINE.json ``north_star``): change
events carry hierarchical payloads (nested ``struct`` columns); this module
walks the schema recursively and emits one flat column per leaf field, named
by the dotted path (``page.content.text`` → ``page.content.text`` or a
configurable separator). It generalizes the reference's static output-schema
derivation (HierarchyConfig.java:239-253) from append-only column lists to
recursive struct traversal.

Zero-copy: ``StructArray.flatten()`` returns child array views — no data is
copied, so this is safe to run as ``map_batches(..., batch_format="pyarrow")``
over object-store blocks at any scale. ``list``/``map``/``binary`` leaves are
kept opaque (exploding lists is a separate, cardinality-changing operator).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data


def derive_flat_schema(schema: pa.Schema, separator: str = ".",
                       prefix_top_level: bool = True) -> pa.Schema:
    """Static derivation of the flattened schema (no data needed)."""
    fields: list[pa.Field] = []
    for f in schema:
        fields.extend(_walk_field(f, f.name if prefix_top_level else "", separator))
    names = [f.name for f in fields]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"Flattened column name collision: {sorted(dupes)}")
    return pa.schema(fields)


def leaf_renamed(names: list, separator: str = ".") -> list:
    """Leaf-rename with collision check — THE one implementation shared by
    the runtime flattener and the Pipeline step's static schema derivation
    (two copies would silently diverge the schema contract from the data)."""
    out = [c.split(separator)[-1] for c in names]
    dupes = {n for n in out if out.count(n) > 1}
    if dupes:
        raise ValueError(f"leaf rename collision: {sorted(dupes)}")
    return out


def _walk_field(f: pa.Field, path: str, sep: str) -> list[pa.Field]:
    if pa.types.is_struct(f.type):
        out: list[pa.Field] = []
        for child in f.type:
            child_path = f"{path}{sep}{child.name}" if path else child.name
            out.extend(_walk_field(child, child_path, sep))
        return out
    name = path if path else f.name
    return [pa.field(name, f.type, nullable=True)]


def flatten_record_table(table: pa.Table, separator: str = ".",
                         prefix_top_level: bool = True) -> pa.Table:
    """Flatten all struct columns of one Arrow table (zero-copy)."""
    out_schema = derive_flat_schema(table.schema, separator, prefix_top_level)
    cols: dict[str, pa.ChunkedArray] = {}
    for f in table.schema:
        col = table[f.name]
        _walk_column(col, f, f.name if prefix_top_level else "", separator, cols)
    arrays = [cols[name] for name in out_schema.names]
    return pa.table(arrays, schema=out_schema)


def _walk_column(col: pa.ChunkedArray, f: pa.Field, path: str, sep: str,
                 out: dict) -> None:
    if pa.types.is_struct(f.type):
        combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if isinstance(combined, pa.ChunkedArray):
            # zero-length chunked arrays don't combine to a single array
            combined = pa.concat_arrays(
                [c for c in combined.chunks]) if combined.num_chunks else pa.array(
                [], f.type)
        children = combined.flatten()
        for child_field, child_arr in zip(f.type, children):
            child_path = f"{path}{sep}{child_field.name}" if path else child_field.name
            _walk_column(child_arr, child_field, child_path, sep, out)
    else:
        out[path if path else f.name] = col


def explode_list_table(table: pa.Table, col: str,
                       element_col: Optional[str] = None,
                       index_col: Optional[str] = None) -> pa.Table:
    """Explode a top-level list column: one output row per element.

    The cardinality-changing counterpart of the struct walk (SURVEY.md §1.2:
    "lists exploded only at top level if needed"). Fully vectorized: parent
    rows are gathered with ``np.repeat`` over the list lengths; element
    values come from the flattened child array (zero-copy view).
    """
    import numpy as np
    import pyarrow.compute as pc

    element_col = element_col or col
    arr = table[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
    lengths = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    parent_idx = np.repeat(np.arange(len(lengths)), lengths)
    values = pc.list_flatten(arr)
    others = table.drop_columns([col]).take(pa.array(parent_idx))
    out = others.append_column(element_col, values)
    if index_col:
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        idx = np.arange(len(parent_idx), dtype=np.int64) - starts
        out = out.append_column(index_col, pa.array(idx))
    return out


def explode_list(ds: ray.data.Dataset, col: str,
                 element_col: Optional[str] = None,
                 index_col: Optional[str] = None) -> ray.data.Dataset:
    """Dataset-level top-level list explode (stateless map_batches)."""
    return ds.map_batches(
        lambda t: explode_list_table(t, col, element_col, index_col),
        batch_format="pyarrow")


class RecordFlattener:
    """map_batches-ready callable (stateless; also usable in an actor pool).

    ``rename_strategy="leaf"`` renames every flattened column to its last
    dotted component (``page.content.text`` → ``text``); collisions raise.
    An explicit ``rename`` mapping overrides individual columns.
    """

    def __init__(self, separator: str = ".", prefix_top_level: bool = True,
                 rename: Optional[dict[str, str]] = None,
                 rename_strategy: Optional[str] = None):
        self.separator = separator
        self.prefix_top_level = prefix_top_level
        self.rename = rename or {}
        self.rename_strategy = rename_strategy

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = flatten_record_table(batch, self.separator, self.prefix_top_level)
        names = flat.column_names
        if self.rename_strategy == "leaf":
            names = leaf_renamed(names, self.separator)
        if self.rename:
            names = [self.rename.get(c, c) for c in names]
        if names != flat.column_names:
            flat = flat.rename_columns(names)
        return flat


def flatten_records(ds: ray.data.Dataset, separator: str = ".",
                    prefix_top_level: bool = True,
                    rename: Optional[dict[str, str]] = None,
                    rename_strategy: Optional[str] = None) -> ray.data.Dataset:
    """Dataset-level schema-walk flatten as a stateless map_batches stage."""
    return ds.map_batches(
        RecordFlattener(separator, prefix_top_level, rename, rename_strategy),
        batch_format="pyarrow",
    )
