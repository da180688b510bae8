"""Source / sink helpers.

The reference is a mid-pipeline transform with host-provided sources/sinks
(CSV File source and BigQuery in its examples — SURVEY.md §2 sources/sinks).
The engine's equivalents are thin wrappers over Ray Data readers that
enforce the scale rules: prune columns at the read, push row filters into
parquet row groups, and write partitioned output.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data


def read_parquet(paths, *, columns: Optional[list[str]] = None, filter=None,
                 schema: Optional[pa.Schema] = None, **kwargs) -> ray.data.Dataset:
    """Parquet read with column pruning + row-group predicate pushdown."""
    return ray.data.read_parquet(paths, columns=columns, filter=filter,
                                 schema=schema, **kwargs)


def read_csv(paths, *, schema: Optional[pa.Schema] = None,
             delimiter: str = ",", skip_header_only: bool = False,
             has_header: bool = True, **kwargs) -> ray.data.Dataset:
    """CSV read with an explicit declared schema (the reference's File-source
    pattern: declared Avro schema + delimiter + skipHeader —
    example/hirerachy_to_relational_pipeline_macro-cdap-data-pipeline.json).

    ``has_header=False`` reads a HEADERLESS file: the declared schema names
    the columns (required — without it the first data row would silently
    become the header and one record would be lost). ``skip_header_only``
    keeps the file's header row out of the data while taking names/types
    from the schema."""
    from pyarrow import csv as pacsv

    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    convert_options = None
    if schema is not None:
        convert_options = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema})
    read_options = None
    if not has_header:
        if schema is None:
            raise ValueError("has_header=False requires a declared schema "
                             "to name the columns")
        read_options = pacsv.ReadOptions(column_names=schema.names)
    elif skip_header_only:
        if schema is None:
            raise ValueError("skip_header_only=True requires a declared "
                             "schema to supply the column names that "
                             "replace the skipped header")
        read_options = pacsv.ReadOptions(column_names=schema.names,
                                         skip_rows=1)
    return ray.data.read_csv(paths, parse_options=parse_options,
                             convert_options=convert_options,
                             read_options=read_options, **kwargs)


def read_json(paths, **kwargs) -> ray.data.Dataset:
    return ray.data.read_json(paths, **kwargs)


def write_parquet(ds: ray.data.Dataset, path: str, *,
                  min_rows_per_file: Optional[int] = None, **kwargs) -> None:
    """Partitioned parquet sink (a directory of part files — resumable
    layout; for the exactly-once manifest sink see raycdc.cdc.sink)."""
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(path, **kwargs)
