"""Pipeline-step protocol: the engine's user-extension surface.

The reference's extension surface is the CDAP plugin SPI —
``configurePipeline`` (static schema propagation + validation) /
``prepareRun`` (lineage) / ``transform`` (HierarchyToRelational.java:55-104).
The engine's equivalent is a small protocol over Ray Datasets:

- ``schema_out(schema_in)`` — static output-schema derivation, run at build
  time before any Ray work (parity with configurePipeline's schema
  propagation, HierarchyToRelational.java:56-61)
- ``validate(schema_in) -> list[str]`` — collected failures (parity with the
  FailureCollector pattern, HierarchyConfig.java:127-173)
- ``apply(ds) -> ds`` — the runtime transform

``Pipeline`` composes steps, validates the whole chain against the source
schema up front (one error report, nothing executed), and records a
field-level lineage entry per step (parity with recordLineage,
HierarchyToRelational.java:80-98).
"""

from __future__ import annotations

from typing import Callable, Optional, Protocol, runtime_checkable

import pyarrow as pa
import ray.data

from raycdc.schema import FlattenConfig, derive_output_schema, validate_config


@runtime_checkable
class PipelineStep(Protocol):
    name: str

    def schema_out(self, schema_in: pa.Schema) -> pa.Schema: ...

    def validate(self, schema_in: pa.Schema) -> list[str]: ...

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset: ...


class FlattenStep:
    """The hierarchy flattener as a composable step."""

    def __init__(self, cfg: FlattenConfig, **kwargs):
        self.name = "flatten_hierarchy"
        self.cfg = cfg
        self.kwargs = kwargs

    def schema_out(self, schema_in: pa.Schema) -> pa.Schema:
        return derive_output_schema(schema_in, self.cfg)

    def validate(self, schema_in: pa.Schema) -> list[str]:
        return validate_config(self.cfg, schema_in)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        from raycdc.flatten import flatten_hierarchy

        return flatten_hierarchy(ds, self.cfg, **self.kwargs)


class MapBatchesStep:
    """Wrap any batch function (+ its static schema effect) as a step."""

    def __init__(self, name: str, fn: Callable[[pa.Table], pa.Table],
                 schema_fn: Optional[Callable[[pa.Schema], pa.Schema]] = None,
                 **map_kwargs):
        self.name = name
        self.fn = fn
        self.schema_fn = schema_fn
        self.map_kwargs = map_kwargs

    def schema_out(self, schema_in: pa.Schema) -> pa.Schema:
        if self.schema_fn is not None:
            return self.schema_fn(schema_in)
        # Derive by probing the fn with an empty batch (pure schema effect).
        return self.fn(schema_in.empty_table()).schema

    def validate(self, schema_in: pa.Schema) -> list[str]:
        try:
            self.schema_out(schema_in)
            return []
        except Exception as exc:  # surfaced, not raised — collected pattern
            return [f"{self.name}: {exc}"]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", **self.map_kwargs)


class RecordFlattenStep:
    def __init__(self, separator: str = ".", rename_strategy: str | None = None):
        self.name = "flatten_record"
        self.separator = separator
        self.rename_strategy = rename_strategy

    def schema_out(self, schema_in: pa.Schema) -> pa.Schema:
        from raycdc.record_flatten import derive_flat_schema, leaf_renamed

        out = derive_flat_schema(schema_in, self.separator)
        if self.rename_strategy == "leaf":
            # the runtime flattener's own rename helper — static schema and
            # produced table can never diverge
            names = leaf_renamed(out.names, self.separator)
            out = pa.schema([pa.field(n, f.type) for n, f in zip(names, out)])
        return out

    def validate(self, schema_in: pa.Schema) -> list[str]:
        try:
            self.schema_out(schema_in)
            return []
        except Exception as exc:
            return [f"{self.name}: {exc}"]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        from raycdc.record_flatten import flatten_records

        return flatten_records(ds, self.separator,
                               rename_strategy=self.rename_strategy)


class Pipeline:
    """Validate-then-run composition of steps with per-step lineage."""

    def __init__(self, steps: list[PipelineStep]):
        self.steps = list(steps)

    def configure(self, source_schema: pa.Schema) -> pa.Schema:
        """Static pass: validate every step and propagate schemas; raises one
        combined error if anything is invalid (nothing executes)."""
        failures: list[str] = []
        schema = source_schema
        for step in self.steps:
            step_failures = step.validate(schema)
            if step_failures:
                failures.extend(f"[{step.name}] {f}" for f in step_failures)
                break
            schema = step.schema_out(schema)
        if failures:
            raise ValueError("Pipeline validation failed: " + "; ".join(failures))
        return schema

    def lineage(self, source_schema: pa.Schema) -> list[dict]:
        """Field-level lineage records: inputs → outputs per step."""
        out = []
        schema = source_schema
        for step in self.steps:
            nxt = step.schema_out(schema)
            out.append({"step": step.name,
                        "inputs": list(schema.names),
                        "outputs": list(nxt.names)})
            schema = nxt
        return out

    def run(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        s = ds.schema()
        if s is None:
            # zero-block input (the documented Ray schema degrade): the
            # pipeline cannot derive or validate step schemas from nothing
            raise ValueError(
                "input dataset has no schema (zero blocks — e.g. an "
                "upstream filter dropped every row); pin it with a typed "
                "empty (raycdc.joins.pin_schema) before Pipeline.run")
        def _pa_type(t):
            # pandas-block datasets (from_pandas) report numpy dtypes here;
            # convert them so run() validates instead of raising an opaque
            # TypeError deep inside pa.field
            if isinstance(t, pa.DataType):
                return t
            if t is object or getattr(t, "kind", None) == "O":
                # pandas object blocks are strings in practice; a wrong
                # guess fails the step validation with a real message
                return pa.string()
            try:
                return pa.from_numpy_dtype(t)
            except (TypeError, pa.ArrowNotImplementedError):
                raise ValueError(
                    f"cannot derive an Arrow type from block type {t!r}; "
                    "route the input through map_batches(..., "
                    "batch_format='pyarrow') first") from None

        self.configure(pa.schema(
            [pa.field(n, _pa_type(t)) for n, t in zip(s.names, s.types)]))
        for step in self.steps:
            ds = step.apply(ds)
        return ds
