"""PipelineStep protocol / composition tests (user-extension surface)."""

import pyarrow as pa
import pytest
import ray.data

from raycdc.pipeline import (
    FlattenStep,
    MapBatchesStep,
    Pipeline,
    RecordFlattenStep,
)
from raycdc.schema import FlattenConfig


def edges():
    return pa.table({"parent": ["1", "1", "2"], "child": ["2", "3", "4"]})


def test_pipeline_configure_and_run():
    cfg = FlattenConfig("parent", "child")
    steps = [FlattenStep(cfg)]
    p = Pipeline(steps)
    out_schema = p.configure(edges().schema)
    assert out_schema.names == ["parent", "child", "Level", "Bottom"]
    out = p.run(ray.data.from_arrow(edges()))
    assert sorted(out.to_pandas()["Level"].tolist()) == [1, 1, 1, 2]


def test_pipeline_validation_collects_failures():
    cfg = FlattenConfig("nope", "child")
    with pytest.raises(ValueError, match="Pipeline validation failed"):
        Pipeline([FlattenStep(cfg)]).configure(edges().schema)


def test_map_batches_step_schema_probe():
    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array([1] * t.num_rows, pa.int64()))

    step = MapBatchesStep("add_one", add_one)
    out = step.schema_out(edges().schema)
    assert out.names == ["parent", "child", "one"]


def test_pipeline_lineage():
    cfg = FlattenConfig("parent", "child")
    p = Pipeline([FlattenStep(cfg)])
    lin = p.lineage(edges().schema)
    assert lin[0]["step"] == "flatten_hierarchy"
    assert "Level" in lin[0]["outputs"]


def test_record_flatten_step():
    t = pa.table({"s": pa.array([{"a": 1}], pa.struct([("a", pa.int64())]))})
    p = Pipeline([RecordFlattenStep(rename_strategy="leaf")])
    assert p.configure(t.schema).names == ["a"]
    out = p.run(ray.data.from_arrow(t)).to_pandas()
    assert out["a"].tolist() == [1]


def test_csv_flatten_parquet_end_to_end(tmp_path):
    # The reference's example pipeline shape: CSV File source (declared
    # schema) → flattener → File sink
    # (example/hirerachy_to_relational_pipeline_macro-cdap-data-pipeline.json).
    from raycdc.sources import read_csv, write_parquet
    import pyarrow.parquet as pq

    path = tmp_path / "edges.csv"
    path.write_text(
        "parent,child,product\n"
        "1,2,Produce\n1,3,Dairy\n2,4,Vegetables\n")
    schema = pa.schema([("parent", pa.int64()), ("child", pa.int64()),
                        ("product", pa.string())])
    ds = read_csv(str(path), schema=schema)
    cfg = FlattenConfig("parent", "child", path_field="product",
                        path_alias_field="path")
    out_dir = str(tmp_path / "out")
    write_parquet(Pipeline([FlattenStep(cfg)]).run(ds), out_dir)
    got = pq.read_table(out_dir).to_pandas()
    assert len(got) == 4  # 3 level-1 + 1 level-2 rows
    assert set(got.columns) == {"parent", "child", "product", "Level",
                                "Bottom", "path"}
    assert "/Produce/Vegetables" in set(got["path"])


def test_csv_source_roundtrip(tmp_path):
    from raycdc.sources import read_csv

    path = tmp_path / "edges.csv"
    path.write_text("parent,child\n1,2\n1,3\n")
    schema = pa.schema([("parent", pa.int64()), ("child", pa.int64())])
    ds = read_csv(str(path), schema=schema)
    assert ds.count() == 2
    assert dict(zip(ds.schema().names, ds.schema().types))["parent"] == pa.int64()
