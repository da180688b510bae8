"""Schema-walk record flattener tests (north-star core transform)."""

import pyarrow as pa
import pytest

from raycdc.record_flatten import (
    RecordFlattener,
    derive_flat_schema,
    flatten_record_table,
)


def nested_table():
    page = pa.StructArray.from_arrays(
        [
            pa.array(["u1", "u2"]),
            pa.StructArray.from_arrays(
                [pa.array([1, 2], pa.int64()), pa.array([b"a", b"b"], pa.binary())],
                ["ts", "html"],
            ),
        ],
        ["url", "fetch"],
    )
    return pa.table({"seq": pa.array([10, 11], pa.int64()), "page": page})


def test_derive_flat_schema():
    t = nested_table()
    out = derive_flat_schema(t.schema)
    assert out.names == ["seq", "page.url", "page.fetch.ts", "page.fetch.html"]
    assert out.field("page.fetch.ts").type == pa.int64()
    assert out.field("page.fetch.html").type == pa.binary()


def test_flatten_values():
    out = flatten_record_table(nested_table())
    assert out["page.url"].to_pylist() == ["u1", "u2"]
    assert out["page.fetch.ts"].to_pylist() == [1, 2]
    assert out["seq"].to_pylist() == [10, 11]


def test_null_struct_propagates():
    inner = pa.array([{"a": 1, "b": "x"}, None],
                     pa.struct([("a", pa.int64()), ("b", pa.string())]))
    t = pa.table({"s": inner})
    out = flatten_record_table(t)
    assert out["s.a"].to_pylist() == [1, None]
    assert out["s.b"].to_pylist() == ["x", None]


def test_leaf_rename():
    out = RecordFlattener(rename_strategy="leaf")(nested_table())
    assert out.column_names == ["seq", "url", "ts", "html"]


def test_leaf_rename_collision_raises():
    t = pa.table({
        "a": pa.array([{"x": 1}], pa.struct([("x", pa.int64())])),
        "b": pa.array([{"x": 2}], pa.struct([("x", pa.int64())])),
    })
    with pytest.raises(ValueError, match="collision"):
        RecordFlattener(rename_strategy="leaf")(t)


def test_list_columns_stay_opaque():
    t = pa.table({"v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))})
    out = flatten_record_table(t)
    assert out.schema.field("v").type == pa.list_(pa.float32())
