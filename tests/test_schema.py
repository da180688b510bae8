"""Config validation + output-schema derivation tests.

Ports the reference's HierarchyConfigTest
(/root/reference src/test/java/io/cdap/plugin/spark/HierarchyConfigTest.java:40-116).
"""

import pyarrow as pa
import pytest

from raycdc.schema import (
    FlattenConfig,
    derive_output_schema,
    parse_connect_by_root,
    validate_config,
)

SCHEMA = pa.schema([
    pa.field("ParentId", pa.int32()),
    pa.field("ChildId", pa.int32()),
    pa.field("ParentProduct", pa.string()),
    pa.field("Supplier", pa.string()),
])


def test_path_without_alias_fails():
    cfg = FlattenConfig("ParentId", "ChildId", path_field="ParentProduct")
    failures = validate_config(cfg, SCHEMA)
    assert any("alias" in f.lower() for f in failures)


def test_alias_without_path_fails():
    cfg = FlattenConfig("ParentId", "ChildId", path_alias_field="path")
    failures = validate_config(cfg, SCHEMA)
    assert any("Path field" in f for f in failures)


def test_unknown_path_field_fails():
    cfg = FlattenConfig("ParentId", "ChildId", path_field="nope",
                        path_alias_field="path")
    failures = validate_config(cfg, SCHEMA)
    assert any("nope" in f for f in failures)


def test_unknown_connect_by_root_field_fails():
    cfg = FlattenConfig("ParentId", "ChildId", connect_by_root="missing=root")
    failures = validate_config(cfg, SCHEMA)
    assert any("missing" in f for f in failures)


def test_parent_equals_child_fails():
    cfg = FlattenConfig("ParentId", "ParentId")
    failures = validate_config(cfg, SCHEMA)
    assert any("same as child" in f for f in failures)


def test_max_depth_must_be_positive():
    cfg = FlattenConfig("ParentId", "ChildId", max_depth=0)
    failures = validate_config(cfg, SCHEMA)
    assert any("max depth" in f.lower() for f in failures)


def test_defaults():
    # HierarchyConfig defaults (HierarchyConfig.java:43-53,183-218).
    cfg = FlattenConfig("ParentId", "ChildId")
    assert cfg.level_field == "Level"
    assert cfg.bottom_field == "Bottom"
    assert cfg.max_depth == 50
    assert cfg.path_separator == "/"
    assert validate_config(cfg, SCHEMA) == []


def test_parse_connect_by_root():
    assert parse_connect_by_root("a=b;c=d") == {"a": "b", "c": "d"}
    assert parse_connect_by_root(" a = b ; ") == {"a": "b"}
    assert parse_connect_by_root(None) == {}
    with pytest.raises(ValueError):
        parse_connect_by_root("noequals")


def test_output_schema_derivation():
    # HierarchyConfigTest.testOutputSchema semantics (HierarchyConfig.java:239-253).
    cfg = FlattenConfig("ParentId", "ChildId", level_field="lvl",
                        bottom_field="bot", path_field="ParentProduct",
                        path_alias_field="thePath",
                        connect_by_root="ParentProduct=rootProd;Supplier=rootSup")
    out = derive_output_schema(SCHEMA, cfg)
    assert out.names == ["ParentId", "ChildId", "ParentProduct", "Supplier",
                         "lvl", "bot", "thePath", "rootProd", "rootSup"]
    assert out.field("lvl").type == pa.int32()
    assert out.field("bot").type == pa.bool_()
    assert out.field("thePath").type == pa.string()
    assert out.field("rootProd").type == pa.string()
    assert out.field("rootSup").type == pa.string()
