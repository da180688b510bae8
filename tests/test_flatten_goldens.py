"""Golden tests for the hierarchy flattener.

All six end-to-end scenarios from the reference's test suite
(/root/reference src/test/java/io/cdap/plugin/spark/HierarchyToRelationalTest.java)
ported verbatim: same inputs, same configs, same expected row sets, compared
order-insensitively (the reference compares HashSets; output order is
unspecified). Each scenario runs through the broadcast strategy, the local
single-table kernel, and (for a subset) the shuffle-join strategy.
"""

import pyarrow as pa
import pytest
import ray.data

from raycdc import FlattenConfig, flatten_hierarchy
from raycdc.flatten import flatten_hierarchy_table


def rows_set(table: pa.Table) -> set[tuple]:
    cols = [table[c].to_pylist() for c in table.column_names]
    return set(zip(*cols)) if table.num_rows else set()


def run_flatten(table: pa.Table, cfg: FlattenConfig, strategy: str) -> pa.Table:
    if strategy == "local":
        return flatten_hierarchy_table(table, cfg)
    ds = ray.data.from_arrow(table)
    kwargs = {}
    if strategy == "broadcast_colocate":
        strategy, kwargs = "broadcast", {"co_locate_seeds": True}
    out = flatten_hierarchy(ds, cfg, strategy=strategy, num_partitions=2,
                            **kwargs)
    return pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
        or [out.schema().empty_table() if hasattr(out.schema(), "empty_table") else pa.table({})]
    )


DIAMOND = pa.table({
    "parent": ["1", "1", "2", "3", "4", "5"],
    "child": ["2", "4", "3", "6", "6", "6"],
})

STRATEGIES = ["local", "broadcast", "shuffle", "broadcast_colocate"]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_multiple_roots(strategy):
    # HierarchyToRelationalTest.testMultipleRoots (:162-273)
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        path_field="child", path_alias_field="path",
                        connect_by_root="child=root")
    out = run_flatten(DIAMOND, cfg, strategy)
    assert out.column_names == ["parent", "child", "Level", "Bottom", "path", "root"]
    expected = {
        ("1", "2", 1, False, "/2", "2"),
        ("1", "4", 1, False, "/4", "4"),
        ("2", "3", 1, False, "/3", "3"),
        ("3", "6", 1, True, "/6", "6"),
        ("4", "6", 1, True, "/6", "6"),
        ("5", "6", 1, True, "/6", "6"),
        ("2", "3", 2, False, "/2/3", "2"),
        ("4", "6", 2, True, "/4/6", "4"),
        ("3", "6", 2, True, "/3/6", "3"),
        ("3", "6", 3, True, "/2/3/6", "2"),
    }
    assert rows_set(out) == expected


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_start_with(strategy):
    # HierarchyToRelationalTest.testStartWith (:275-356)
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        path_field="parent", path_alias_field="path",
                        path_separator="|",
                        start_with="parent == 2 OR parent == 5")
    out = run_flatten(DIAMOND, cfg, strategy)
    expected = {
        ("2", "3", 1, False, "|2"),
        ("5", "6", 1, True, "|5"),
        ("3", "6", 2, True, "|2|3"),
    }
    assert rows_set(out) == expected


TYPED_SCHEMA = pa.schema([
    pa.field("ParentId", pa.int32(), nullable=False),
    pa.field("ChildId", pa.int32(), nullable=False),
    pa.field("ParentProduct", pa.string(), nullable=False),
    pa.field("ChildProduct", pa.string(), nullable=False),
    pa.field("Supplier", pa.string()),
    pa.field("Sales", pa.int32(), nullable=False),
])

TYPED_ROWS = [
    (1, 2, "Groceries", "Produce", "A", 50),
    (1, 3, "Groceries", "Dairy", "B", 40),
    (2, 4, "Produce", "Vegetables", "C", 50),
    (4, 6, "Vegetables", "Onion", "E", 30),
    (2, 7, "Produce", "Fruits", "F", 40),
    (3, 8, "Dairy", "Milk", "D", 60),
]

TYPED_EXPECTED = {
    (1, 3, "Groceries", "Dairy", "B", 40, 1, False, "/Groceries", "Groceries"),
    (1, 2, "Groceries", "Produce", "A", 50, 1, False, "/Groceries", "Groceries"),
    (2, 4, "Produce", "Vegetables", "C", 50, 1, False, "/Produce", "Produce"),
    (2, 7, "Produce", "Fruits", "F", 40, 1, True, "/Produce", "Produce"),
    (3, 8, "Dairy", "Milk", "D", 60, 1, True, "/Dairy", "Dairy"),
    (4, 6, "Vegetables", "Onion", "E", 30, 1, True, "/Vegetables", "Vegetables"),
    (3, 8, "Dairy", "Milk", "D", 60, 2, True, "/Groceries/Dairy", "Groceries"),
    (2, 4, "Produce", "Vegetables", "C", 50, 2, False, "/Groceries/Produce", "Groceries"),
    (2, 7, "Produce", "Fruits", "F", 40, 2, True, "/Groceries/Produce", "Groceries"),
    (4, 6, "Vegetables", "Onion", "E", 30, 2, True, "/Produce/Vegetables", "Produce"),
    (4, 6, "Vegetables", "Onion", "E", 30, 3, True,
     "/Groceries/Produce/Vegetables", "Groceries"),
}

TYPED_CFG = FlattenConfig(parent_field="ParentId", child_field="ChildId",
                          level_field="levelField", bottom_field="bottomField",
                          max_depth=50, path_field="ParentProduct",
                          path_alias_field="pathField",
                          connect_by_root="ParentProduct=rootField")


def _typed_table(rows):
    arrays = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(arrays[i], f.type) for i, f in enumerate(TYPED_SCHEMA)},
        schema=TYPED_SCHEMA,
    )


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_dataset_without_root_element(strategy):
    # HierarchyToRelationalTest.testDatasetWithoutRootElement (:358-396)
    out = run_flatten(_typed_table(TYPED_ROWS), TYPED_CFG, strategy)
    assert rows_set(out) == TYPED_EXPECTED


@pytest.mark.parametrize("strategy", ["local", "broadcast"])
def test_dataset_with_root_element(strategy):
    # HierarchyToRelationalTest.testDatasetWithRootElement (:398-435): a
    # self-referencing root row (1, 1, ...) must produce identical output.
    rows = [(1, 1, "Groceries", "Groceries", None, 0)] + TYPED_ROWS
    out = run_flatten(_typed_table(rows), TYPED_CFG, strategy)
    assert rows_set(out) == TYPED_EXPECTED


@pytest.mark.parametrize("strategy", ["local", "broadcast"])
def test_disjoint_hierarchies(strategy):
    # HierarchyToRelationalTest.testDisjointHierarchies (:437-530)
    table = pa.table({
        "parent": pa.array([1, 1, 2, 2, 4, 7], pa.int32()),
        "child": pa.array([2, 3, 5, 6, 6, 8], pa.int32()),
        "category": ["vegetable", "dairy", "lettuce", "tomato", "tomato", "water"],
    })
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        path_field="category", path_alias_field="path")
    out = run_flatten(table, cfg, strategy)
    expected = {
        (1, 2, "vegetable", 1, False, "/vegetable"),
        (1, 3, "dairy", 1, True, "/dairy"),
        (2, 5, "lettuce", 1, True, "/lettuce"),
        (2, 6, "tomato", 1, True, "/tomato"),
        (4, 6, "tomato", 1, True, "/tomato"),
        (7, 8, "water", 1, True, "/water"),
        (2, 5, "lettuce", 2, True, "/vegetable/lettuce"),
        (2, 6, "tomato", 2, True, "/vegetable/tomato"),
    }
    assert rows_set(out) == expected


@pytest.mark.parametrize("strategy", ["local", "broadcast", "shuffle"])
def test_one_level_hierarchy(strategy):
    # HierarchyToRelationalTest.testOneLevelHierarchy (:532-578): maxDepth=1
    # on a single edge yields exactly the level-1 row, no error.
    table = pa.table({"parent": pa.array([1], pa.int32()),
                      "child": pa.array([2], pa.int32())})
    cfg = FlattenConfig(parent_field="parent", child_field="child", max_depth=1)
    out = run_flatten(table, cfg, strategy)
    assert rows_set(out) == {(1, 2, 1, True)}


@pytest.mark.parametrize("strategy", ["local", "broadcast"])
def test_multiple_connect_by_roots(strategy):
    # HierarchyToRelationalTest.testMultipleConnectByRoots (:580-638)
    table = pa.table({"parent": pa.array([1, 2], pa.int32()),
                      "child": pa.array([2, 3], pa.int32())})
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        connect_by_root="parent=root1;child=root2")
    out = run_flatten(table, cfg, strategy)
    expected = {
        (1, 2, 1, False, 1, 2),
        (2, 3, 1, True, 2, 3),
        (2, 3, 2, True, 1, 2),
    }
    assert rows_set(out) == expected


def test_max_depth_exceeded_raises():
    # A non-leaf frontier beyond max_depth raises (HierarchyFlattener.java:215-220).
    table = pa.table({"parent": pa.array([1, 2], pa.int32()),
                      "child": pa.array([2, 3], pa.int32())})
    cfg = FlattenConfig(parent_field="parent", child_field="child", max_depth=1)
    with pytest.raises(ValueError, match="Exceeded maximum depth"):
        flatten_hierarchy_table(table, cfg)


def test_cycle_raises():
    table = pa.table({"parent": pa.array([1, 2], pa.int32()),
                      "child": pa.array([2, 1], pa.int32())})
    cfg = FlattenConfig(parent_field="parent", child_field="child", max_depth=10)
    with pytest.raises(ValueError, match="Exceeded maximum depth"):
        flatten_hierarchy_table(table, cfg)


def test_duplicate_edges_collapse():
    # Input is treated as a set of edges: duplicates collapse in the dedup
    # group-aggregate (SURVEY.md §2.1 note 11).
    table = pa.table({"parent": pa.array([1, 1], pa.int32()),
                      "child": pa.array([2, 2], pa.int32())})
    cfg = FlattenConfig(parent_field="parent", child_field="child")
    out = flatten_hierarchy_table(table, cfg)
    assert rows_set(out) == {(1, 2, 1, True)}


def test_auto_strategy_picks_broadcast_for_small_input():
    cfg = FlattenConfig(parent_field="parent", child_field="child")
    ds = ray.data.from_arrow(pa.table({"parent": ["1"], "child": ["2"]}))
    out = flatten_hierarchy(ds, cfg, strategy="auto")
    assert rows_set(pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")))) == {("1", "2", 1, True)}


def test_empty_input():
    table = pa.table({"parent": pa.array([], pa.int32()),
                      "child": pa.array([], pa.int32())})
    cfg = FlattenConfig(parent_field="parent", child_field="child")
    out = flatten_hierarchy_table(table, cfg)
    assert out.num_rows == 0
    assert out.column_names == ["parent", "child", "Level", "Bottom"]
