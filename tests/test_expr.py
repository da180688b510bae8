"""Predicate mini-grammar tests (START WITH, HierarchyFlattener.java:371-373)."""

import pyarrow as pa
import pytest

from raycdc.expr import compile_predicate, filter_table

T = pa.table({
    "parent": ["1", "2", "2", "5"],
    "child": ["2", "3", "6", "6"],
    "n": [1, 2, 2, 5],
    "x": [1.5, 2.5, None, 0.0],
})


def mask(text):
    return compile_predicate(text)(T).to_pylist()


def test_eq_string_col_with_int_literal():
    # Spark-style implicit cast: "parent == 2" on a string column
    # (HierarchyToRelationalTest.java:283).
    assert mask("parent == 2") == [False, True, True, False]


def test_or_and():
    assert mask("parent == 2 OR parent == 5") == [False, True, True, True]
    assert mask("parent == 2 AND child == 6") == [False, False, True, False]


def test_comparison_ops():
    assert mask("n > 1") == [False, True, True, True]
    assert mask("n <= 2") == [True, True, True, False]
    assert mask("n != 2") == [True, False, False, True]
    assert mask("n <> 2") == [True, False, False, True]


def test_parens_and_not():
    assert mask("NOT (n == 2)") == [True, False, False, True]
    assert mask("(parent == 1 OR parent == 2) AND child == 3") == \
        [False, True, False, False]


def test_string_literals():
    assert mask("child == '6'") == [False, False, True, True]
    assert mask('child == "6"') == [False, False, True, True]


def test_is_null():
    assert mask("x IS NULL") == [False, False, True, False]
    assert mask("x IS NOT NULL") == [True, True, False, True]


def test_filter_table():
    out = filter_table(T, "parent == 2 OR parent == 5")
    assert out.num_rows == 3


def test_unknown_column_raises():
    with pytest.raises(ValueError, match="Unknown column"):
        mask("nope == 1")


def test_in():
    assert mask("parent IN (1, 5)") == [True, False, False, True]
    assert mask("parent NOT IN (1, 5)") == [False, True, True, False]
    assert mask("child IN ('3', '6')") == [False, True, True, True]


def test_like():
    t2 = pa.table({"s": ["abc", "axc", "abcd", "zzz"]})
    from raycdc.expr import compile_predicate
    assert compile_predicate("s LIKE 'a%c'")(t2).to_pylist() == \
        [True, True, False, False]
    assert compile_predicate("s LIKE 'a_c'")(t2).to_pylist() == \
        [True, True, False, False]
    assert compile_predicate("s NOT LIKE 'a%'")(t2).to_pylist() == \
        [False, False, False, True]


def test_between():
    assert mask("n BETWEEN 2 AND 5") == [False, True, True, True]
    assert mask("NOT (n BETWEEN 2 AND 2)") == [True, False, False, True]


def test_garbage_raises():
    with pytest.raises(ValueError):
        compile_predicate("parent ==")
    with pytest.raises(ValueError):
        compile_predicate("parent @ 2")
