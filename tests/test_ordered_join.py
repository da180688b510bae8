"""Co-range merge join over two ordered lakes (ops/sort.ordered_lake_join):
parity vs SQL semantics for every supported join type (duplicate right
keys, unmatched keys both sides), null-key semantics, disjoint-range
lakes, and the validation surface."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from raycdc.ops.sort import (ordered_lake_join, sort_dataset,
                             write_sorted_parquet)


def _lake(tmp_path, name, tbl, key, parts):
    d = str(tmp_path / name)
    write_sorted_parquet(
        sort_dataset(ray.data.from_arrow(tbl), [key],
                     num_partitions=parts), d)
    return d


def _canon(df):
    cols = sorted(df.columns)
    return (df.reindex(cols, axis=1).sort_values(cols)
            .reset_index(drop=True))


@pytest.fixture(scope="module")
def lakes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ordjoin")
    rng = np.random.default_rng(7)
    left = pa.table({
        "k": rng.permutation(400).astype("int64"),
        "lv": np.arange(400, dtype="int64")})
    rk = np.repeat(np.arange(0, 600, 2), 2).astype("int64")  # dups + misses
    right = pa.table({"k": rng.permutation(rk),
                      "rv": np.arange(len(rk), dtype="int64")})
    return (_lake(tmp, "L", left, "k", 7), _lake(tmp, "R", right, "k", 5),
            left, right)


@pytest.mark.parametrize("jt,sql", [
    ("inner", "SELECT l.k, l.lv AS lv_l, r.rv AS rv_r "
              "FROM L l JOIN R r USING (k)"),
    ("left_outer", "SELECT l.k, l.lv AS lv_l, r.rv AS rv_r "
                   "FROM L l LEFT JOIN R r USING (k)"),
    ("left_semi", "SELECT l.k, l.lv AS lv_l FROM L l "
                  "WHERE EXISTS (SELECT 1 FROM R r WHERE r.k = l.k)"),
    ("left_anti", "SELECT l.k, l.lv AS lv_l FROM L l "
                  "WHERE NOT EXISTS (SELECT 1 FROM R r WHERE r.k = l.k)"),
])
def test_join_types_match_sql(lakes, jt, sql):
    import duckdb

    ld, rd, left, right = lakes
    got = ordered_lake_join(ld, rd, left_key="k", right_key="k",
                            join_type=jt).to_pandas()
    con = duckdb.connect()
    con.register("L", left)
    con.register("R", right)
    want = con.execute(sql).df()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want).astype(_canon(got).dtypes.to_dict()),
        check_dtype=False)


def test_null_keys_never_match_but_survive_outer(tmp_path):
    left = pa.table({"k": pa.array([1, None, 2, None], pa.int64()),
                     "lv": pa.array([10, 11, 12, 13], pa.int64())})
    right = pa.table({"k": pa.array([1, None], pa.int64()),
                      "rv": pa.array([100, 101], pa.int64())})
    ld = _lake(tmp_path, "L", left, "k", 2)
    rd = _lake(tmp_path, "R", right, "k", 2)
    inner = ordered_lake_join(ld, rd, left_key="k", right_key="k").to_pandas()
    assert inner["k"].tolist() == [1] and inner["rv_r"].tolist() == [100]
    outer = _canon(ordered_lake_join(
        ld, rd, left_key="k", right_key="k",
        join_type="left_outer").to_pandas())
    assert len(outer) == 4
    assert outer["rv_r"].notna().sum() == 1


def test_disjoint_ranges_and_empty_overlap(tmp_path):
    left = pa.table({"k": pa.array(range(0, 10), pa.int64()),
                     "lv": pa.array(range(10), pa.int64())})
    right = pa.table({"k": pa.array(range(100, 110), pa.int64()),
                      "rv": pa.array(range(10), pa.int64())})
    ld = _lake(tmp_path, "L", left, "k", 3)
    rd = _lake(tmp_path, "R", right, "k", 3)
    assert ordered_lake_join(ld, rd, left_key="k", right_key="k").count() == 0
    anti = ordered_lake_join(ld, rd, left_key="k", right_key="k",
                             join_type="left_anti").to_pandas()
    assert sorted(anti["k"]) == list(range(10))


def test_unsupported_join_types_raise(tmp_path):
    t = pa.table({"k": pa.array([1], pa.int64())})
    d = _lake(tmp_path, "X", t, "k", 1)
    with pytest.raises(ValueError):
        ordered_lake_join(d, d, left_key="k", right_key="k",
                          join_type="full_outer")


def test_part_with_all_null_key_row_group_still_joins(tmp_path):
    """A nulls_last lake can put an ALL-null-key row group in the last
    part (no min/max stats for that group => the whole file's range is
    UNKNOWN). The join must treat unknown as may-contain-anything — the
    file's real keys still match; skipping it would silently lose rows."""
    import pyarrow.parquet as pq

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "lv": pa.array([10, 20, 30, 40], pa.int64())})
    ld = _lake(tmp_path, "L", left, "k", 2)
    # hand-build the right lake: part-00000 normal, part-00001 has a
    # second row group whose keys are ALL null (stats-less)
    rd = tmp_path / "R"
    rd.mkdir()
    pq.write_table(pa.table({"k": pa.array([1], pa.int64()),
                             "rv": pa.array([100], pa.int64())}),
                   str(rd / "part-00000.parquet"))
    tail = pa.table({"k": pa.array([3, 4, None, None], pa.int64()),
                     "rv": pa.array([300, 400, 998, 999], pa.int64())})
    pq.write_table(tail, str(rd / "part-00001.parquet"), row_group_size=2)
    md = pq.read_metadata(str(rd / "part-00001.parquet"))
    assert md.num_row_groups == 2  # the second group is all-null keys

    got = _canon(ordered_lake_join(ld, str(rd), left_key="k", right_key="k",
                                   join_type="inner").to_pandas())
    assert got["k"].tolist() == [1, 3, 4]
    assert got["rv_r"].tolist() == [100, 300, 400]
    outer = ordered_lake_join(ld, str(rd), left_key="k", right_key="k",
                              join_type="left_outer").to_pandas()
    assert len(outer) == 4  # k=2 unmatched, null right keys never matched
