"""Z-order clustering key (ops/sort.zorder_value): bit-exactness vs a
per-row reference, null/negative/width validation, and the point of the
layout — a rectangle query over the z-sorted lake prunes part files on
BOTH dimensions and still returns the exact rectangle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from raycdc.ops.sort import (read_sorted_parquet, sort_dataset,
                             write_sorted_parquet, zorder_bit_terms,
                             zorder_value)


def _ref_z(vals, bits):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= (((v & ((1 << bits) - 1)) >> i) & 1) << (len(vals) * i + j)
    return z


def test_bit_exact_vs_reference_and_nulls():
    xs = [0, 1, 2, 3, 7, 2**21 - 1, 2**30, None, 5]
    ys = [0, 1, 0, 5, 7, 2**21 - 1, 1, 1, None]
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64())}))
    out = zorder_value(ds, ["x", "y"], bits=21).to_pandas()
    for i, (x, y) in enumerate(zip(xs, ys)):
        got = out["zval"][i]
        if x is None or y is None:
            assert got != got  # null in any dim -> null key
        else:
            assert got == _ref_z([x, y], 21), (x, y)


def test_three_dims_and_validation():
    ds = ray.data.from_arrow(pa.table({"a": [1], "b": [2], "c": [3]}))
    out = zorder_value(ds, ["a", "b", "c"], bits=4).to_pandas()
    assert out["zval"][0] == _ref_z([1, 2, 3], 4)
    with pytest.raises(ValueError):
        zorder_value(ds, ["a"], bits=4)
    with pytest.raises(ValueError):
        zorder_value(ds, ["a", "b"], bits=32)  # 2*32 > 63
    neg = ray.data.from_arrow(pa.table({"a": [-1], "b": [2]}))
    with pytest.raises(Exception):
        zorder_value(neg, ["a", "b"], bits=4).to_pandas()


def _part_stats(out_dir, key="zval"):
    import glob
    import os

    stats = []
    for f in sorted(glob.glob(os.path.join(str(out_dir), "part-*.parquet"))):
        md = pq.read_metadata(f)
        ci = md.schema.to_arrow_schema().names.index(key)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        stats.append((min(mins), max(maxs)))
    return stats


def test_rectangle_query_prunes_both_dimensions(tmp_path):
    # 64x64 grid, z-sorted into 16 parts; rect x,y in [8,15]^2 maps to the
    # z-interval [z(8,8), z(15,15)] (Morton is monotone per coordinate)
    n = 64
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    tbl = pa.table({"x": x.ravel().astype("int64"),
                    "y": y.ravel().astype("int64")})
    ds = zorder_value(ray.data.from_arrow(tbl), ["x", "y"], bits=6)
    res = sort_dataset(ds, ["zval"], num_partitions=16)
    write_sorted_parquet(res, str(tmp_path))

    lo, hi = _ref_z([8, 8], 6), _ref_z([15, 15], 6)
    got = pa.concat_tables(list(
        read_sorted_parquet(str(tmp_path), "zval", lo=lo, hi=hi)
        .iter_batches(batch_format="pyarrow")))
    rect = got.filter(
        pa.compute.and_(
            pa.compute.and_(pa.compute.greater_equal(got["x"], 8),
                            pa.compute.less_equal(got["x"], 15)),
            pa.compute.and_(pa.compute.greater_equal(got["y"], 8),
                            pa.compute.less_equal(got["y"], 15))))
    assert rect.num_rows == 8 * 8  # exact rectangle
    # the z-interval touches a strict subset of parts
    stats = _part_stats(tmp_path)
    touched = sum(1 for mn, mx in stats if not (mx < lo or mn > hi))
    assert 0 < touched < len(stats)


def test_sql_terms_match_engine():
    import duckdb

    expr = " | ".join(zorder_bit_terms(["x", "y"], 6))
    rows = duckdb.connect().execute(
        f"SELECT {expr} FROM (VALUES (3, 5), (63, 0)) t(x, y)").fetchall()
    assert [r[0] for r in rows] == [_ref_z([3, 5], 6), _ref_z([63, 0], 6)]


def test_zorder_range_read_api(tmp_path):
    """The first-class rectangle query: zorder_range_read must equal a
    brute-force filter of the raw grid and prune to a strict part subset."""
    from raycdc.ops.sort import zorder_range_read, zorder_scalar

    n = 64
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    tbl = pa.table({"x": x.ravel().astype("int64"),
                    "y": y.ravel().astype("int64")})
    ds = zorder_value(ray.data.from_arrow(tbl), ["x", "y"], bits=6)
    write_sorted_parquet(sort_dataset(ds, ["zval"], num_partitions=16),
                         str(tmp_path))
    got = pa.concat_tables(list(
        zorder_range_read(str(tmp_path), cols=["x", "y"], lows=[5, 20],
                          highs=[12, 30], bits=6, columns=["x", "y"])
        .iter_batches(batch_format="pyarrow")))
    assert got.num_rows == 8 * 11
    assert (got["x"].to_pandas().between(5, 12).all()
            and got["y"].to_pandas().between(20, 30).all())
    assert zorder_scalar([5, 20], 6) <= zorder_scalar([12, 30], 6)
    with pytest.raises(ValueError):
        zorder_scalar([-1, 2], 6)
