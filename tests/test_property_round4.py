"""Property tests for the round-4 dedup-wave exchanges: random typed
inputs with nulls, each checked against an independent reference
(hash_join for the bloom anti join, pandas for grouped top-N, direct
reconstruction for the snapshot diff)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def pdf(ds):
    """Ray 2.49 to_pandas() on a ZERO-ROW dataset returns a column-less
    DataFrame even when ds.schema() is known — rebuild the typed empty
    frame from the schema so column comparisons hold on empty results."""
    df = ds.to_pandas()
    if df.shape[1] == 0:
        s = ds.schema()
        if s is not None:
            df = pa.table({n: pa.array([], t)
                           for n, t in zip(s.names, s.types)}).to_pandas()
    return df

keys = st.lists(st.one_of(st.integers(0, 20), st.none()),
                min_size=0, max_size=40)


@given(lk=keys, rk=keys)
@settings(**SETTINGS)
def test_bloom_anti_equals_exact_anti(lk, rk):
    from raycdc.joins import bloom_anti_join, hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "v": pa.array(range(len(lk)), pa.int64())}))
    right = ray.data.from_arrow(pa.table({"k": pa.array(rk, pa.int64())}))
    got = pdf(bloom_anti_join(left, right, on=["k"], auto_skip=None,
                              num_partitions=4))
    want = pdf(hash_join(left, right, on=["k"], join_type="left_anti"))
    g = got.sort_values("v").reset_index(drop=True)
    w = want.sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@given(data=st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 30)),
    min_size=1, max_size=50), n=st.integers(1, 4))
@settings(**SETTINGS)
def test_grouped_top_n_matches_pandas(data, n):
    from raycdc.agg import grouped_top_n

    df = pd.DataFrame(data, columns=["g", "v"])
    df["id"] = range(len(df))
    ds = ray.data.from_arrow(pa.Table.from_pandas(df,
                                                  preserve_index=False))
    got = grouped_top_n(ds, ["g"], "v", n=n, tiebreak="id",
                        num_partitions=4).to_pandas()
    want = (df.sort_values(["v", "id"], ascending=[False, True],
                           kind="stable")
            .groupby("g", sort=False).head(n))
    assert (sorted(map(tuple, got[["g", "id"]].to_numpy()))
            == sorted(map(tuple, want[["g", "id"]].to_numpy())))


vals = st.lists(st.one_of(st.integers(0, 3), st.none()),
                min_size=0, max_size=25)


@given(ov=vals, nv=vals)
@settings(**SETTINGS)
def test_table_diff_round_trip(ov, nv):
    from raycdc.cdc.diff import table_diff

    old = pd.DataFrame({"k": range(len(ov)),
                        "v": pd.array(ov, dtype="Int64")})
    new = pd.DataFrame({"k": range(2, 2 + len(nv)),
                        "v": pd.array(nv, dtype="Int64")})
    diff = pdf(table_diff(
        ray.data.from_arrow(pa.Table.from_pandas(old,
                                                 preserve_index=False)),
        ray.data.from_arrow(pa.Table.from_pandas(new,
                                                 preserve_index=False)),
        key_cols=["k"], compare_cols=["v"],
        num_partitions=4))
    changed = set(diff["k"])
    untouched = old[~old["k"].isin(changed)]
    applied = pd.concat([untouched,
                         diff[diff["op"].isin(["I", "U"])][["k", "v"]]])
    a = applied.sort_values("k").reset_index(drop=True)
    b = new.sort_values("k").reset_index(drop=True)
    assert list(a["k"]) == list(b["k"])
    assert [None if pd.isna(x) else int(x) for x in a["v"]] \
        == [None if pd.isna(x) else int(x) for x in b["v"]]
