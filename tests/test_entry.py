"""Driver-contract gate: every queries() entry runs; every oracle_sql() entry
matches the Ray result (row count + schema names + order-insensitive values),
mirroring the external driver's CORRECTNESS check."""

import math
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def to_df(result) -> pd.DataFrame:
    if hasattr(result, "iter_batches"):  # ray Dataset
        tables = list(result.iter_batches(batch_format="pyarrow"))
        return pa.concat_tables(tables).to_pandas() if tables else pd.DataFrame()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def assert_frames_match(ray_df, sql_df, name):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f":
            import numpy as np
            assert np.allclose(av.astype(float), bv.astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True), \
                f"{name}: float col {c} differs"
        else:
            # NaT/NA compare unequal to themselves; a null matches a null
            # (the SQL comparison the driver mirrors is value-based)
            both_na = pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy()
            assert ((av == bv) | both_na).all(), f"{name}: col {c} differs"


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, sf_dir):
    ray_df = to_df(QUERIES[name](sf_dir))
    con = duck_con(sf_dir)
    # the cdc_replay oracle reads the WAL whose path depends on the scale
    # factor; oracle_sql() pins the driver's sf0.01, tests re-derive it
    sf_dependent = {"cdc_replay": entrymod._cdc_replay_oracle_sql,
                    "lake_maintenance": entrymod._cdc_replay_oracle_sql,
                    "cdc_time_travel": entrymod._cdc_time_travel_oracle_sql,
                    "cdc_changes": entrymod._cdc_changes_oracle_sql,
                    "incremental_view": entrymod._incremental_view_oracle_sql,
                    "incremental_minmax_view":
                        entrymod._incremental_minmax_oracle_sql,
                    "copartition_join": entrymod._copartition_join_oracle_sql,
                    "cdc_schema_evolution":
                        entrymod._cdc_schema_evolution_oracle_sql,
                    "merge_upsert": entrymod._merge_upsert_oracle_sql,
                    "lake_lookup": entrymod._lake_lookup_oracle_sql,
                    "host_stats": entrymod._host_stats_oracle_sql}
    sql = (sf_dependent[name](sf_dir) if name in sf_dependent
           else ORACLE[name])
    sql_df = con.sql(sql).df()
    assert_frames_match(ray_df, sql_df, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_query_runs_rows_only(name, sf_dir):
    df = to_df(QUERIES[name](sf_dir))
    assert df is not None
    assert len(df) >= 0  # runs and yields a stable frame
    if name in ("cdc_replay",):
        assert len(df) > 0


def test_first_50_queries_all_oracle_backed():
    """The external driver's CORRECTNESS gate checks exactly the first 50
    queries() entries — every one must have an oracle (VERDICT r3 #1)."""
    window = list(QUERIES)[:50]
    missing = [k for k in window if k not in ORACLE]
    assert not missing, f"no-oracle queries inside the driver window: {missing}"


def test_lake_fsck_query_reports_clean(sf_dir):
    """The fsck driver query must report both shared lake fixtures clean —
    a lake-invariant regression flips ok/n_errors here AND in the external
    rows-only check (VERDICT r4 #5)."""
    df = to_df(QUERIES["lake_fsck"](sf_dir))
    assert list(df["lake"]) == ["replay", "time_travel"]
    assert df["ok"].all()
    assert (df["n_errors"] == 0).to_numpy().all()
    assert (df["files_checked"] > 0).to_numpy().all()


def test_entry_smoke():
    result = entrymod.entry()
    df = to_df(result)
    assert len(df) > 0
    assert "url" in df.columns and "text" in df.columns
