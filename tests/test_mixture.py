"""Per-stratum rate sampling (dataset mixing) vs the identical SQL
predicate."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from raycdc.agg import mixture_sample


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        s = ds.schema()
        return pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)]).empty_table()
    return pa.concat_tables(tabs, promote_options="default")


def _docs(n=5000, seed=9):
    rng = np.random.default_rng(seed)
    src = rng.choice(["web", "books", "code", "forums"], size=n)
    ids = np.arange(n, dtype=np.int64)
    return pa.table({"doc_id": pa.array(ids),
                     "source": pa.array(src)})


def test_mixture_sample_matches_sql_predicate():
    t = _docs()
    rates = {"web": 0.25, "books": 1.0, "code": 0.5}
    got = to_table(mixture_sample(
        ray.data.from_arrow(t).repartition(6), "source", "doc_id",
        rates, default_rate=0.1))
    cuts = {k: int(r * 4294967296) for k, r in rates.items()}
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(f"""
        SELECT doc_id, source FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 <
          CASE source
            WHEN 'web' THEN {cuts['web']}
            WHEN 'books' THEN {cuts['books']}
            WHEN 'code' THEN {cuts['code']}
            ELSE {int(0.1 * 4294967296)}
          END
        ORDER BY doc_id""").arrow()
    con.close()
    gs = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ws = want.to_pandas().reset_index(drop=True)
    assert gs.equals(ws)
    # every stratum landed near its rate (law of large numbers, wide bars)
    frac = gs[gs.source == "books"].shape[0] / (t.num_rows / 4)
    assert 0.9 < frac < 1.1


def test_mixture_sample_null_and_guard_semantics():
    t = pa.table({
        "doc_id": pa.array([1, 2, None, 4], pa.int64()),
        "source": pa.array(["web", None, "web", "books"]),
    })
    got = to_table(mixture_sample(
        ray.data.from_arrow(t), "source", "doc_id",
        {"web": 1.0, "books": 1.0}, default_rate=1.0))
    # null id dropped (SQL NULL predicate); null stratum takes default
    assert sorted(got["doc_id"].to_pylist()) == [1, 2, 4]

    bad = pa.table({"doc_id": pa.array([-1], pa.int64()),
                    "source": pa.array(["web"])})
    with pytest.raises(Exception, match="non-negative"):
        to_table(mixture_sample(ray.data.from_arrow(bad), "source",
                                "doc_id", {"web": 1.0}))

    with pytest.raises(ValueError):
        mixture_sample(ray.data.from_arrow(t), "source", "doc_id",
                       {"web": 1.5})
