"""End-to-end curation pipeline invariants (composition of engine ops)."""

import pyarrow as pa
import ray.data

from raycdc.pipelines import curate_documents


def test_curation_pipeline_invariants(sf_dir):
    import pyarrow.parquet as pq

    docs = ray.data.from_arrow(pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))
    out = pa.concat_tables(list(curate_documents(
        docs, min_tokens=5, max_punct_ratio=0.2, keep_lang="en",
        num_partitions=4).iter_batches(batch_format="pyarrow")))
    assert out.column_names == ["doc_id", "text_norm", "n_tokens",
                                "lang_pred"]
    assert out.num_rows > 0
    texts = out["text_norm"].to_pylist()
    assert len(texts) == len(set(texts))          # deduped
    assert set(out["lang_pred"].to_pylist()) == {"en"}
    assert min(out["n_tokens"].to_pylist()) >= 5
    assert all(t == t.lower() and "  " not in t for t in texts)


def test_curation_v2_matches_entry_oracle(sf_dir):
    """The composed v2 chain (sample -> normalize -> redact -> filter ->
    dedup) equals its CTE-chain oracle on sf0.001."""
    import duckdb
    import pandas as pd
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["curation_pipeline_v2"](sf_dir)
    tabs = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    got = pa.concat_tables(tabs, promote_options="default").to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    ref = con.sql(entrymod.oracle_sql()["curation_pipeline_v2"]).df()
    key = ["doc_id"]
    a = got.sort_values(key).reset_index(drop=True).reindex(
        sorted(got.columns), axis=1)
    b = ref.sort_values(key).reset_index(drop=True).reindex(
        sorted(ref.columns), axis=1)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (got["text_redacted"].str.contains("<EMAIL>")).all()
