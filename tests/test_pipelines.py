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
