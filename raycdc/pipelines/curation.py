"""End-to-end web-corpus curation: the composition story.

A training-data curation pass as one lazy Ray Data pipeline over the
engine's own operators — every stage is a vectorized ``map_batches`` or a
partition-only exchange, so the whole chain streams with backpressure and
never materializes the corpus:

    documents
      → normalize_text          (lowercase, collapse whitespace, trim)
      → quality features        (exact counts/ratios, RE2 kernels)
      → filter                  (min tokens, max punctuation ratio)
      → language ID             (stopword-marker argmax)
      → filter                  (keep one language)
      → exact dedup             (hash-partitioned, min doc_id survives)
      → project                 (doc_id, text_norm, n_tokens, lang_pred)

Every stage is individually oracle-proven against DuckDB, so the whole
composition is SQL-expressible and the driver hash-checks the end-to-end
result — the integration test for operator compatibility, not just each
operator alone.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.ops.dedup import exact_dedup
from raycdc.ops.text import QualityScorer, add_lang_id, normalize_text


def curate_documents(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    keep_lang: str = "en",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Curate a document corpus into a clean, deduplicated, single-language
    training set. Returns (doc_id, text_norm, n_tokens, lang_pred)."""
    normed = normalize_text(ds, text_col=text_col)

    scorer = QualityScorer(text_col="text_norm")

    def quality_filter(t: pa.Table) -> pa.Table:
        t = scorer(t)
        keep = pc.and_(
            pc.greater_equal(t["n_tokens"], min_tokens),
            pc.less(t["punct_ratio"], max_punct_ratio))
        return t.filter(pc.fill_null(keep, False))

    scored = normed.map_batches(quality_filter, batch_format="pyarrow")
    langed = add_lang_id(scored, text_col="text_norm")

    def lang_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(
            pc.equal(t["lang_pred"], keep_lang), False))
        return t.select([id_col, "text_norm", "n_tokens", "lang_pred"])

    filtered = langed.map_batches(lang_filter, batch_format="pyarrow")
    return exact_dedup(filtered, text_col="text_norm", id_col=id_col,
                       num_partitions=num_partitions)
