"""Round-4 text/composition guards (ADVICE r3): DuckDB parity on TRICKY
fixtures — null text, needle hits, empty docs — for decontaminate,
filter_above_global_quantile, top-bigrams and curation v3, plus the
default-argument regression of curate_documents_v3."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from raycdc.ops.text import decontaminate, ngram_explode


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


def _docs() -> pa.Table:
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = ["needle one batch batch batch here",  # contaminated
             None,                                  # null text
             "",                                    # empty
             "plain clean text doc",
             "slow query inside",                   # contaminated
             "w0 w0 w0 w0 w0 w0"]                   # repetitive
    texts += [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
              for _ in range(120)]
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(n)]),
        "n_chars": pa.array([len(t) if t is not None else 0 for t in texts],
                            pa.int64()),
    })


def _con(docs: pa.Table):
    con = duckdb.connect()
    con.register("documents", docs)
    return con


NEEDLES = ["batch batch batch", "window dup", "slow query"]


def test_decontaminate_keeps_null_text_like_coalesced_oracle():
    docs = _docs()
    out = to_table(decontaminate(ray.data.from_arrow(docs), NEEDLES))
    want = _con(docs).execute("""
        SELECT doc_id, text, source, n_chars FROM documents
        WHERE COALESCE(NOT (contains(text, 'batch batch batch')
                            OR contains(text, 'window dup')
                            OR contains(text, 'slow query')), TRUE)
    """).fetch_arrow_table()
    assert sorted(out["doc_id"].to_pylist()) == \
        sorted(want["doc_id"].to_pylist())
    # the null-text row survived (the divergence ADVICE r3 flagged)
    assert 1 in out["doc_id"].to_pylist()


def test_filter_above_global_quantile_matches_percentile_disc():
    from raycdc.pipelines.curation import filter_above_global_quantile

    docs = _docs().select(["doc_id", "n_chars"])
    out = to_table(filter_above_global_quantile(
        ray.data.from_arrow(docs), "n_chars", 0.5, m=1 << 20))
    want = _con(_docs()).execute("""
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.5)
                          FROM documents)""").fetch_arrow_table()
    assert sorted(out["doc_id"].to_pylist()) == \
        sorted(want["doc_id"].to_pylist())


def test_top_bigrams_matches_oracle_on_tricky_docs():
    from raycdc.agg import grouped_aggregate, top_k

    docs = _docs()
    grams = ngram_explode(ray.data.from_arrow(docs.select(["text"])),
                          n=2, text_col="text")
    counts = grouped_aggregate(grams, ["ngram"], count_name="n",
                               exchange="partition", num_partitions=4)
    out = to_table(top_k(counts, ["n", "ngram"], 10,
                         descending=[True, False]))
    want = _con(docs).execute(r"""
        WITH toks AS (
          SELECT regexp_extract_all(text, '\S+') AS t FROM documents),
        idx AS (
          SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM toks WHERE len(t) >= 2),
        grams AS (SELECT t[i] || ' ' || t[i+1] AS ngram FROM idx)
        SELECT ngram, CAST(count(*) AS BIGINT) AS n
        FROM grams GROUP BY ngram
        ORDER BY n DESC, ngram LIMIT 10""").fetch_arrow_table()
    assert out["ngram"].to_pylist() == want["ngram"].to_pylist()
    assert out["n"].to_pylist() == want["n"].to_pylist()


def test_curation_v3_matches_five_stage_cte_with_nulls():
    from raycdc.pipelines.curation import curate_documents_v3

    docs = _docs()
    out = to_table(curate_documents_v3(
        ray.data.from_arrow(docs),
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.5, needles=NEEDLES,
        max_top_word_frac=0.5, chunk_size=8, num_partitions=4))
    want = _con(docs).execute(r"""
        WITH mix AS (
          SELECT doc_id, text FROM documents
          WHERE (doc_id * 2654435761) % 4294967296 <
            CASE source
              WHEN 'src0' THEN 4294967296
              WHEN 'src1' THEN 2147483648
              WHEN 'src2' THEN 1073741824
              ELSE 2147483648
            END),
        clean AS (
          SELECT doc_id, text FROM mix
          WHERE COALESCE(NOT (contains(text, 'batch batch batch')
                              OR contains(text, 'window dup')
                              OR contains(text, 'slow query')), TRUE)),
        toks0 AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
          FROM clean),
        cnt AS (SELECT doc_id, w, count(*) AS c
                FROM toks0 GROUP BY doc_id, w),
        top AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS f
                FROM cnt GROUP BY doc_id),
        keepdocs AS (
          SELECT c.doc_id, c.text FROM clean c
          JOIN top USING (doc_id) WHERE top.f <= 0.5),
        tk AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS t,
                 len(regexp_extract_all(text, '\S+')) AS n
          FROM keepdocs),
        idx AS (
          SELECT doc_id, t, n,
                 unnest(generate_series(0,
                     CAST(ceil(greatest(n - 8, 0)::DOUBLE / 8)
                          AS BIGINT))) AS i
          FROM tk WHERE n > 0),
        chunks AS (
          SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                 array_to_string(t[i*8+1 : i*8+8], ' ') AS chunk_text,
                 CAST(least(i*8+8, n) - i*8 AS BIGINT) AS n_chunk_tokens
          FROM idx),
        dedup AS (
          SELECT *, row_number() OVER (
              PARTITION BY chunk_text
              ORDER BY doc_id * 1000000 + chunk_id) AS rn
          FROM chunks)
        SELECT doc_id, chunk_id, chunk_text, n_chunk_tokens
        FROM dedup WHERE rn = 1""").fetch_arrow_table()

    def canon(t: pa.Table):
        rows = list(zip(t["doc_id"].to_pylist(), t["chunk_id"].to_pylist(),
                        t["chunk_text"].to_pylist(),
                        t["n_chunk_tokens"].to_pylist()))
        return sorted(rows)

    assert out.num_rows == want.num_rows
    assert canon(out) == canon(want)


def test_curation_v3_default_needles_runs():
    """ADVICE r3: the documented default invocation (needles=None) crashed
    in decontaminate('needs at least one needle'); it must now skip the
    stage."""
    from raycdc.pipelines.curation import curate_documents_v3

    docs = _docs()
    out = to_table(curate_documents_v3(
        ray.data.from_arrow(docs), chunk_size=8, num_partitions=4,
        rates={"src0": 1.0}, default_rate=1.0, max_top_word_frac=1.0))
    assert out.num_rows > 0
    assert set(out.column_names) == {"doc_id", "chunk_id", "chunk_text",
                                     "n_chunk_tokens"}
