"""Repetition quality stats and token-window chunking vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from raycdc.ops.text import chunk_documents, repetition_stats


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        s = ds.schema()
        return pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)]).empty_table()
    return pa.concat_tables(tabs, promote_options="default")


TRICKY = pa.table({
    "doc_id": pa.array(range(8), pa.int64()),
    "text": pa.array([
        "a b c\na b c\nx y",       # dup line, mixed tokens
        "",                        # empty: 1 empty line, 0 tokens
        "   ",                     # whitespace-only
        "one",                     # single token
        "w w w w w",               # one word repeated
        "line1\n\nline1\nline2",   # dup + empty lines
        "tok " * 100,              # long repetitive
        "alpha beta\ngamma alpha beta",
    ]),
})


def _rand_docs(n=300, seed=17) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(40)])
    texts = []
    for _ in range(n):
        n_lines = int(rng.integers(0, 6))
        lines = [" ".join(rng.choice(vocab, size=rng.integers(0, 12)))
                 for _ in range(n_lines)]
        texts.append("\n".join(lines))
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts)})


def _rep_sql(con) -> pa.Table:
    return con.execute(r"""
        WITH base AS (
          SELECT doc_id,
                 len(string_split(text, chr(10))) AS n_lines,
                 len(list_distinct(string_split(text, chr(10))))
                     AS n_distinct_lines,
                 len(regexp_extract_all(text, '\S+')) AS n_words
          FROM documents),
        toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
          FROM documents),
        cnt AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
        top AS (SELECT doc_id, max(c) AS maxc, sum(c) AS total
                FROM cnt GROUP BY doc_id)
        SELECT b.doc_id, CAST(b.n_lines AS BIGINT) AS n_lines,
               CAST(b.n_distinct_lines AS BIGINT) AS n_distinct_lines,
               (b.n_lines - b.n_distinct_lines)::DOUBLE
                   / greatest(b.n_lines, 1)::DOUBLE AS dup_line_frac,
               CAST(b.n_words AS BIGINT) AS n_words,
               maxc::DOUBLE / total::DOUBLE AS top_word_frac
        FROM base b LEFT JOIN top USING (doc_id)
        ORDER BY b.doc_id""").arrow()


def _chunk_sql(con, size, stride) -> pa.Table:
    return con.execute(rf"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS t,
                 len(regexp_extract_all(text, '\S+')) AS n FROM documents),
        idx AS (
          SELECT doc_id, t, n,
                 unnest(generate_series(0,
                     CAST(ceil(greatest(n - {size}, 0)::DOUBLE
                               / {stride}) AS BIGINT))) AS i
          FROM toks WHERE n > 0)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               array_to_string(t[i*{stride}+1 : i*{stride}+{size}], ' ')
                   AS chunk_text,
               CAST(least(i*{stride}+{size}, n) - i*{stride} AS BIGINT)
                   AS n_chunk_tokens
        FROM idx ORDER BY doc_id, chunk_id""").arrow()


def _cmp(got: pa.Table, want: pa.Table, keys):
    g = got.to_pandas().sort_values(keys).reset_index(drop=True)
    w = want.to_pandas().sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[w.columns.tolist()], w)


def test_repetition_stats_tricky_docs():
    con = duckdb.connect()
    con.register("documents", TRICKY)
    got = to_table(repetition_stats(
        ray.data.from_arrow(TRICKY).repartition(3)))
    _cmp(got, _rep_sql(con), ["doc_id"])
    con.close()


def test_repetition_stats_random_docs():
    docs = _rand_docs()
    con = duckdb.connect()
    con.register("documents", docs)
    got = to_table(repetition_stats(
        ray.data.from_arrow(docs).repartition(7)))
    _cmp(got, _rep_sql(con), ["doc_id"])
    con.close()


def test_chunk_documents_overlap_matches_sql():
    con = duckdb.connect()
    con.register("documents", TRICKY)
    got = to_table(chunk_documents(
        ray.data.from_arrow(TRICKY).repartition(3), size=4, overlap=1))
    _cmp(got, _chunk_sql(con, 4, 3), ["doc_id", "chunk_id"])
    con.close()


def test_chunk_documents_no_overlap_random():
    docs = _rand_docs(seed=23)
    con = duckdb.connect()
    con.register("documents", docs)
    got = to_table(chunk_documents(
        ray.data.from_arrow(docs).repartition(5), size=7, overlap=0))
    _cmp(got, _chunk_sql(con, 7, 7), ["doc_id", "chunk_id"])
    # lossless when overlap=0: rejoined chunks == normalized doc
    con.close()


def test_chunk_documents_rejects_bad_params():
    import pytest

    ds = ray.data.from_arrow(TRICKY)
    with pytest.raises(ValueError):
        chunk_documents(ds, size=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, size=4, overlap=4)


def test_decontaminate_filter_and_flag_modes():
    from raycdc.ops.text import decontaminate

    docs = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["clean doc", "has CANARY phrase", "also clean",
                          None, "canary lower no match"]),
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    kept = to_table(decontaminate(ds, ["CANARY phrase", "zzz"],
                                  text_col="text"))
    # substring match is case-sensitive; null text kept
    assert sorted(kept["doc_id"].to_pylist()) == [0, 2, 3, 4]

    flagged = to_table(decontaminate(ds, ["CANARY phrase"],
                                     flag_col="contaminated"))
    got = dict(zip(flagged["doc_id"].to_pylist(),
                   flagged["contaminated"].to_pylist()))
    assert got == {0: False, 1: True, 2: False, 3: False, 4: False}


def test_decontaminate_large_needle_set_regex_path():
    from raycdc.ops.text import decontaminate

    # >8 needles takes the alternation path; include regex metachars to
    # prove they're escaped (plain-substring semantics)
    needles = [f"n{i}" for i in range(8)] + ["a.b", "x(y)"]
    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["contains a.b literally", "contains aXb not",
                          "x(y) here", "clean"]),
    })
    kept = to_table(decontaminate(ray.data.from_arrow(docs), needles))
    assert sorted(kept["doc_id"].to_pylist()) == [1, 3]


def test_ngram_explode_matches_sql():
    from raycdc.ops.text import ngram_explode

    con = duckdb.connect()
    con.register("documents", TRICKY)
    got = to_table(ngram_explode(
        ray.data.from_arrow(TRICKY).repartition(3), n=2,
        id_col="doc_id"))
    want = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS t
          FROM documents),
        idx AS (
          SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM toks WHERE len(t) >= 2)
        SELECT doc_id, t[i] || ' ' || t[i+1] AS ngram FROM idx
        ORDER BY doc_id, ngram""").arrow()
    con.close()
    _cmp(got, want, ["doc_id", "ngram"])


def test_ngram_explode_trigram_random():
    from raycdc.ops.text import ngram_explode

    docs = _rand_docs(seed=31)
    con = duckdb.connect()
    con.register("documents", docs)
    got = to_table(ngram_explode(
        ray.data.from_arrow(docs).repartition(5), n=3, id_col="doc_id"))
    want = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS t
          FROM documents),
        idx AS (
          SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
          FROM toks WHERE len(t) >= 3)
        SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
        FROM idx ORDER BY doc_id, ngram""").arrow()
    con.close()
    _cmp(got, want, ["doc_id", "ngram"])
