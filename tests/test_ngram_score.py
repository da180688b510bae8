"""Corpus-relative n-gram fluency score (ops/text.ngram_lm_score): exact
count semantics on a hand-checked corpus, broadcast-probe vs join-fallback
parity, and the no-gram edge cases (null text, short docs, empty input)."""

import pyarrow as pa
import pytest
import ray.data

from raycdc.ops.text import ngram_lm_score


def _score(texts, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, pa.string())}))
    df = ngram_lm_score(ds, **kw).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


CORPUS = [
    "a b c",        # grams: 'a b', 'b c'
    "a b a b",      # grams: 'a b', 'b a', 'a b'
    "z",            # 1 token -> no bigram
    None,           # null text -> no bigram
    "",             # empty -> no bigram
]
# global counts: 'a b' -> 3, 'b c' -> 1, 'b a' -> 1


def _check(df):
    assert df["n_ngrams"].tolist() == [2, 3, 0, 0, 0]
    assert df["sum_freq"].fillna(-1).tolist() == [3 + 1, 3 + 1 + 3, -1, -1, -1]
    assert df["lm_score"][0] == 4 / 2 and df["lm_score"][1] == 7 / 3
    assert df["lm_score"].isna().tolist() == [False, False, True, True, True]


def test_broadcast_path_exact_counts():
    _check(_score(CORPUS))


def test_join_fallback_path_matches():
    _check(_score(CORPUS, broadcast_budget_bytes=0, num_partitions=4))


def test_trigram_windows():
    df = _score(["a b c d", "x y"], n=3)
    assert df["n_ngrams"].tolist() == [2, 0]
    # 'a b c' and 'b c d' are unique -> each count 1
    assert df["sum_freq"].fillna(-1).tolist() == [2, -1]


def test_empty_input_passthrough():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert ngram_lm_score(ds).count() == 0
