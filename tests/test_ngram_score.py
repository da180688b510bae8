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


# -- TF-IDF keyword extraction (ops/text.tfidf_keywords) -------------------
from raycdc.ops.text import tfidf_keywords


def _kw(texts, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, pa.string())}))
    df = tfidf_keywords(ds, **kw).to_pandas()
    return df.sort_values(["doc_id", "tfidf", "token"],
                          ascending=[True, False, True]
                          ).reset_index(drop=True)


TFIDF_CORPUS = [
    "apple apple banana",   # tf(apple)=2 df=1 -> 2*4/1=8; banana df=2 -> 2
    "banana cherry",        # cherry df=2 -> 2; banana -> 2
    "cherry date date",     # date tf=2 df=1 -> 8; cherry -> 2
    None,                   # no tokens -> no rows
]


def _check_kw(df):
    d0 = df[df.doc_id == 0]
    assert d0["token"].tolist() == ["apple", "banana"]
    assert d0["tfidf"].tolist() == [2 * 4 / 1, 1 * 4 / 2]
    # ties (banana vs cherry in doc 1, both 2.0) break by token asc
    d1 = df[df.doc_id == 1]
    assert d1["token"].tolist() == ["banana", "cherry"]
    assert 3 not in set(df.doc_id)


def test_tfidf_broadcast_path():
    _check_kw(_kw(TFIDF_CORPUS))


def test_tfidf_fallback_path_matches():
    _check_kw(_kw(TFIDF_CORPUS, broadcast_budget_bytes=0, num_partitions=4))


def test_tfidf_k_caps_per_doc():
    df = _kw(["a b c d e f g"], k=3)
    assert len(df) == 3
    # all scores equal (each token unique) -> first 3 tokens alphabetically
    assert df["token"].tolist() == ["a", "b", "c"]
