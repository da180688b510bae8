"""Gopher quality-rule stats/filter (Rae et al. 2021, A1): rule-by-rule
unit coverage plus the Ray edge cases (null text, empty docs, zero-word
docs, zero-column degraded blocks, stopword escaping)."""

import math

import pyarrow as pa
import pytest
import ray.data

from raycdc.ops.text import gopher_filter, gopher_quality_stats


def _stats(texts, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, pa.string())}))
    return (gopher_quality_stats(ds, **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_word_and_length_stats():
    df = _stats(["aa bbbb  cc", "single"])
    assert df["n_words"].tolist() == [3, 1]
    # (2 + 4 + 2) / 3 and 6 / 1
    assert df["mean_word_len"].tolist() == [8 / 3, 6.0]


def test_alpha_word_frac_counts_letter_tokens():
    df = _stats(["abc 123 a1 --- ..."])
    assert df["n_words"][0] == 5
    assert df["alpha_word_frac"][0] == 2 / 5


def test_symbol_ratio_hash_and_nonoverlapping_ellipsis():
    # '....' is ONE non-overlapping '...' (the DuckDB replace() semantics)
    df = _stats(["w #x ## ....", "clean words here"])
    assert df["symbol_word_ratio"][0] == (3 + 1) / 4
    assert df["symbol_word_ratio"][1] == 0.0


def test_line_rule_fractions():
    df = _stats(["- b one\n* b two\nplain...\ntail."])
    assert df["bullet_line_frac"][0] == 2 / 4
    assert df["ellipsis_line_frac"][0] == 1 / 4


def test_stop_hits_distinct_word_bounded_case_insensitive():
    # 'the' twice counts once; 'theme' must not match; case-insensitive
    df = _stats(["The the theme and", "nothing here"])
    assert df["stop_hits"].tolist() == [2, 0]


def test_stopword_escaping_regex_metachars():
    # escaped 'a.b' matches literally, not 'axb' (unescaped '.' would);
    # note the \b contract needs word-char-edged stopwords
    df = _stats(["uses a.b daily", "uses axb daily"], stopwords=("a.b",))
    assert df["stop_hits"].tolist() == [1, 0]


def test_null_empty_and_zero_word_semantics():
    df = _stats([None, "", "   ", "ok."])
    assert df["n_words"].isna().tolist() == [True, False, False, False]
    assert df["n_words"].fillna(-1).tolist() == [-1, 0, 0, 1]
    # null text -> all null; zero words -> ratios null, line fracs defined
    assert df.loc[0].drop("doc_id").isna().all()
    assert math.isnan(df["mean_word_len"][1]) and math.isnan(
        df["symbol_word_ratio"][2])
    assert df["bullet_line_frac"][1] == 0.0
    assert df["stop_hits"][3] == 0


def test_filter_drops_rule_failures_and_nulls():
    texts = [
        "the cat sat of note and that was fine to all with more words",  # ok
        None,                                   # null -> dropped
        "",                                     # zero words -> dropped
        "- a\n- b\n- c",                        # bullets + no stopwords
        "the of #### #### #### squeeze",        # symbol ratio
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, pa.string())}))
    kept = gopher_filter(ds, min_words=3, min_mean_word_len=1.0,
                         min_stop_hits=2).to_pandas()
    assert sorted(kept["doc_id"]) == [0]
    assert list(kept.columns) == ["doc_id", "text"]  # original schema


def test_degraded_empty_block_passthrough():
    from raycdc.ops.text import gopher_quality_stats as g

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert g(ds).count() == 0
