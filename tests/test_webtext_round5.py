"""Round-5 webtext additions: URL canonicalization and the C4-style
line-level filter — rule-by-rule unit coverage plus the Ray edge cases
(null inputs, empty docs, zero-column degraded blocks)."""

import pyarrow as pa
import pytest
import ray.data

from raycdc.ops.text import c4_line_filter, canonicalize_url


def _canon(urls):
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = canonicalize_url(ds).to_pandas()
    return out["url_canon"].where(out["url_canon"].notna(), None).tolist()


def test_canonicalize_url_rules():
    assert _canon([
        "HTTP://Site-1.Example.COM:80/Path/2#frag",  # all rules at once
        "HTTPS://Host.ORG:443/",                     # https port + bare slash
        "https://keep.port:8080/x?q=1#z",            # non-default port kept
        "http://host:80?q=2",                        # port before query
        "http://host:80",                            # port at end of url
        "ftp://Mixed.Case/Path",                     # non-http scheme: no port rule
        "https://a.b/deep/",                         # deep trailing slash KEPT
        "no-scheme/path#f",                          # scheme-less passthrough
    ]) == [
        "http://site-1.example.com/Path/2",
        "https://host.org",
        "https://keep.port:8080/x?q=1",
        "http://host?q=2",
        "http://host",
        "ftp://mixed.case/Path",
        "https://a.b/deep/",
        "no-scheme/path",
    ]


def test_canonicalize_url_null_and_empty():
    assert _canon([None, "", "HTTPS://U:443"]) == [None, "", "https://u"]


def test_canonicalize_url_path_case_preserved():
    # RFC 3986: scheme/host case-insensitive, path case-sensitive
    assert _canon(["HTTP://H.COM/CaseSensitive/PATH"]) == [
        "http://h.com/CaseSensitive/PATH"]


def test_canonicalize_url_degraded_empty_block():
    from raycdc.ops.text import degraded_empty
    t = pa.table({})
    assert degraded_empty(t, "url")
    ds = ray.data.from_arrow(pa.table({"url": pa.array([], pa.string())}))
    assert canonicalize_url(ds).count() == 0


def _c4(texts, **kw):
    import pandas as pd

    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    df = c4_line_filter(ds, **kw).to_pandas()
    clean = df["clean_text"].where(df["clean_text"].notna(), None).tolist()
    # a null kept_lines degrades the pandas column to float64/NaN
    kept = [None if pd.isna(k) else int(k) for k in df["kept_lines"]]
    return clean, kept


def test_c4_line_filter_rules():
    clean, kept = _c4([
        "Good line one here.\nshort\nAnother fine sentence!\n"
        "no punct line at all\nIs this kept?  \n tiny. ",
        "single good line with words.",
        "all\nbad\nlines",
    ])
    # kept: terminal punct AND >= 3 words; "tiny." fails min_words,
    # "Is this kept?  " passes (trailing whitespace tolerated)
    assert clean == [
        "Good line one here.\nAnother fine sentence!\nIs this kept?  ",
        "single good line with words.",
        "",
    ]
    assert kept == [3, 1, 0]


def test_c4_line_filter_null_empty_and_minwords():
    clean, kept = _c4([None, "", "a b.\nc d e."], min_words=2)
    assert clean == [None, "", "a b.\nc d e."]
    assert kept == [None, 0, 2]
    with pytest.raises(ValueError):
        c4_line_filter(ray.data.from_arrow(
            pa.table({"text": pa.array(["x"], pa.string())})), min_words=0)


def test_c4_line_filter_no_kept_col():
    ds = ray.data.from_arrow(pa.table(
        {"text": pa.array(["one two three."], pa.string())}))
    df = c4_line_filter(ds, kept_col=None).to_pandas()
    assert "kept_lines" not in df.columns
    assert df["clean_text"].tolist() == ["one two three."]


# ---- property tests -------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


def _canon_ref(u):
    """Per-row Python reference of the 4 canonicalization rules."""
    import re
    if u is None:
        return None
    s = re.sub(r"#.*$", "", u)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$", s, re.S)
    if m:
        s = m.group(1).lower() + "://" + m.group(2).lower() + m.group(3)
    s = re.sub(r"^(http://[^/:?#]*):80([/?#]|$)", r"\1\2", s)
    s = re.sub(r"^(https://[^/:?#]*):443([/?#]|$)", r"\1\2", s)
    return re.sub(r"^(https?://[^/?#]*)/$", r"\1", s)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.from_regex(r"(HTTPS?|ftp|http)://[A-Za-z0-9.-]{1,12}"
                  r"(:(80|443|8080))?(/[A-Za-z0-9/]{0,8})?(\?q=[0-9])?"
                  r"(#[A-Za-z0-9]{0,4})?", fullmatch=True),
    st.text(alphabet="aB:/#?.-", max_size=16)),
    min_size=1, max_size=40))
def test_canonicalize_url_matches_reference_and_idempotent(urls):
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = canonicalize_url(ds).to_pandas()["url_canon"]
    got = got.where(got.notna(), None).tolist()
    assert got == [_canon_ref(u) for u in urls]
    # canonical form is a fixpoint of the rules
    ds2 = ray.data.from_arrow(pa.table({"url": pa.array(got, pa.string())}))
    again = canonicalize_url(ds2).to_pandas()["url_canon"]
    assert again.where(again.notna(), None).tolist() == got


def _c4_ref(t, min_words):
    """Per-row Python reference of the line rules."""
    import re
    if t is None:
        return None, None
    kept = [l for l in t.split("\n")
            if re.search(r"[.!?]\s*$", l)
            and len(re.findall(r"\S+", l)) >= min_words]
    return "\n".join(kept), len(kept)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.text(alphabet=" \t\nabc.!?xyz", max_size=60)),
    min_size=1, max_size=40),
    st.integers(min_value=1, max_value=3))
def test_c4_line_filter_matches_reference(texts, min_words):
    clean, kept = _c4(texts, min_words=min_words)
    ref = [_c4_ref(t, min_words) for t in texts]
    assert clean == [r[0] for r in ref]
    assert kept == [r[1] for r in ref]


def test_curate_documents_v5_collapse_after_clean():
    from raycdc.pipelines.curation import curate_documents_v5

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "Keep this line here.\nAnd this other line too.\nNAV MENU",
            "Keep this line here.\nAnd this other line too.\nCOOKIE BANNER",
            "Keep this line here.\nonly one good line survives elsewhere",
            "junk\nmore junk",
        ], pa.string()),
    })
    out = curate_documents_v5(ray.data.from_arrow(docs),
                              min_words=3, min_kept_lines=2,
                              num_partitions=4).to_pandas()
    # docs 1 and 2 differ only in dropped boilerplate -> collapse (min id
    # wins); doc 3 keeps 1 line < min_kept_lines gate; doc 4 keeps none
    assert sorted(out.columns) == ["doc_id", "text"]
    assert out["doc_id"].tolist() == [1]
    assert out["text"].tolist() == [
        "Keep this line here.\nAnd this other line too."]
