"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. Vectorized per batch; regex/table state compiled
once per actor (callable classes → actor pools)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TOKEN_RE = r"\S+"
# BPE-ish word/number/punct splitter (GPT-2-style coarse classes).
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def degraded_empty(t: pa.Table, *cols: str) -> bool:
    """True for Ray Data's zero-column EMPTY block degrade (CLAUDE.md
    invariant: a typed empty block can lose its schema at high parallelism).
    Kernels must pass such blocks through as ``t.slice(0, 0)`` instead of
    raising KeyError on a missing input column."""
    return t.num_rows == 0 and any(c not in t.column_names for c in cols)

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por", "como"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て", "と", "です"],
}


def add_token_count(ds: ray.data.Dataset, text_col: str = "text",
                    out_col: str = "n_tokens") -> ray.data.Dataset:
    """Whitespace token count (oracle-checkable: regexp \\S+ matches)."""
    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col):
            return t.slice(0, 0)
        n = pc.cast(pc.count_substring_regex(t[text_col], TOKEN_RE), pa.int64())
        return t.append_column(out_col, n)
    return ds.map_batches(fn, batch_format="pyarrow")


def add_bpe_token_count(ds: ray.data.Dataset, text_col: str = "text",
                        out_col: str = "n_bpe_tokens") -> ray.data.Dataset:
    """Count of BPE-ish coarse tokens (letters / digits / punct runs)."""
    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col):
            return t.slice(0, 0)
        n = pc.cast(pc.count_substring_regex(t[text_col], BPE_RE), pa.int64())
        return t.append_column(out_col, n)
    return ds.map_batches(fn, batch_format="pyarrow")


class QualityScorer:
    """Quality features per document: char/token counts, punctuation ratio,
    stopword ratio, mean token length, and a composite [0, 1] score.

    Regexes are engine-compiled pyarrow kernels; the per-actor state is the
    stopword alternation pattern built once in ``__init__``.
    """

    def __init__(self, text_col: str = "text", stopwords=None):
        import re as _re

        self.text_col = text_col
        words = sorted(stopwords or LANG_MARKERS["en"])
        # escape user-supplied words: a stopword like "c++" would otherwise
        # be an invalid RE2 pattern (crash) or silently mis-count
        self.stop_re = (r"(?i)\b(?:"
                        + "|".join(_re.escape(w) for w in words) + r")\b")

    def __call__(self, t: pa.Table) -> pa.Table:
        if degraded_empty(t, self.text_col):
            return t.slice(0, 0)
        text = t[self.text_col]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
        n_punct = pc.cast(
            pc.count_substring_regex(text, r"[^\w\s]"), pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(text, self.stop_re), pa.int64())
        safe_tok = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
        safe_chr = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
        punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()),
                                pc.cast(safe_chr, pa.float64()))
        stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()),
                               pc.cast(safe_tok, pa.float64()))
        mean_tok_len = pc.divide(pc.cast(n_chars, pa.float64()),
                                 pc.cast(safe_tok, pa.float64()))
        # Composite heuristic: long-enough docs with moderate punctuation and
        # non-trivial stopword presence score high.
        len_term = pc.min_element_wise(
            pc.divide(pc.cast(n_tokens, pa.float64()), pa.scalar(100.0)),
            pa.scalar(1.0))
        punct_term = pc.subtract(pa.scalar(1.0),
                                 pc.min_element_wise(
                                     pc.multiply(punct_ratio, pa.scalar(4.0)),
                                     pa.scalar(1.0)))
        stop_term = pc.min_element_wise(
            pc.multiply(stop_ratio, pa.scalar(3.0)), pa.scalar(1.0))
        score = pc.multiply(pc.multiply(len_term, punct_term),
                            pc.add(pc.multiply(stop_term, pa.scalar(0.5)),
                                   pa.scalar(0.5)))
        for name, col in [("n_chars", n_chars), ("n_tokens", n_tokens),
                          ("punct_ratio", punct_ratio),
                          ("stop_ratio", stop_ratio),
                          ("mean_tok_len", mean_tok_len),
                          ("quality", score)]:
            t = t.append_column(name, col)
        return t


def add_quality(ds: ray.data.Dataset, text_col: str = "text",
                concurrency=None) -> ray.data.Dataset:
    """concurrency=None → stateless tasks (instance reused per task); pass an
    int/tuple for an actor pool when per-actor state is worth amortizing."""
    if concurrency:
        return ds.map_batches(QualityScorer, fn_constructor_args=(text_col,),
                              batch_format="pyarrow", concurrency=concurrency)
    return ds.map_batches(QualityScorer(text_col), batch_format="pyarrow")


class LangId:
    """Stopword-marker language ID: per language, count marker-word hits with
    one vectorized regex pass; argmax wins. State (the patterns) built once
    per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # pyarrow regexes are RE2: no lookaround. \b works for ASCII scripts;
        # CJK marker chars are non-word chars in RE2 so they match bare.
        self.patterns = {}
        for lang, words in LANG_MARKERS.items():
            alt = "|".join(words)
            if lang == "ja":
                self.patterns[lang] = "(?:" + alt + ")"
            else:
                self.patterns[lang] = r"(?i)\b(?:" + alt + r")\b"

    def __call__(self, t: pa.Table) -> pa.Table:
        if degraded_empty(t, self.text_col):
            return t.slice(0, 0)
        text = t[self.text_col]
        n = t.num_rows
        langs = list(self.patterns)
        scores = np.zeros((n, len(langs)), dtype=np.float64)
        for j, lang in enumerate(langs):
            hits = pc.count_substring_regex(text, self.patterns[lang])
            scores[:, j] = pc.fill_null(hits, 0).to_numpy(zero_copy_only=False)
        n_tokens = pc.fill_null(
            pc.count_substring_regex(text, TOKEN_RE), 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        denom = np.maximum(n_tokens, 1.0)
        best = scores.argmax(axis=1)
        conf = scores[np.arange(n), best] / denom
        pred = np.where(scores.max(axis=1) > 0,
                        np.array(langs, dtype=object)[best], "und")
        t = t.append_column("lang_pred", pa.array(pred, pa.string()))
        return t.append_column("lang_conf", pa.array(conf, pa.float64()))


def add_lang_id(ds: ray.data.Dataset, text_col: str = "text",
                concurrency=None) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(LangId, fn_constructor_args=(text_col,),
                              batch_format="pyarrow", concurrency=concurrency)
    return ds.map_batches(LangId(text_col), batch_format="pyarrow")


class Fingerprinter:
    """Rolling-hash (Rabin–Karp) document fingerprints.

    Emits a 63-bit polynomial hash of the whole text plus the minimum k-gram
    rolling hash (a 1-permutation MinHash — stable under small shifts). Per
    batch the k-gram hashing is vectorized over each doc's byte array.
    """

    BASE = np.uint64(1000003)
    # BASE is odd, hence invertible mod 2^64 — the inverse lets the batched
    # kernel turn every doc's full polynomial hash into two lookups in one
    # global prefix sum (see __call__).
    IBASE = np.uint64(pow(1000003, -1, 1 << 64))

    @staticmethod
    def _powers(n: int) -> np.ndarray:
        """[BASE^0, BASE^1, ..., BASE^(n-1)] in natural mod-2^64."""
        p = np.empty(n, dtype=np.uint64)
        p[0] = 1
        if n > 1:
            p[1:] = np.multiply.accumulate(
                np.full(n - 1, Fingerprinter.BASE, dtype=np.uint64))
        return p

    @staticmethod
    def _base_pow(exp: np.ndarray) -> np.ndarray:
        """BASE**exp (mod 2^64) elementwise, binary exponentiation — O(log
        max_exp) vector passes instead of a length-N power table."""
        out = np.ones(len(exp), dtype=np.uint64)
        b = Fingerprinter.BASE
        e = exp.astype(np.uint64).copy()
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
            while e.any():
                odd = (e & np.uint64(1)).astype(bool)
                out[odd] *= b
                b = b * b
                e >>= np.uint64(1)
        return out

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k
        self.kpowers = self._powers(k)

    def _doc_fp(self, data: np.ndarray) -> tuple[int, int]:
        """Polynomial hashes in natural mod-2^64 (uint64 wraparound),
        fully vectorized: no Python-per-byte work."""
        if len(data) == 0:
            return 0, 0
        vals = data.astype(np.uint64)
        n = len(vals)
        powers = self._powers(n)
        full = np.uint64((vals * powers[::-1]).sum(dtype=np.uint64))
        if n < self.k:
            return int(full.view(np.int64)), int(full.view(np.int64))
        # all k-gram hashes at once: sliding windows × descending powers
        idx = np.arange(n - self.k + 1)[:, None] + np.arange(self.k)[None, :]
        kh = (vals[idx] * self.kpowers[::-1][None, :]).sum(
            axis=1, dtype=np.uint64)
        return int(full.view(np.int64)), int(kh.min().view(np.int64))

    def __call__(self, t: pa.Table) -> pa.Table:
        """Batched kernel (the MinHasher concatenated-buffer + ``reduceat``
        pattern, dedup.py:181-225): one byte buffer for the whole batch.
        Full hashes come from a single global prefix sum — with
        ``S = cumsum(byte[i] * IBASE^i)``, a doc spanning ``[a, b)`` has
        ``full = BASE^(b-1) * (S[b-1] - S[a-1])`` exactly (mod 2^64,
        IBASE = BASE^-1) — and k-gram minima from k strided adds plus one
        ``np.minimum.reduceat``. Values are bit-identical to the per-doc
        kernel (kept above as the semantic spec for len<k docs)."""
        if degraded_empty(t, self.text_col):
            return t.slice(0, 0)
        texts = t[self.text_col].to_pylist()
        n = len(texts)
        fulls = np.zeros(n, dtype=np.uint64)
        mins = np.zeros(n, dtype=np.uint64)
        enc = [(s or "").encode("utf-8") for s in texts]
        lens = np.array([len(b) for b in enc], dtype=np.int64)
        nz = np.flatnonzero(lens > 0)
        if len(nz):
            data = np.frombuffer(b"".join(enc[i] for i in nz),
                                 dtype=np.uint8).astype(np.uint64)
            dl = lens[nz]
            offs = np.concatenate([[0], np.cumsum(dl)])
            total_bytes = int(offs[-1])
            ipow = np.empty(total_bytes, dtype=np.uint64)
            ipow[0] = 1
            if total_bytes > 1:
                ipow[1:] = np.multiply.accumulate(
                    np.full(total_bytes - 1, self.IBASE, dtype=np.uint64))
            prefix = np.cumsum(data * ipow, dtype=np.uint64)
            starts, ends = offs[:-1], offs[1:] - 1
            seg = prefix[ends] - np.where(starts > 0, prefix[starts - 1],
                                          np.uint64(0))
            fulls[nz] = self._base_pow(ends) * seg
            long_rel = np.flatnonzero(dl >= self.k)
            if len(long_rel):
                n_win = dl[long_rel] - self.k + 1
                wstarts = np.concatenate([[0], np.cumsum(n_win)])
                total = int(n_win.sum())
                glob = (np.arange(total, dtype=np.int64)
                        - np.repeat(wstarts[:-1], n_win)
                        + np.repeat(starts[long_rel], n_win))
                kh = np.zeros(total, dtype=np.uint64)
                rk = self.kpowers[::-1]
                for j in range(self.k):
                    kh += data[glob + j] * rk[j]
                mins[nz[long_rel]] = np.minimum.reduceat(kh, wstarts[:-1])
            short_rel = np.flatnonzero(dl < self.k)
            mins[nz[short_rel]] = fulls[nz[short_rel]]
        t = t.append_column("fp_full", pa.array(fulls.view(np.int64)))
        return t.append_column("fp_min_kgram", pa.array(mins.view(np.int64)))


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text", k: int = 8,
                    concurrency=None, batch_size: int = 4096) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(Fingerprinter, fn_constructor_args=(text_col, k),
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency)
    return ds.map_batches(Fingerprinter(text_col, k),
                          batch_format="pyarrow", batch_size=batch_size)


def add_md5_fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                        out_col: str = "fp_md5") -> ray.data.Dataset:
    """Hex-MD5 content fingerprint (cross-engine checkable: DuckDB ``md5()``
    produces the identical digest). Complements the rolling-hash
    fingerprints, whose polynomial scheme no SQL engine reproduces.
    Null text stays null (SQL ``md5(NULL) IS NULL``)."""
    import hashlib

    def fn(t: pa.Table) -> pa.Table:
        vals = [None if s is None
                else hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in t[text_col].to_pylist()]
        return t.append_column(out_col, pa.array(vals, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text(ds: ray.data.Dataset, text_col: str = "text",
                   out_col: str = "text_norm") -> ray.data.Dataset:
    """Canonical text normalization for dedup/training prep: lowercase,
    collapse every whitespace run to one space, strip the ends. Pure
    pyarrow kernels (RE2), no Python per row; DuckDB reproduces it with
    lower + regexp_replace + trim."""

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col):
            return t.slice(0, 0)
        s = pc.utf8_lower(t[text_col])
        s = pc.replace_substring_regex(s, r"\s+", " ")
        # trim SPACES only (after the collapse, RE2-\s edges are single
        # spaces): Arrow's unicode-aware trim_whitespace would also strip
        # characters like \x0b that SQL trim() (and RE2 \s) leave alone,
        # diverging from the oracle
        s = pc.utf8_trim(s, " ")
        return t.append_column(out_col, s)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_host(ds: ray.data.Dataset, url_col: str = "url",
                 out_col: str = "host") -> ray.data.Dataset:
    """Registrable-host extraction from Common-Crawl-style URLs (scheme
    optional, port/path stripped, lowercased) — one RE2 pass per batch."""

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, url_col):
            return t.slice(0, 0)
        ex = pc.extract_regex(
            t[url_col], r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]*@)?"
                        r"(?P<host>[^/:?#]+)")
        host = pc.utf8_lower(pc.struct_field(ex, "host"))
        return t.append_column(out_col, host)

    return ds.map_batches(fn, batch_format="pyarrow")


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\[\] .-]{6,}[0-9]"


def redact_pii(ds: ray.data.Dataset, text_col: str = "text",
               out_col: str = "text_redacted") -> ray.data.Dataset:
    """PII scrubbing for training-corpus prep: replace email addresses with
    ``<EMAIL>`` and phone-number-shaped digit runs with ``<PHONE>``. Two RE2
    passes per batch (``pc.replace_substring_regex``), fully vectorized.

    Emails are redacted first so a phone-shaped digit run inside a local
    part can't split an address. Both patterns are plain RE2 also accepted
    verbatim by DuckDB's regexp_replace (RE2 as well), which keeps the op
    oracle-checkable end to end.
    """

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col):
            return t.slice(0, 0)
        s = pc.replace_substring_regex(t[text_col], PII_EMAIL_RE, "<EMAIL>")
        s = pc.replace_substring_regex(s, PII_PHONE_RE, "<PHONE>")
        return t.append_column(out_col, s)

    return ds.map_batches(fn, batch_format="pyarrow")


def decontaminate(ds: ray.data.Dataset, needles: "list[str]",
                  text_col: str = "text",
                  flag_col: str | None = None) -> ray.data.Dataset:
    """Benchmark decontamination: drop documents whose text contains ANY of
    ``needles`` (eval-set strings, canary phrases) as a plain substring.
    The needle set is tiny closure-broadcast state; the scan is one
    vectorized pass per batch — per-needle ``pc.match_substring`` for a
    handful of needles, a single compiled RE2 alternation (linear-time
    multi-pattern scan) when the set is large. No shuffle; streams at
    read speed over any corpus size.

    ``flag_col``: instead of filtering, append a bool "contaminated"
    column (audit mode). Null text is never contaminated (SQL contains
    semantics: NULL → not kept by a NOT(...) filter — callers wanting
    SQL-null-drop pre-filter; here null text rows are KEPT when
    filtering, matching `contains(NULL) IS NULL → NOT NULL → NULL → the
    engine keeps them like COALESCE(NOT ..., TRUE)`)."""
    if not needles:
        raise ValueError("decontaminate needs at least one needle")
    needles = list(needles)

    def mark(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col):
            return t.slice(0, 0)
        text = t[text_col]
        if len(needles) <= 8:
            hit = None
            for s in needles:
                m = pc.match_substring(text, s)
                hit = m if hit is None else pc.or_kleene(hit, m)
        else:
            import re as _re

            alt = "|".join(_re.escape(s) for s in needles)
            hit = pc.match_substring_regex(text, alt)
        hit = pc.fill_null(hit, False)  # null text: not contaminated
        if flag_col is not None:
            return t.append_column(flag_col, hit)
        return t.filter(pc.invert(hit))

    return ds.map_batches(mark, batch_format="pyarrow")


def repetition_stats(ds: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     keep_cols: "list[str] | None" = None
                     ) -> ray.data.Dataset:
    """Gopher-style repetition signals per document (quality filtering for
    training corpora): duplicate-line fraction and most-frequent-word
    fraction. One stateless map_batches; per batch everything runs through
    Arrow C++ kernels — split to list columns, ``pa.Table.group_by`` with
    ``count_distinct`` / grouped max — so the counts are EXACT (no hashing
    shortcut that a collision could corrupt), and a SQL engine reproduces
    them verbatim.

    Output columns (appended to ``id_col``):

    - ``n_lines``: ``len(string_split(text, '\\n'))`` (empty lines count,
      empty text is one empty line — the SQL split semantics)
    - ``n_distinct_lines``; ``dup_line_frac`` = 1 - distinct/total (exact
      ratio of two small ints, engine-independent)
    - ``n_words``: \\S+ token count; ``top_word_frac`` = occurrences of the
      most frequent token / n_words (null when the doc has no tokens, like
      SQL's join-miss)

    ``keep_cols``: extra input columns carried through unchanged (e.g. the
    text itself, so a downstream filter can chain without a re-join).
    """

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col, id_col):
            return t.slice(0, 0)
        n = t.num_rows
        text = t[text_col].combine_chunks() if isinstance(
            t[text_col], pa.ChunkedArray) else t[text_col]
        idx = pa.array(np.arange(n, dtype=np.int64))

        lines = pc.split_pattern(text, "\n")
        n_lines = pc.cast(pc.list_value_length(lines), pa.int64())
        flat_lines = pc.list_flatten(lines)
        line_doc = pc.list_parent_indices(lines)
        per_doc = (pa.table({"__d": line_doc, "__l": flat_lines})
                   .group_by("__d")
                   .aggregate([("__l", "count_distinct")]))
        distinct = np.zeros(n, dtype=np.int64)
        distinct[per_doc["__d"].to_numpy(zero_copy_only=False)] = (
            per_doc["__l_count_distinct"].to_numpy(zero_copy_only=False))
        n_distinct = pa.array(distinct)
        # null text -> null lines list -> keep the stats null
        n_distinct = pc.if_else(pc.is_valid(n_lines), n_distinct, None)
        dup_frac = pc.divide(
            pc.cast(pc.subtract(n_lines, n_distinct), pa.float64()),
            pc.cast(pc.max_element_wise(
                n_lines, pa.scalar(1, pa.int64())), pa.float64()))

        norm = pc.utf8_trim(
            pc.replace_substring_regex(text, r"\s+", " "), " ")
        toks = pc.split_pattern(norm, " ")
        # empty doc: split('') -> [''] — a phantom token; blank it to the
        # SQL regexp_extract_all('') == [] semantics
        n_words_raw = pc.cast(pc.list_value_length(toks), pa.int64())
        empty = pc.equal(pc.fill_null(norm, ""), "")
        n_words = pc.if_else(
            empty, pc.if_else(pc.is_valid(n_words_raw),
                              pa.scalar(0, pa.int64()), None), n_words_raw)
        # empty docs contribute one phantom '' token to the grouped counts;
        # mask it out so top_word_frac stays null for them
        flat_toks = pc.list_flatten(toks)
        tok_doc = pc.list_parent_indices(toks)
        real = pc.invert(pa.array(empty.to_numpy(zero_copy_only=False)[
            tok_doc.to_numpy(zero_copy_only=False)])) \
            if len(tok_doc) else pa.array([], pa.bool_())
        counts = (pa.table({"__d": tok_doc, "__w": flat_toks})
                  .filter(real)
                  .group_by(["__d", "__w"])
                  .aggregate([("__w", "count")]))
        top = (counts.group_by("__d")
               .aggregate([("__w_count", "max"), ("__w_count", "sum")]))
        maxc = np.zeros(n, dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        d_idx = top["__d"].to_numpy(zero_copy_only=False)
        maxc[d_idx] = top["__w_count_max"].to_numpy(zero_copy_only=False)
        total[d_idx] = top["__w_count_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            twf = maxc.astype(np.float64) / total.astype(np.float64)
        top_word_frac = pa.array(twf, pa.float64(),
                                 mask=(total == 0))
        top_word_frac = pc.if_else(pc.is_valid(n_words), top_word_frac, None)

        cols = {id_col: t[id_col]}
        for c in keep_cols or []:
            cols[c] = t[c]
        cols.update({
            "n_lines": n_lines,
            "n_distinct_lines": n_distinct,
            "dup_line_frac": dup_frac,
            "n_words": n_words,
            "top_word_frac": top_word_frac,
        })
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(ds: ray.data.Dataset, *, size: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id",
                    chunk_col: str = "chunk_text") -> ray.data.Dataset:
    """Split each document into overlapping fixed-size TOKEN windows — the
    training-data chunking primitive (context-window packing, RAG corpus
    prep). Tokens are \\S+ runs; chunk ``i`` covers tokens
    ``[i*stride, i*stride + size)`` with ``stride = size - overlap``; the
    last chunk is the first one reaching the end (short, never empty);
    token-less docs emit no chunks. Chunk text rejoins tokens with single
    spaces (the normalized-token contract shared with
    :func:`tokenize_explode`, and SQL ``array_to_string(t[a:b], ' ')``).

    Fully vectorized per batch: one split, one numpy window-index build,
    ONE ``take`` gathering every chunk's tokens, one ``binary_join`` —
    overlap duplicates only token REFERENCES until the join, not document
    bytes. Stateless map_batches ⇒ streams at any scale.
    """
    if size <= 0 or not (0 <= overlap < size):
        raise ValueError(f"need size > 0 and 0 <= overlap < size, "
                         f"got size={size} overlap={overlap}")
    stride = size - overlap

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col, id_col):
            return t.slice(0, 0)
        text = t[text_col].combine_chunks() if isinstance(
            t[text_col], pa.ChunkedArray) else t[text_col]
        norm = pc.utf8_trim(
            pc.replace_substring_regex(text, r"\s+", " "), " ")
        toks = pc.split_pattern(norm, " ")
        # raw lengths index the flattened values buffer (the phantom ''
        # token of an empty doc IS in there); n_tok is the logical token
        # count with phantoms zeroed
        raw_n = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pc.equal(pc.fill_null(norm, ""), "").to_numpy(
            zero_copy_only=False)
        n_tok = raw_n.copy()
        n_tok[empty] = 0  # split('') == [''] phantom

        # chunks per doc: 1 + ceil(max(n-size, 0) / stride), 0 for n == 0
        n_chunks = np.where(
            n_tok > 0, 1 + -(-np.maximum(n_tok - size, 0) // stride), 0)
        total_chunks = int(n_chunks.sum())
        out_schema = pa.schema([
            t.schema.field(id_col),
            pa.field("chunk_id", pa.int64()),
            pa.field(chunk_col, pa.string()),
            pa.field("n_chunk_tokens", pa.int64())])
        if total_chunks == 0:
            return out_schema.empty_table()

        doc_of_chunk = np.repeat(np.arange(len(n_tok)), n_chunks)
        chunk_starts_excl = np.repeat(
            np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks)
        chunk_id = np.arange(total_chunks) - chunk_starts_excl
        tok_start = chunk_id * stride
        tok_end = np.minimum(tok_start + size, n_tok[doc_of_chunk])
        chunk_len = tok_end - tok_start

        # global token indices of every chunk element, one gather
        flat_offsets = np.zeros(len(raw_n) + 1, dtype=np.int64)
        np.cumsum(raw_n, out=flat_offsets[1:])
        elem_chunk = np.repeat(np.arange(total_chunks), chunk_len)
        elem_pos = (np.arange(chunk_len.sum())
                    - np.repeat(np.concatenate(
                        [[0], np.cumsum(chunk_len)[:-1]]), chunk_len))
        gidx = (flat_offsets[doc_of_chunk] + tok_start)[elem_chunk] + elem_pos
        flat = pc.list_flatten(toks)
        gathered = flat.take(pa.array(gidx))
        # int64 offsets (LargeListArray): int32 offsets wrap silently past
        # 2^31 flattened chunk tokens in one batch — corrupt windows, not
        # an error (ADVICE r3)
        offs = np.concatenate([[0], np.cumsum(chunk_len)]).astype(np.int64)
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), gathered)
        chunk_text = pc.binary_join(chunk_lists, " ")

        return pa.table({
            id_col: t[id_col].take(pa.array(doc_of_chunk)),
            "chunk_id": pa.array(chunk_id.astype(np.int64)),
            chunk_col: chunk_text,
            "n_chunk_tokens": pa.array(chunk_len.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_explode(ds: ray.data.Dataset, *, n: int = 2,
                  text_col: str = "text", id_col: str | None = None,
                  out_col: str = "ngram") -> ray.data.Dataset:
    """One row per word n-gram (\\S+ tokens joined by single spaces) — the
    corpus-statistics primitive behind top-k n-grams, contamination scans
    and LM count tables. Vectorized per batch: one split, one window-index
    build over the flattened token buffer (n-grams never cross document
    boundaries), ONE take, one ``binary_join``. Pair with
    ``agg.grouped_aggregate`` (partial pre-agg bounds the exchange at
    distinct-ngrams-per-batch) + ``agg.top_k`` for exact global top-k.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, *([text_col, id_col] if id_col else [text_col])):
            return t.slice(0, 0)
        grams, n_grams, doc_of = _ngram_windows(t[text_col], n)
        fields = ([t.schema.field(id_col)] if id_col else []) + [
            pa.field(out_col, pa.string())]
        if grams is None:
            return pa.schema(fields).empty_table()
        cols = {}
        if id_col:
            cols[id_col] = t[id_col].take(pa.array(doc_of))
        cols[out_col] = grams
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _ws_tokens(text):
    """Shared whitespace-normalize-and-split prelude: returns
    ``(norm, toks, raw_n, empty)`` where ``raw_n`` are the RAW list
    lengths indexing the flattened values buffer (an empty doc's
    ``split('')`` phantom ``''`` IS in there — the token-window offsets
    contract) and ``empty`` marks token-less docs. One copy of the
    offsets-sensitive idiom instead of one per kernel."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.utf8_trim(
        pc.replace_substring_regex(text, r"\s+", " "), " ")
    toks = pc.split_pattern(norm, " ")
    raw_n = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    empty = pc.equal(pc.fill_null(norm, ""), "").to_numpy(
        zero_copy_only=False)
    return norm, toks, raw_n, empty


def _ngram_windows(text, n: int):
    """Shared vectorized n-gram window kernel: returns ``(grams, n_grams,
    doc_of)`` — the gram strings (None when the batch has none), the
    per-doc gram counts (int64, 0 for null/token-less docs), and each
    gram's source-doc index. One split, one window-index build over the
    flattened token buffer (grams never cross documents), ONE take, one
    ``binary_join``."""
    _, toks, raw_n, empty = _ws_tokens(text)
    n_tok = raw_n.copy()
    n_tok[empty] = 0  # split('') == [''] phantom
    n_grams = np.maximum(n_tok - (n - 1), 0)
    total = int(n_grams.sum())
    if total == 0:
        return None, n_grams, np.zeros(0, dtype=np.int64)
    flat_offsets = np.zeros(len(raw_n) + 1, dtype=np.int64)
    np.cumsum(raw_n, out=flat_offsets[1:])
    doc_of = np.repeat(np.arange(len(n_tok)), n_grams)
    starts_excl = np.repeat(
        np.concatenate([[0], np.cumsum(n_grams)[:-1]]), n_grams)
    pos_in_doc = np.arange(total) - starts_excl
    start = flat_offsets[doc_of] + pos_in_doc
    # gram g = tokens[start : start+n]: one gather of total*n refs
    gidx = (start[:, None] + np.arange(n)[None, :]).reshape(-1)
    flat = pc.list_flatten(toks)
    gathered = flat.take(pa.array(gidx))
    # int64 offsets — same overflow guard as chunk_documents
    offs = pa.array(np.arange(0, (total + 1) * n, n, dtype=np.int64),
                    pa.int64())
    grams = pc.binary_join(
        pa.LargeListArray.from_arrays(offs, gathered), " ")
    return grams, n_grams, doc_of


def tokenize_explode(ds: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     token_col: str = "token") -> ray.data.Dataset:
    """Tokenize to rows: one output row per whitespace token (SQL
    ``unnest(regexp_extract_all(text, '\\S+'))``). Vectorized: collapse
    whitespace runs + trim (so a single-space split yields exactly the
    \\S+ tokens, with no edge empties), drop empty docs, split to a list
    column, then the engine's zero-copy list explode."""
    from raycdc.record_flatten import explode_list_table

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col, id_col):
            return t.slice(0, 0)
        s = pc.utf8_trim(
            pc.replace_substring_regex(t[text_col], r"\s+", " "), " ")
        norm = pa.table({id_col: t[id_col], "__norm": s})
        norm = norm.filter(pc.fill_null(pc.not_equal(s, ""), False))
        toks = pc.split_pattern(norm["__norm"], " ")
        narrow = pa.table({id_col: norm[id_col], token_col: toks})
        return explode_list_table(narrow, token_col)

    return ds.map_batches(fn, batch_format="pyarrow")


class _RareTokenProbe:
    """Per-batch membership filter against a broadcast rare-token set:
    documents carrying any rare token — or no tokens at all — are dropped.
    The rare set is fetched from the object store once per actor; each
    batch pays one flattened ``pc.is_in`` plus a per-doc ``reduceat``."""

    def __init__(self, rare_ref, text_col: str):
        self._rare = ray.get(rare_ref)
        self._text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        # Ray Data can degrade typed EMPTY blocks to zero-column blocks at
        # high parallelism (CLAUDE.md invariant) — pass them through.
        if t.num_rows == 0 or self._text_col not in t.column_names:
            return t.slice(0, 0)
        s = pc.utf8_trim(
            pc.replace_substring_regex(t[self._text_col], r"\s+", " "), " ")
        nonempty = pc.fill_null(pc.not_equal(s, ""), False)
        t = t.filter(nonempty)
        if t.num_rows == 0:
            return t
        toks = pc.split_pattern(pc.filter(s, nonempty), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = pa.concat_arrays(toks.chunks) if toks.num_chunks else (
                pa.array([], pa.list_(pa.string())))
        flat = toks.flatten()
        # Every surviving doc has >= 1 token (whitespace runs collapsed,
        # blanks trimmed), so segment starts are strictly increasing and
        # reduceat is well defined.
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        bad = pc.is_in(flat, value_set=self._rare).to_numpy(
            zero_copy_only=False)
        doc_bad = np.add.reduceat(bad, starts) > 0
        return t.filter(pa.array(~doc_bad))


def min_token_freq_filter(
    ds: "ray.data.Dataset",
    *,
    min_freq: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    broadcast_budget_bytes: int = 256 << 20,
) -> "ray.data.Dataset":
    """Corpus-relative gibberish filter: keep only documents whose EVERY
    whitespace token occurs at least ``min_freq`` times in the whole
    corpus. Random strings, encoding garbage and hash-like junk carry
    corpus-unique tokens, so a small threshold removes them while leaving
    natural text (whose vocabulary repeats) untouched — the
    distribution-relative cousin of the absolute quality heuristics.

    Exact integer semantics end to end (oracle-safe: no float
    accumulation). Scale shape (round-5 redesign — exchange volume is
    O(docs), never O(token occurrences)): token frequencies are partially
    pre-aggregated per batch and combined through ONE partition-only
    exchange over DISTINCT tokens (vocabulary-sized); then only the RARE
    side — tokens with ``freq < min_freq``, which Zipf keeps
    vocabulary-sized even though hapaxes dominate the distinct count — is
    collected and broadcast via ``ray.put``. Each corpus batch drops docs
    containing any rare token with an in-task flattened ``pc.is_in``
    probe, so no token-level row ever crosses an exchange and the corpus
    is filtered in place (no final semi join at all). Token-less
    documents (null / all-whitespace text) are dropped, matching the SQL
    ``GROUP BY ... HAVING`` shape.

    If the rare set exceeds ``broadcast_budget_bytes``, the exact
    fallback routes only PROBABLY-rare tokens through the keyed machinery
    (``bloom_semi_join`` of the token stream against the rare set —
    bitmap misses bypass the exchange), reduces to offending doc ids, and
    finishes with auto-strategy id joins.
    """
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import bloom_semi_join, hash_join

    tok = tokenize_explode(ds, text_col=text_col, id_col=id_col)
    freq = grouped_aggregate(
        tok.map_batches(lambda t: t.select(["token"]),
                        batch_format="pyarrow"),
        ["token"], count_name="__rcdc_tf", num_partitions=num_partitions)

    def rare_only(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.less(t["__rcdc_tf"], min_freq), False)
        return pa.table({"token": t["token"].filter(m)})

    rare = freq.map_batches(rare_only, batch_format="pyarrow").materialize()

    if rare.size_bytes() <= broadcast_budget_bytes:
        chunks: list[pa.Array] = []
        for b in rare.iter_batches(batch_size=None, batch_format="pyarrow"):
            chunks.extend(b.column("token").chunks)
        rare_arr = (pa.concat_arrays(chunks) if chunks
                    else pa.array([], pa.string()))
        ref = ray.put(rare_arr)
        from raycdc.shuffle import stateless_stage

        # plain tasks: the probe's init is one plasma fetch of the rare
        # set (cheap-init rule — see shuffle.stateless_stage)
        return ds.map_batches(stateless_stage(_RareTokenProbe, ref, text_col),
                              batch_format="pyarrow")

    # Fallback: rare set too large to broadcast. Bloom-gated semi join of
    # the token stream against the rare set (only bitmap-positive tokens
    # pay the exchange), then id-level set algebra.
    bad_ids = grouped_aggregate(
        bloom_semi_join(tok, rare, on=["token"],
                        num_partitions=num_partitions).map_batches(
            lambda t: t.select([id_col]), batch_format="pyarrow"),
        [id_col], count_name="__rcdc_nb",
        exchange="partition", num_partitions=num_partitions).map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow")
    tokened = grouped_aggregate(
        tok.map_batches(lambda t: t.select([id_col]),
                        batch_format="pyarrow"),
        [id_col], count_name="__rcdc_nt",
        exchange="partition", num_partitions=num_partitions).map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow")
    keep = hash_join(tokened, bad_ids, on=[id_col], join_type="left_anti",
                     num_partitions=num_partitions, strategy="auto")
    return hash_join(ds, keep, on=[id_col], join_type="left_semi",
                     num_partitions=num_partitions, strategy="auto")


class _NgramScoreProbe:
    """Per-batch scorer against a broadcast (ngram -> corpus count) table:
    one plasma fetch per worker, one ``pc.index_in`` + one weighted
    ``np.bincount`` per batch — no per-row Python, no exchange."""

    def __init__(self, ref, text_col, id_col, id_type, n,
                 sum_col, count_col, score_col):
        self._vocab, self._counts = ray.get(ref)
        self._text_col, self._id_col = text_col, id_col
        self._n = n
        # stage OUTPUT schema, id type from the dataset schema — echoing
        # the input schema (doc_id, text) from an empty/degraded block
        # would make this stage emit two different schemas (CLAUDE.md
        # concat-failure class)
        self._out_schema = pa.schema([
            pa.field(id_col, id_type),
            pa.field(sum_col, pa.int64()),
            pa.field(count_col, pa.int64()),
            pa.field(score_col, pa.float64())])
        self._sum_col, self._count_col = sum_col, count_col
        self._score_col = score_col

    def __call__(self, t: pa.Table) -> pa.Table:
        out_schema = self._out_schema
        if t.num_rows == 0 or self._text_col not in t.column_names:
            return out_schema.empty_table()
        ndocs = t.num_rows
        grams, n_grams, doc_of = _ngram_windows(t[self._text_col], self._n)
        sums = np.zeros(ndocs, dtype=np.float64)
        if grams is not None:
            pos = pc.fill_null(
                pc.index_in(grams, value_set=self._vocab), -1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            occ = np.where(pos >= 0,
                           self._counts[np.maximum(pos, 0)], 0)
            sums = np.bincount(doc_of, weights=occ,
                               minlength=ndocs).astype(np.float64)
        no_grams = n_grams == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            score = sums / n_grams.astype(np.float64)
        return pa.table({
            self._id_col: t[self._id_col],
            self._sum_col: pa.array(sums.astype(np.int64), pa.int64(),
                                    mask=no_grams),
            self._count_col: pa.array(n_grams, pa.int64()),
            self._score_col: pa.array(score, pa.float64(), mask=no_grams),
        }).cast(out_schema)


def ngram_lm_score(
    ds: "ray.data.Dataset",
    *,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    broadcast_budget_bytes: int = 256 << 20,
    sum_col: str = "sum_freq",
    count_col: str = "n_ngrams",
    score_col: str = "lm_score",
) -> "ray.data.Dataset":
    """Corpus-relative n-gram fluency score — the count-based stand-in for
    the ccnet/KenLM perplexity gate: per document, the SUM and MEAN of the
    corpus-wide frequency of its word n-grams. Boilerplate and fluent
    prose repeat n-grams the corpus has seen (high mean); gibberish,
    mashed-together scrapes and wrong-language text sit on corpus-unique
    n-grams (mean ~1). Downstream: quantile-bucket the score and drop the
    low tail (compose with :func:`~raycdc.pipelines.curation
    .filter_above_global_quantile`).

    Exact integer counts end to end (oracle: bigram CTE + self-join +
    grouped SUM/COUNT). Scale shape mirrors :func:`min_token_freq_filter`:
    gram counts are partially pre-aggregated into ONE vocabulary-sized
    exchange; the count table is then broadcast once via ``ray.put`` and
    every corpus batch scores itself in-task (``index_in`` + weighted
    bincount) — no token-level row ever crosses an exchange. Above the
    broadcast budget the exact fallback joins the gram stream to the count
    table (shuffle) and reduces per doc. Docs with no n-grams (null text,
    < n tokens) emit ``sum/score`` NULL and ``n_ngrams`` 0 — the SQL LEFT
    JOIN shape.
    """
    from raycdc.agg import grouped_aggregate
    from raycdc.joins import _pa_schema, hash_join

    id_field = _pa_schema(ds).field(id_col)
    grams = ngram_explode(ds, n=n, text_col=text_col, id_col=id_col)

    def gram_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "ngram" not in t.column_names:
            return pa.schema([pa.field("ngram",
                                       pa.string())]).empty_table()
        return t.select(["ngram"])

    freq = grouped_aggregate(
        grams.map_batches(gram_only, batch_format="pyarrow"),
        ["ngram"], count_name="__rcdc_nf",
        num_partitions=num_partitions).materialize()

    if freq.size_bytes() <= broadcast_budget_bytes:
        vocab_chunks: list = []
        counts_parts: list = []
        for b in freq.iter_batches(batch_size=None, batch_format="pyarrow"):
            vocab_chunks.extend(b.column("ngram").chunks)
            counts_parts.append(b.column("__rcdc_nf").to_numpy(
                zero_copy_only=False).astype(np.int64))
        vocab = (pa.concat_arrays(vocab_chunks) if vocab_chunks
                 else pa.array([], pa.string()))
        counts = (np.concatenate(counts_parts) if counts_parts
                  else np.zeros(0, dtype=np.int64))
        ref = ray.put((vocab, counts))
        from raycdc.shuffle import stateless_stage

        # plain tasks: init is one plasma fetch (cheap-init rule)
        return ds.map_batches(
            stateless_stage(_NgramScoreProbe, ref, text_col, id_col,
                            id_field.type, n, sum_col, count_col,
                            score_col),
            batch_format="pyarrow")

    # Fallback: count table too large to broadcast — join the gram stream
    # to it (gram-keyed exchange), reduce per doc, left-join docs back in.
    scored = hash_join(grams, freq, on=["ngram"], join_type="inner",
                       num_partitions=num_partitions, strategy="shuffle")

    def doc_freq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and id_col not in t.column_names:
            return pa.schema([id_field, pa.field(
                "__rcdc_nf", pa.int64())]).empty_table()
        return t.select([id_col, "__rcdc_nf"])

    per_doc = grouped_aggregate(
        scored.map_batches(doc_freq, batch_format="pyarrow"),
        [id_col], sums={sum_col: "__rcdc_nf"}, count_name=count_col,
        exchange="partition", num_partitions=num_partitions)

    def id_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and id_col not in t.column_names:
            return pa.schema([id_field]).empty_table()
        return t.select([id_col])

    ids = ds.map_batches(id_only, batch_format="pyarrow")
    out = hash_join(ids, per_doc, on=[id_col], join_type="left_outer",
                    num_partitions=num_partitions, strategy="auto")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and id_col not in t.column_names:
            return pa.schema([
                id_field, pa.field(sum_col, pa.int64()),
                pa.field(count_col, pa.int64()),
                pa.field(score_col, pa.float64())]).empty_table()
        s = pc.cast(t[sum_col], pa.int64())
        c = pc.fill_null(pc.cast(t[count_col], pa.int64()), 0)
        score = pc.divide(pc.cast(s, pa.float64()),
                          pc.cast(c, pa.float64()))
        score = pc.if_else(pc.greater(c, 0), score,
                           pa.scalar(None, pa.float64()))
        return pa.table({id_col: t[id_col], sum_col: s, count_col: c,
                         score_col: score})

    return out.map_batches(finish, batch_format="pyarrow")


def _tf_pairs(t: pa.Table, text_col: str):
    """Per-batch exact term frequencies as an Arrow table with columns
    ``__d`` (doc index), ``token``, ``token_count`` — sound because a
    document is ONE input row, so its tokens never span batches. One
    split + one Arrow hash-aggregate."""
    _, toks, raw_n, empty = _ws_tokens(t[text_col])
    doc_of = np.repeat(np.arange(t.num_rows), raw_n)
    flat = pc.list_flatten(toks)
    keep = ~empty[doc_of] if len(doc_of) else np.zeros(0, dtype=bool)
    pairs = (pa.table({"__d": pa.array(doc_of[keep]),
                       "token": flat.filter(pa.array(keep))})
             .group_by(["__d", "token"])
             .aggregate([("token", "count")]))
    return pairs  # columns: __d, token, token_count


class _TfidfProbe:
    """Per-batch TF-IDF keyword extractor against a broadcast document-
    frequency table: one plasma fetch per worker; per batch one tf
    hash-aggregate, one ``index_in`` lookup, one 3-key Arrow sort and a
    vectorized per-doc head(k) — no exchange, no per-row Python."""

    def __init__(self, ref, text_col, id_col, id_type, k, n_docs,
                 score_col):
        self._vocab, self._df = ray.get(ref)
        self._text_col, self._id_col = text_col, id_col
        self._k, self._n, self._score_col = k, float(n_docs), score_col
        # id type passed from the dataset schema: a zero-column degraded
        # empty block carries no type, and guessing int64 would make this
        # stage emit two schemas (Arrow DataType is hashable, so it rides
        # the stateless_stage cache key)
        self._out_schema = pa.schema([
            pa.field(id_col, id_type),
            pa.field("token", pa.string()),
            pa.field("tf", pa.int64()),
            pa.field(score_col, pa.float64())])

    def __call__(self, t: pa.Table) -> pa.Table:
        out_schema = self._out_schema
        if t.num_rows == 0 or self._text_col not in t.column_names:
            return out_schema.empty_table()
        pairs = _tf_pairs(t, self._text_col)
        if pairs.num_rows == 0:
            return out_schema.empty_table()
        pos = pc.fill_null(
            pc.index_in(pairs["token"], value_set=self._vocab), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        tf = pairs["token_count"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        # every token IS in the corpus vocabulary by construction; guard
        # anyway (df 0 rows dropped) so a stale table cannot divide by zero
        df = np.where(pos >= 0, self._df[np.maximum(pos, 0)], 0)
        ok = df > 0
        score = (tf[ok].astype(np.float64) * self._n) / df[ok]
        scored = pa.table({
            "__d": pairs["__d"].filter(pa.array(ok)),
            "token": pairs["token"].filter(pa.array(ok)),
            "tf": pa.array(tf[ok]),
            self._score_col: pa.array(score, pa.float64())})
        order = pc.sort_indices(scored, sort_keys=[
            ("__d", "ascending"), (self._score_col, "descending"),
            ("token", "ascending")])
        s = scored.take(order)
        d = s["__d"].to_numpy(zero_copy_only=False)
        new = np.empty(len(d), dtype=bool)
        new[:1] = True
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(d)))
        rn = np.arange(len(d)) - np.repeat(starts, counts)
        s = s.filter(pa.array(rn < self._k))
        return pa.table({
            self._id_col: t[self._id_col].take(s["__d"]),
            "token": s["token"],
            "tf": s["tf"],
            self._score_col: s[self._score_col]}).cast(out_schema)


def tfidf_keywords(
    ds: "ray.data.Dataset",
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    broadcast_budget_bytes: int = 256 << 20,
    score_col: str = "tfidf",
) -> "ray.data.Dataset":
    """Top-``k`` TF-IDF keywords per document — the classic corpus-relative
    keyword/topic signal (tag extraction, dedup explanations, mixture
    diagnostics). Scores use the RATIONAL idf ``tf * N / df`` instead of
    ``tf * ln(N/df)``: the ranking is identical (ln is monotone) and the
    score stays an exact ratio of integers, so a SQL engine reproduces it
    bit-for-bit (no libm drift). Ties break by token, so the extracted set
    is fully deterministic.

    Scale shape: term frequencies are EXACT per batch (a document is one
    input row — its tokens never span batches), document frequencies are
    partially pre-aggregated into ONE vocabulary-sized exchange, then the
    df table is broadcast once via ``ray.put`` and every batch extracts
    its own keywords in-task (index_in + one 3-key Arrow sort) — no
    token-level exchange. Above the broadcast budget the exact fallback
    joins tf pairs to the df table and finishes with
    ``agg.grouped_top_n``. Docs with no tokens emit no rows (SQL inner-
    join shape).
    """
    from raycdc.agg import grouped_aggregate, grouped_top_n
    from raycdc.joins import _pa_schema, hash_join

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    id_field = _pa_schema(ds).field(id_col)

    def distinct_tokens(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.schema([pa.field("token", pa.string())]).empty_table()
        return pa.table({"token": _tf_pairs(t, text_col)["token"]})

    df_tbl = grouped_aggregate(
        ds.map_batches(distinct_tokens, batch_format="pyarrow"),
        ["token"], count_name="__rcdc_df",
        num_partitions=num_partitions).materialize()
    n_docs = ds.count()

    if df_tbl.size_bytes() <= broadcast_budget_bytes:
        vocab_chunks: list = []
        df_parts: list = []
        for b in df_tbl.iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            vocab_chunks.extend(b.column("token").chunks)
            df_parts.append(b.column("__rcdc_df").to_numpy(
                zero_copy_only=False).astype(np.int64))
        vocab = (pa.concat_arrays(vocab_chunks) if vocab_chunks
                 else pa.array([], pa.string()))
        dfs = (np.concatenate(df_parts) if df_parts
               else np.zeros(0, dtype=np.int64))
        ref = ray.put((vocab, dfs))
        from raycdc.shuffle import stateless_stage

        return ds.map_batches(
            stateless_stage(_TfidfProbe, ref, text_col, id_col,
                            id_field.type, k, n_docs, score_col),
            batch_format="pyarrow")

    # Fallback: df table too large to broadcast — token-keyed join of the
    # tf pairs, then the distributed grouped top-k.
    def tf_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.schema([
                id_field,
                pa.field("token", pa.string()),
                pa.field("tf", pa.int64())]).empty_table()
        pairs = _tf_pairs(t, text_col)
        return pa.table({
            id_col: t[id_col].take(pairs["__d"]),
            "token": pairs["token"],
            "tf": pc.cast(pairs["token_count"], pa.int64())})

    joined = hash_join(ds.map_batches(tf_rows, batch_format="pyarrow"),
                       df_tbl, on=["token"], join_type="inner",
                       num_partitions=num_partitions, strategy="shuffle")

    def score_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "tf" not in t.column_names:
            return pa.schema([
                id_field, pa.field("token", pa.string()),
                pa.field("tf", pa.int64()),
                pa.field(score_col, pa.float64())]).empty_table()
        score = pc.divide(
            pc.multiply(pc.cast(t["tf"], pa.float64()),
                        pa.scalar(float(n_docs))),
            pc.cast(t["__rcdc_df"], pa.float64()))
        return pa.table({id_col: t[id_col], "token": t["token"],
                         "tf": pc.cast(t["tf"], pa.int64()),
                         score_col: score})

    return grouped_top_n(
        joined.map_batches(score_fn, batch_format="pyarrow"),
        [id_col], score_col, n=k, descending=True, tiebreak="token",
        num_partitions=num_partitions)


# Canonicalization patterns — module-level so the oracle SQL builds from the
# SAME strings (the redact_pii precedent: RE2 on both sides, zero drift).
URL_AUTHORITY_RE = r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<auth>[^/?#]*)(?P<rest>.*)$"
URL_HTTP_PORT_RE = r"^(http://[^/:?#]*):80([/?#]|$)"
URL_HTTPS_PORT_RE = r"^(https://[^/:?#]*):443([/?#]|$)"
URL_BARE_SLASH_RE = r"^(https?://[^/?#]*)/$"


def canonicalize_url(ds: ray.data.Dataset, url_col: str = "url",
                     out_col: str = "url_canon") -> ray.data.Dataset:
    """URL canonicalization for web-corpus dedup keys (the normalization
    every Common-Crawl pipeline runs before url-level dedup / host rollups):

    1. strip the fragment (``#...`` never reaches the server),
    2. lowercase the scheme and authority (case-insensitive per RFC 3986;
       the PATH keeps its case — it is case-sensitive),
    3. drop default ports (``http://h:80`` → ``http://h``, https ``:443``),
    4. drop a BARE trailing slash (path exactly ``/``; deeper paths keep
       theirs — ``/a/`` vs ``/a`` can be different resources).

    Scheme-less strings pass through steps 1/3/4 untouched by 2 (no
    authority to lowercase); null urls stay null. All four steps are plain
    RE2 (no lookahead — RE2 has none), so DuckDB's ``regexp_replace``/
    ``regexp_extract`` reproduce them verbatim: the op is oracle-checkable
    end to end. Stateless per-batch kernel — no shuffle, streams at read
    speed over any corpus size.
    """

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, url_col):
            return t.slice(0, 0)
        u = t[url_col]
        s1 = pc.replace_substring_regex(u, r"#.*$", "")
        ex = pc.extract_regex(s1, URL_AUTHORITY_RE)
        low = pc.binary_join_element_wise(
            pc.utf8_lower(pc.struct_field(ex, "scheme")), "://", "")
        low = pc.binary_join_element_wise(
            low, pc.utf8_lower(pc.struct_field(ex, "auth")), "")
        low = pc.binary_join_element_wise(low, pc.struct_field(ex, "rest"), "")
        s2 = pc.if_else(pc.is_valid(ex), low, s1)
        s3 = pc.replace_substring_regex(s2, URL_HTTP_PORT_RE, r"\1\2")
        s3 = pc.replace_substring_regex(s3, URL_HTTPS_PORT_RE, r"\1\2")
        s4 = pc.replace_substring_regex(s3, URL_BARE_SLASH_RE, r"\1")
        return t.append_column(out_col, s4)

    return ds.map_batches(fn, batch_format="pyarrow")


# Line-filter rules — shared with the oracle SQL (RE2 both sides).
LINE_PUNCT_RE = r"[.!?]\s*$"

# Gopher quality-rule constants (Rae et al. 2021 "Scaling Language Models",
# Table A1) — shared with the oracle SQL (RE2 both sides; DuckDB regexp_*
# is RE2 too, verified: count/length/\b semantics identical).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLET_LINE_RE = r"^[-*]"
ELLIPSIS_LINE_RE = r"\.\.\.\s*$"
ALPHA_WORD_RE = r"[A-Za-z]"


def gopher_quality_stats(ds: ray.data.Dataset, text_col: str = "text",
                         id_col: str = "doc_id",
                         keep_cols: "list[str] | None" = None,
                         stopwords=GOPHER_STOPWORDS) -> ray.data.Dataset:
    """Gopher-rule quality signals per document (Rae et al. 2021, A1) — the
    standard web-corpus document filter battery, complementing
    :func:`repetition_stats` (dup-line / top-word fractions live there):

    - ``n_words``: \\S+ token count over whitespace-normalized text
    - ``mean_word_len``: total token chars / n_words (null when no tokens)
    - ``alpha_word_frac``: fraction of tokens containing ``[A-Za-z]``
    - ``symbol_word_ratio``: (``#`` count + non-overlapping ``...`` count,
      both on the RAW text) / n_words
    - ``bullet_line_frac``: fraction of raw ``\\n``-lines starting ``-``/``*``
    - ``ellipsis_line_frac``: fraction of raw lines ending in ``...``
    - ``stop_hits``: how many DISTINCT ``stopwords`` appear (word-bounded,
      case-insensitive) — Gopher requires >= 2 of its 8

    Exact integer counts and exact ratios of those ints, so a SQL engine
    reproduces every value bit-identically (the repetition_stats contract).
    Null text -> all-null stats; ratios over zero words are null. One
    stateless map_batches — vectorized RE2/Arrow kernels over the flattened
    token/line buffers, no shuffle, streams at any corpus size.
    """
    import re as _re

    stop_pats = [r"(?i)\b" + _re.escape(w) + r"\b" for w in stopwords]

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col, id_col):
            return t.slice(0, 0)
        n = t.num_rows
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        valid = pc.is_valid(text)
        valid_np = valid.to_numpy(zero_copy_only=False)

        # words over whitespace-normalized text (tokenize_explode contract)
        norm, toks, raw_n, empty = _ws_tokens(text)
        n_tok = raw_n.copy()
        n_tok[empty] = 0  # split('') == [''] phantom token
        n_words = pc.if_else(valid, pa.array(n_tok, pa.int64()),
                             pa.scalar(None, pa.int64()))

        # mean word length: token chars = len(norm) - (n_words - 1) since
        # norm joins tokens with single spaces (codepoints, both engines)
        norm_len = pc.fill_null(pc.utf8_length(norm), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_chars = norm_len - np.maximum(n_tok - 1, 0)
        no_words = (n_tok == 0) | ~valid_np
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_wl = tok_chars.astype(np.float64) / n_tok.astype(np.float64)
        mean_word_len = pa.array(mean_wl, pa.float64(), mask=no_words)

        # alpha-word fraction (phantom '' never matches [A-Za-z])
        flat = pc.list_flatten(toks)
        doc_of_tok = np.repeat(np.arange(n), raw_n)
        is_alpha = pc.fill_null(
            pc.match_substring_regex(flat, ALPHA_WORD_RE), False).to_numpy(
            zero_copy_only=False)
        alpha_cnt = np.bincount(doc_of_tok[is_alpha],
                                minlength=n).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha = alpha_cnt.astype(np.float64) / n_tok.astype(np.float64)
        alpha_word_frac = pa.array(alpha, pa.float64(), mask=no_words)

        # symbol ratio on the RAW text ('#' + non-overlapping '...')
        n_hash = pc.fill_null(pc.count_substring(text, "#"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ell = pc.fill_null(pc.count_substring(text, "..."), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sym = (n_hash + n_ell).astype(np.float64) / n_tok.astype(
                np.float64)
        symbol_word_ratio = pa.array(sym, pa.float64(), mask=no_words)

        # line rules on the RAW text (>= 1 line for any non-null text)
        lines = pc.split_pattern(text, "\n")
        ln_raw = pc.fill_null(pc.list_value_length(lines), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat_l = pc.list_flatten(lines)
        doc_of_line = np.repeat(np.arange(n), ln_raw)
        no_lines = (ln_raw == 0) | ~valid_np

        def line_frac(pat: str) -> pa.Array:
            hit = pc.fill_null(
                pc.match_substring_regex(flat_l, pat), False).to_numpy(
                zero_copy_only=False)
            cnt = np.bincount(doc_of_line[hit], minlength=n).astype(np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                frac = cnt.astype(np.float64) / ln_raw.astype(np.float64)
            return pa.array(frac, pa.float64(), mask=no_lines)

        bullet_line_frac = line_frac(BULLET_LINE_RE)
        ellipsis_line_frac = line_frac(ELLIPSIS_LINE_RE)

        # distinct-stopword presence count
        hits = np.zeros(n, dtype=np.int64)
        for pat in stop_pats:
            hits += pc.fill_null(
                pc.match_substring_regex(text, pat), False).to_numpy(
                zero_copy_only=False)
        stop_hits = pc.if_else(valid, pa.array(hits, pa.int64()),
                               pa.scalar(None, pa.int64()))

        cols = {id_col: t[id_col]}
        for c in keep_cols or []:
            cols[c] = t[c]
        cols.update({
            "n_words": n_words,
            "mean_word_len": mean_word_len,
            "alpha_word_frac": alpha_word_frac,
            "symbol_word_ratio": symbol_word_ratio,
            "bullet_line_frac": bullet_line_frac,
            "ellipsis_line_frac": ellipsis_line_frac,
            "stop_hits": stop_hits,
        })
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def gopher_filter(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  min_words: int = 50, max_words: int = 100_000,
                  min_mean_word_len: float = 3.0,
                  max_mean_word_len: float = 10.0,
                  max_symbol_word_ratio: float = 0.1,
                  max_bullet_line_frac: float = 0.9,
                  max_ellipsis_line_frac: float = 0.3,
                  min_alpha_word_frac: float = 0.8,
                  min_stop_hits: int = 2,
                  stopwords=GOPHER_STOPWORDS) -> ray.data.Dataset:
    """Drop documents failing any Gopher rule (defaults are the paper's,
    Rae et al. 2021 A1). Emits the ORIGINAL columns of surviving rows; a
    null-text / zero-word doc fails (SQL ``WHERE`` null -> false). Stateless
    per-batch — the stats never leave the kernel, no shuffle."""
    from raycdc.joins import _pa_schema

    in_schema = _pa_schema(ds)
    in_names = list(in_schema.names)
    stats = gopher_quality_stats(
        ds, text_col, id_col,
        keep_cols=[c for c in in_names if c != id_col],
        stopwords=stopwords)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return in_schema.empty_table()
        conds = [
            pc.greater_equal(t["n_words"], min_words),
            pc.less_equal(t["n_words"], max_words),
            pc.greater_equal(t["mean_word_len"], min_mean_word_len),
            pc.less_equal(t["mean_word_len"], max_mean_word_len),
            pc.less_equal(t["symbol_word_ratio"], max_symbol_word_ratio),
            pc.less_equal(t["bullet_line_frac"], max_bullet_line_frac),
            pc.less_equal(t["ellipsis_line_frac"], max_ellipsis_line_frac),
            pc.greater_equal(t["alpha_word_frac"], min_alpha_word_frac),
            pc.greater_equal(t["stop_hits"], min_stop_hits),
        ]
        mask = conds[0]
        for c in conds[1:]:
            mask = pc.and_kleene(mask, c)
        return t.filter(pc.fill_null(mask, False)).select(in_names)

    return stats.map_batches(keep, batch_format="pyarrow")


def c4_line_filter(ds: ray.data.Dataset, text_col: str = "text",
                   out_col: str = "clean_text",
                   kept_col: str | None = "kept_lines",
                   min_words: int = 3) -> ray.data.Dataset:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation (``.!?``, trailing whitespace
    tolerated) AND carry at least ``min_words`` whitespace tokens; rebuild
    each document from its surviving lines. Boilerplate (nav menus, cookie
    banners, button labels) rarely ends in a period — this is the classic
    first-pass web-text scrub, complementing the document-level ops
    (:func:`~raycdc.ops.dedup.scrub_duplicated_passages` works on token
    windows ACROSS docs; this rule is purely within-doc).

    A doc whose every line fails comes out as ``""`` (callers chain a
    length filter); null text stays null. ``kept_col`` (optional) appends
    the surviving line count. Fully vectorized: one split per batch, one
    regex pass + one token-count pass over the flattened line buffer, one
    ``np.bincount`` for per-doc counts, one ``binary_join`` reassembly —
    no Python-per-row work, no shuffle, streams at any scale. Offsets are
    int64 (``LargeListArray``): int32 would wrap past 2^31 flattened line
    bytes per batch (the chunk_documents invariant).
    """
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")

    def fn(t: pa.Table) -> pa.Table:
        if degraded_empty(t, text_col):
            return t.slice(0, 0)
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lines = pc.split_pattern(text, "\n")
        raw_n = pc.fill_null(pc.list_value_length(lines), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines)
        keep = pc.and_(
            pc.match_substring_regex(flat, LINE_PUNCT_RE),
            pc.greater_equal(pc.count_substring_regex(flat, TOKEN_RE),
                             min_words))
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_of_line = np.repeat(np.arange(len(raw_n)), raw_n)
        kept_per_doc = np.bincount(
            doc_of_line[keep_np], minlength=len(raw_n)).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int64)
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()),
                                          flat.filter(keep)), "\n")
        valid = pc.is_valid(text)
        out = t.append_column(
            out_col, pc.if_else(valid, joined, pa.scalar(None, pa.string())))
        if kept_col is not None:
            out = out.append_column(
                kept_col, pc.if_else(valid, pa.array(kept_per_doc),
                                     pa.scalar(None, pa.int64())))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
