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


def curate_documents_v2(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_frac: float = 0.5,
    min_tokens: int = 5,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Second composition story, exercising the round-2 operator additions
    end to end: deterministic hash sample → normalize → PII redaction →
    token-count filter → exact dedup (min doc_id survives). Every stage is
    individually oracle-proven and the chain stays one lazy streaming
    pipeline (the sample is a stateless filter; redaction is two RE2
    passes; the only exchange is the dedup's partition-only shuffle).
    Returns (doc_id, text_redacted, n_tokens)."""
    from raycdc.agg import hash_sample
    from raycdc.ops.text import add_token_count, redact_pii

    sampled = hash_sample(ds, id_col, sample_frac)
    normed = normalize_text(sampled, text_col=text_col)
    redacted = redact_pii(normed, text_col="text_norm",
                          out_col="text_redacted")
    counted = add_token_count(redacted, text_col="text_redacted")

    def token_filter(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["n_tokens"], min_tokens)
        t = t.filter(pc.fill_null(keep, False))
        return t.select([id_col, "text_redacted", "n_tokens"])

    filtered = counted.map_batches(token_filter, batch_format="pyarrow")
    return exact_dedup(filtered, text_col="text_redacted", id_col=id_col,
                       num_partitions=num_partitions)


def _fetch_thresholds(ds, col: str, qs: list, names: list,
                      m: int) -> list:
    """Phase-1 sketch → driver scalars, the one shared idiom behind every
    distribution-relative operator here: approx_quantile's one-row summary
    fetched with ``batch_size=None`` (the repo's iter_batches rule) and
    unpacked per name."""
    from raycdc.ops.sketch import approx_quantile

    summary = next(iter(
        approx_quantile(ds, col, list(qs), names=list(names), m=m)
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    return [summary[n][0].as_py() for n in names]


def filter_above_global_quantile(
    ds,
    col: str,
    q: float,
    *,
    m: int = 2048,
    keep: str = "ge",
):
    """Two-phase distribution-relative filter: keep rows whose ``col`` is
    above (``keep="ge"``) / below (``keep="le"``) the GLOBAL q-quantile —
    the "drop the bottom half by quality score" curation primitive.

    Phase 1 streams the dataset through the mergeable quantile summary
    (:func:`raycdc.ops.sketch.approx_quantile`); its output is ONE row, so
    reading the threshold onto the driver is O(1), not a materialization.
    Phase 2 broadcasts that scalar in a closure and filters statelessly —
    no shuffle in either phase, two streaming passes total.

    At full fidelity (``m`` ≥ rows per block, no re-compression) the
    threshold is EXACTLY ``percentile_disc(q)`` — the oracle-checked
    configuration; at scale callers drop ``m`` to the compressed sketch
    and accept the documented ~2·n/m rank error on the cut line.
    """
    import pyarrow.compute as pc

    # validate BEFORE phase 1 — the sketch pass streams the whole corpus
    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")
    (thr,) = _fetch_thresholds(ds, col, [q], ["thr"], m)
    cmp = pc.greater_equal if keep == "ge" else pc.less_equal

    def flt(t):
        return t.filter(pc.fill_null(cmp(t[col], thr), False))

    return ds.map_batches(flt, batch_format="pyarrow")


def curate_documents_v3(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    rates: dict | None = None,
    default_rate: float = 0.1,
    needles: list | None = None,
    max_top_word_frac: float = 0.12,
    chunk_size: int = 32,
    num_partitions: int = 32,
):
    """Third composition story — the round-3 operator additions chained
    end to end, training-corpus order: per-source MIXTURE rates →
    benchmark DECONTAMINATION → REPETITION quality filter (most-frequent
    -word cap; token-less docs drop like the SQL join-miss) → fixed-size
    token CHUNKING → exact chunk-level dedup (first (doc_id, chunk_id)
    wins). Everything before the dedup is stateless per-batch streaming;
    the dedup's partition-only exchange is the chain's single shuffle.
    Returns (doc_id, chunk_id, chunk_text, n_chunk_tokens).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from raycdc.agg import mixture_sample
    from raycdc.ops.dedup import exact_dedup
    from raycdc.ops.text import (chunk_documents, decontaminate,
                                 repetition_stats)

    mixed = mixture_sample(ds, source_col, id_col, rates or {},
                           default_rate=default_rate)
    # no needles -> nothing to scrub; decontaminate() itself rejects an
    # empty needle set, so the documented default invocation skips the stage
    clean = decontaminate(mixed, needles, text_col=text_col) \
        if needles else mixed
    stats = repetition_stats(clean, text_col=text_col, id_col=id_col,
                             keep_cols=[text_col])

    def rep_filter(t: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.less_equal(t["top_word_frac"], max_top_word_frac), False)
        return t.filter(keep).select([id_col, text_col])

    kept = stats.map_batches(rep_filter, batch_format="pyarrow")
    chunks = chunk_documents(kept, size=chunk_size, overlap=0,
                             text_col=text_col, id_col=id_col)

    def add_row_id(t: pa.Table) -> pa.Table:
        # composite (doc_id, chunk_id) row id for the deterministic
        # "first wins" dedup: 2^32 slots per doc (a doc would need 4B
        # chunks to collide — the old 10^6 multiplier collided at a ~32M
        # token doc), CHECKED arithmetic so an out-of-range doc_id raises
        # instead of wrapping into another doc's id space
        rid = pc.add_checked(
            pc.multiply_checked(pc.cast(t[id_col], pa.int64()),
                                pa.scalar(1 << 32, pa.int64())),
            pc.cast(t["chunk_id"], pa.int64()))
        return t.append_column("__rid", rid)

    deduped = exact_dedup(
        chunks.map_batches(add_row_id, batch_format="pyarrow"),
        text_col="chunk_text", id_col="__rid",
        num_partitions=num_partitions)
    return deduped.map_batches(
        lambda t: t.select([id_col, "chunk_id", "chunk_text",
                            "n_chunk_tokens"]),
        batch_format="pyarrow")


def curate_documents_v4(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    scrub_window: int = 32,
    min_tokens: int = 10,
    num_partitions: int = 32,
):
    """Fourth composition story — the round-4 dedup wave chained end to
    end: C4-style PASSAGE SCRUB (repeated token windows removed, one
    global occurrence kept, docs reassembled) → minimum-length quality
    filter on the SCRUBBED text (boilerplate removal shrinks docs, so the
    filter must run after it) → EXACT DEDUP of the scrubbed texts (two
    docs that differed only in shared boilerplate collapse here — the
    pair the pre-scrub dedup could never see). Returns (doc_id, text).

    Three partition-only exchanges total (scrub's window hash, scrub's
    doc-id reassembly, dedup's text hash); every other stage is
    stateless per-batch streaming.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from raycdc.ops.dedup import exact_dedup, scrub_duplicated_passages

    scrubbed = scrub_duplicated_passages(
        ds, size=scrub_window, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions)

    def len_filter(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t[text_col], " "))
        return t.filter(pc.fill_null(
            pc.greater_equal(n, min_tokens), False))

    long_enough = scrubbed.map_batches(len_filter, batch_format="pyarrow")
    return exact_dedup(long_enough, text_col=text_col, id_col=id_col,
                       num_partitions=num_partitions)


def curate_documents_v5(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept_lines: int = 2,
    num_partitions: int = 32,
):
    """Fifth composition story — the classic C4 first pass, chained end to
    end: LINE-level cleaning (keep lines ending in terminal punctuation
    with >= ``min_words`` tokens; :func:`raycdc.ops.text.c4_line_filter`)
    → a surviving-line-count quality gate (docs reduced to fewer than
    ``min_kept_lines`` lines are boilerplate shells, dropped) → EXACT
    DEDUP of the CLEANED text (two docs that differed only in dropped
    nav/footer lines collapse here — the pair a pre-clean dedup could
    never see). Returns ``(id_col, text_col)`` with ``text_col`` holding
    the cleaned text.

    ONE partition-only exchange total (the dedup's text hash); the line
    filter and the gate are stateless per-batch streaming.
    """
    from raycdc.ops.text import c4_line_filter, degraded_empty

    cleaned = c4_line_filter(ds, text_col=text_col, out_col="__rcdc_clean",
                             kept_col="__rcdc_kept", min_words=min_words)

    def gate(t: pa.Table) -> pa.Table:
        if degraded_empty(t, "__rcdc_kept", text_col):
            return t.slice(0, 0)
        keep = pc.greater_equal(t["__rcdc_kept"], min_kept_lines)
        t = t.filter(pc.fill_null(keep, False))
        t = t.set_column(t.schema.get_field_index(text_col), text_col,
                         t["__rcdc_clean"])
        return t.drop_columns(["__rcdc_clean", "__rcdc_kept"])

    gated = cleaned.map_batches(gate, batch_format="pyarrow")
    return exact_dedup(gated, text_col=text_col, id_col=id_col,
                       num_partitions=num_partitions)


def quantile_bucket(
    ds,
    col: str,
    qs: list | None = None,
    *,
    label_col: str = "bucket",
    m: int = 2048,
):
    """Assign every row its GLOBAL distribution bucket: ``bucket = i`` for
    the first quantile threshold ``t_i = percentile_disc(qs[i])`` with
    ``value <= t_i``, else ``len(qs)`` — quartile/decile labelling for
    curriculum mixes, stratified reporting, length-balanced sampling.

    Same two-phase shape as :func:`filter_above_global_quantile`: the
    mergeable quantile summary reduces the corpus to ONE threshold row
    (exact percentile_disc at full fidelity ``m``), then a stateless
    vectorized searchsorted labels every batch — no shuffle in either
    phase. Null values get a null bucket (SQL CASE semantics made
    explicit rather than CASE's fall-through-to-ELSE).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    qs = list(qs or (0.25, 0.5, 0.75))
    if sorted(qs) != qs:
        raise ValueError("qs must be ascending")
    names = [f"t{i}" for i in range(len(qs))]
    thresholds = np.array(_fetch_thresholds(ds, col, qs, names, m),
                          dtype=np.float64)

    def label(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        vals = pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)
        # first threshold >= value == the CASE WHEN v <= t_i chain
        idx = np.searchsorted(thresholds, np.where(valid, vals, 0.0),
                              side="left").astype(np.int64)
        buckets = pa.array(idx, pa.int64(), mask=~valid)
        return t.append_column(label_col, buckets)

    return ds.map_batches(label, batch_format="pyarrow")


def cap_per_host(
    ds,
    *,
    max_per_host: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str = "host",
    num_partitions: int = 32,
):
    """Per-domain document cap — the standard web-corpus anti-dominance
    step (a handful of mega-hosts otherwise swamp the mixture): URLs are
    canonicalized (:func:`~raycdc.ops.text.canonicalize_url`), the
    registrable host extracted (:func:`~raycdc.ops.text.extract_host`),
    and every host keeps at most ``max_per_host`` documents chosen by the
    deterministic Knuth-hash order of ``id_col`` — reproducible across
    runs, parallelism levels and engines (the `agg.stratified_sample`
    contract), unlike a seeded random choice.

    Output: the original columns plus ``host_col``. Scale shape: two
    stateless RE2 passes, then stratified_sample's single partition-only
    exchange on hash(host); a host's survivors fit one partition task.
    """
    from raycdc.agg import stratified_sample
    from raycdc.joins import _pa_schema
    from raycdc.ops.text import canonicalize_url, extract_host

    names = list(_pa_schema(ds).names)
    canon = canonicalize_url(ds, url_col=url_col, out_col="__rcdc_canon")
    hosted = extract_host(canon, url_col="__rcdc_canon", out_col=host_col)
    capped = stratified_sample(hosted, host_col, id_col, max_per_host,
                               num_partitions=num_partitions)
    return capped.select_columns(names + [host_col])
