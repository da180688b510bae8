"""Deterministic synthetic binlog/WAL of nested change events (FIXTURES.md F7).

One row per change event::

    seq   int64   — global monotonically increasing offset
    epoch int32   — commit epoch (checkpoint/replay boundary)
    op    string  — "I" / "U" / "D"
    page  struct<url: string,
                 fetch: struct<warc_ts: timestamp[us], html: binary>,
                 content: struct<text: string, lang: string>>

Urls follow a Zipf-ish popularity distribution (hot keys exercise skew
handling); ``warc_ts`` is intentionally NOT monotone in ``seq`` (bounded
jitter) so last-writer-wins must order by ``(warc_ts, seq)``, never by arrival.
Deletes carry only ``page.url`` + ``page.fetch.warc_ts`` (content struct is
null). ``text`` is a pure function of ``(url, per-url version)`` so the
byte-identical-text-per-url invariant is checkable. Everything is generated
vectorized (numpy) from a fixed seed — same spec, same bytes, any machine.

Schema-evolution variant: segments with ``epoch >= evolve_from_epoch`` add
``page.content.title`` (column add) — merge must unify schemas without
rewriting history (FIXTURES.md F7b).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["en", "de", "fr", "es", "ja"])

BASE_TS_US = 1_600_000_000_000_000  # 2020-09-13, arbitrary fixed origin


@dataclasses.dataclass(frozen=True)
class ChangelogSpec:
    num_events: int = 100_000
    num_urls: int = 10_000
    num_epochs: int = 10
    seed: int = 42
    zipf_a: float = 1.3          # skew exponent; ~hot head of popular urls
    p_delete: float = 0.02
    ts_jitter_s: int = 3600      # warc_ts jitter: out-of-order window
    text_repeat: int = 4         # text length multiplier
    evolve_from_epoch: Optional[int] = None  # add page.content.title from here
    # Parquet row groups are the unit of read parallelism: a segment written
    # as one giant row group caps the scan at one task per file no matter how
    # many CPUs the cluster has. 64k-row groups let override_num_blocks split
    # each segment across the pool (real binlog writers flush small row
    # groups for exactly this reason).
    row_group_size: int = 65536


def page_struct_type(with_title: bool = False) -> pa.StructType:
    content = [pa.field("text", pa.string()), pa.field("lang", pa.string())]
    if with_title:
        content.append(pa.field("title", pa.string()))
    return pa.struct([
        pa.field("url", pa.string()),
        pa.field("fetch", pa.struct([
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
        ])),
        pa.field("content", pa.struct(content)),
    ])


def event_schema(with_title: bool = False) -> pa.Schema:
    return pa.schema([
        pa.field("seq", pa.int64()),
        pa.field("epoch", pa.int32()),
        pa.field("op", pa.string()),
        pa.field("page", page_struct_type(with_title)),
    ])


def _zipf_url_idx(rng: np.random.Generator, n: int, num_urls: int,
                  a: float) -> np.ndarray:
    # Bounded zipf: draw ranks via inverse-CDF over a truncated power law.
    u = rng.random(n)
    ranks = np.floor(num_urls ** u * (1.0 - u) ** (1.0 / a)).astype(np.int64)
    return np.clip(ranks, 0, num_urls - 1)


def _frame(spec: ChangelogSpec) -> dict[str, np.ndarray]:
    """Numeric skeleton of the whole changelog (cheap: ints only).

    Payload strings are built per epoch slice in :func:`build_segment` so no
    single Arrow string array ever approaches the 2 GiB offset limit.
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.num_events
    seq = np.arange(n, dtype=np.int64)
    epoch = (seq * spec.num_epochs // max(n, 1)).astype(np.int32)
    url_idx = _zipf_url_idx(rng, n, spec.num_urls, spec.zipf_a)
    version = pd.Series(url_idx).groupby(url_idx).cumcount().to_numpy()
    is_delete = rng.random(n) < spec.p_delete
    jitter = rng.integers(-spec.ts_jitter_s, spec.ts_jitter_s + 1, n)
    warc_ts = BASE_TS_US + seq * 1_000_000 + jitter * 1_000_000
    return {"seq": seq, "epoch": epoch, "url_idx": url_idx,
            "version": version, "is_delete": is_delete, "warc_ts": warc_ts}


def build_segment(spec: ChangelogSpec, f: dict[str, np.ndarray],
                  sel: np.ndarray) -> pa.Table:
    """Materialize the Arrow event table for the selected row positions."""
    import pyarrow.compute as pc

    seq = f["seq"][sel]
    epoch = f["epoch"][sel]
    url_idx = f["url_idx"][sel]
    version = f["version"][sel]
    is_delete = f["is_delete"][sel]
    warc_ts = f["warc_ts"][sel]
    n = len(seq)

    op = np.where(is_delete, "D", np.where(version == 0, "I", "U"))
    urls = ("https://site-" + pd.Series(url_idx % 997).astype(str)
            + ".example.com/page/" + pd.Series(url_idx).astype(str)).to_numpy()
    # text = pure function of (url_idx, version): byte-identical invariant.
    frag = pd.Series((url_idx * 1_000_003 + version * 7919) % 2**31).astype(str)
    text = ("content[" + pd.Series(urls) + "|v"
            + pd.Series(version).astype(str) + "|" + frag + "]")
    text = text.str.repeat(spec.text_repeat).to_numpy()
    lang = LANGS[(url_idx * 31 + 7) % len(LANGS)]

    text_arr = pa.array(text, pa.string())
    null_text = pa.nulls(n, pa.string())
    has_content = pa.array(~is_delete)
    content_kids = [
        pc.if_else(has_content, text_arr, null_text),
        pc.if_else(has_content, pa.array(lang, pa.string()), null_text),
    ]
    content_names = ["text", "lang"]
    if spec.evolve_from_epoch is not None:
        title = ("T:" + pd.Series(urls).str.slice(8, 40)).to_numpy()
        evolved = pa.array(epoch >= spec.evolve_from_epoch)
        mask = pc.and_(has_content, evolved)
        content_kids.append(pc.if_else(mask, pa.array(title, pa.string()), null_text))
        content_names.append("title")

    html = pc.if_else(has_content, text_arr.cast(pa.binary()),
                      pa.nulls(n, pa.binary()))
    fetch = pa.StructArray.from_arrays(
        [pa.array(warc_ts, pa.timestamp("us")), _plain(html)],
        ["warc_ts", "html"])
    content = pa.StructArray.from_arrays(
        [_plain(k) for k in content_kids], content_names)
    page = pa.StructArray.from_arrays(
        [pa.array(urls, pa.string()), fetch, content],
        ["url", "fetch", "content"])
    return pa.table({
        "seq": pa.array(seq),
        "epoch": pa.array(epoch),
        "op": pa.array(op, pa.string()),
        "page": page,
    })


def _plain(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
    return arr


def generate_events(spec: ChangelogSpec) -> pa.Table:
    """Generate the full event table in memory (small scales / oracles).

    Byte-identical to the concatenation of the per-epoch segments written by
    :func:`generate_changelog`.
    """
    f = _frame(spec)
    tables = [build_segment(spec, f, np.nonzero(f["epoch"] == e)[0])
              for e in range(spec.num_epochs)]
    return pa.concat_tables(tables)


def generate_changelog(out_dir: str, spec: ChangelogSpec) -> list[str]:
    """Write the changelog as one Parquet segment per epoch; return paths.

    A completed generation is recorded in a ``_COMPLETE`` marker holding the
    spec repr; a later call with the SAME spec returns the cached segments
    (generation is deterministic). A call with a DIFFERENT spec on the same
    out_dir clears the stale cache and regenerates — serving another spec's
    segments would silently break the byte-identical contract.
    """
    import glob as _glob

    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, "_COMPLETE")
    paths = [os.path.join(out_dir, f"events-{e:05d}.parquet")
             for e in range(spec.num_epochs)]
    if os.path.exists(done):
        try:
            with open(done) as f:
                recorded = f.read().strip()
        except OSError:  # pragma: no cover
            recorded = None
        if recorded == f"{spec}":
            return paths
        # stale cache from a different spec (or a generator change): drop
        # the marker first, then every old segment — a fewer-epoch respec
        # must not leave higher-numbered segments for globbing readers
        try:
            os.remove(done)
        except FileNotFoundError:  # pragma: no cover - lost a race
            pass
        for p in _glob.glob(os.path.join(out_dir, "events-*.parquet")):
            try:
                os.remove(p)
            except FileNotFoundError:  # pragma: no cover
                pass
    frame = _frame(spec)
    for e, path in enumerate(paths):
        seg = build_segment(spec, frame, np.nonzero(frame["epoch"] == e)[0])
        if spec.evolve_from_epoch is not None and e < spec.evolve_from_epoch:
            # Pre-evolution segments genuinely lack the added column in their
            # schema (not just null values): real column-add evolution.
            seg = _drop_content_title(seg)
        # pid-unique temp name: two processes generating the same WAL
        # concurrently (e.g. the driver evaluating oracle_sql() while a
        # query's run_cdc_replay generates) must not interleave writes
        # into one shared .tmp and publish a corrupt segment
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(seg, tmp, row_group_size=spec.row_group_size)
        os.replace(tmp, path)
    # atomic marker publish (pid-unique temp, like the segments): a reader
    # must never see a half-written spec line
    tmp = f"{done}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(f"{spec}\n")
    os.replace(tmp, done)
    return paths


def _drop_content_title(seg: pa.Table) -> pa.Table:
    page = seg["page"].combine_chunks()
    url, fetch, content = page.flatten()
    kids = content.flatten()
    content2 = pa.StructArray.from_arrays(kids[:2], ["text", "lang"])
    page2 = pa.StructArray.from_arrays([url, fetch, content2],
                                       ["url", "fetch", "content"])
    return pa.table({"seq": seg["seq"], "epoch": seg["epoch"],
                     "op": seg["op"], "page": page2})
