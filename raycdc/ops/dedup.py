"""Deduplication operators for large text corpora.

- :func:`exact_dedup` — hash-partitioned exact dedup (keep min id per text)
- :func:`minhash_lsh_pairs` — MinHash + LSH banding near-dup candidate pairs
  with Jaccard verification (shingle → minhash → band → bucket groupby)
- :func:`simhash_pairs` — 64-bit SimHash near-dup pairs via band buckets +
  Hamming verification
- :func:`embedding_dup_pairs` — cosine near-dup pairs over an embedding
  column, LSH-bucketed (random hyperplane signs) with exact verification

All shuffle work happens on small derived keys (hashes / band signatures),
never on full text; the per-batch signature computation is numpy-vectorized
and the per-bucket verification is bounded by bucket size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_B = "__rcdc_db"


def _text_hash(texts: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(texts, index=False).to_numpy()


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id", num_partitions: int = 32,
                keep: str = "min") -> ray.data.Dataset:
    """Exact dedup: one surviving row per distinct text (min id wins).

    Shuffle key is the 64-bit text hash, not the text itself; within each
    hash partition a vectorized pandas groupby picks the survivor and guards
    against (astronomically unlikely) hash collisions by grouping on the
    real text.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        h = _text_hash(t[text_col].to_pandas())
        return t.append_column(_B, pa.array((h % num_partitions).astype(np.int64)))

    def dedup_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop(columns=[_B])
        df = df.sort_values(id_col, kind="stable",
                            ascending=(keep == "min"))
        df = df.drop_duplicates(subset=[text_col], keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby(_B)
            .map_groups(dedup_bucket, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Per-batch MinHash signatures over char-shingles (numpy-vectorized).

    State (permutation parameters) is derived once per actor from a fixed
    seed, so signatures are identical across actors, runs and cluster sizes.
    """

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, text_col: str, id_col: str, num_perm: int,
                 shingle_k: int, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, self.MERSENNE, num_perm, dtype=np.uint64)
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.k = num_perm, shingle_k

    def shingle_hashes(self, text: str) -> np.ndarray:
        data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(data) < self.k:
            data = np.pad(data, (0, self.k - len(data)))
        idx = np.arange(len(data) - self.k + 1)[:, None] + np.arange(self.k)[None, :]
        grams = data[idx].astype(np.uint64)
        powers = np.multiply.accumulate(
            np.full(self.k, np.uint64(1099511628211), dtype=np.uint64))
        h = (grams * powers[None, :]).sum(axis=1, dtype=np.uint64)
        return np.unique(h)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text or "")
        # (a*h + b) mod 2^64, min over shingles, per permutation
        vals = (h[None, :] * self.a[:, None] + self.b[:, None])
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, s in enumerate(texts):
            sigs[i] = self.signature(s)
        return pa.table({
            self.id_col: t[self.id_col],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm),
        })


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    concurrency=None,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold.

    signature → split into ``bands`` bands → (band_id, band_hash) bucket
    groupby → pairs within bucket → verify with full-signature estimated
    Jaccard → distinct (id_a < id_b, est_jaccard) rows.
    """
    rows_per_band = num_perm // bands
    if concurrency:
        sigs = ds.map_batches(
            MinHasher,
            fn_constructor_args=(text_col, id_col, num_perm, shingle_k),
            batch_format="pyarrow", concurrency=concurrency)
    else:
        sigs = ds.map_batches(MinHasher(text_col, id_col, num_perm, shingle_k),
                              batch_format="pyarrow")

    def explode_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "band": pa.array([], pa.int32()),
                             "bh": pa.array([], pa.int64()),
                             "sig": pa.array([], t["sig"].type)})
        sig = np.stack([np.asarray(x) for x in t["sig"].to_numpy(zero_copy_only=False)])
        sig = sig.astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_ids, out_band, out_bh, keep_idx = [], [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            bh = pd.util.hash_pandas_object(
                pd.DataFrame(chunk), index=False).to_numpy()
            out_ids.append(ids)
            out_band.append(np.full(n, b, dtype=np.int32))
            out_bh.append(bh.view(np.int64))
            keep_idx.append(np.arange(n))
        idx = pa.array(np.concatenate(keep_idx))
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids)),
            "band": pa.array(np.concatenate(out_band)),
            "bh": pa.array(np.concatenate(out_bh)),
            "sig": t["sig"].take(idx),
        })

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sig = np.stack([np.asarray(x) for x in
                        t["sig"].to_numpy(zero_copy_only=False)])[order]
        # unique ids only (same doc may appear via several bands → same bucket
        # impossible since bucket includes band id, but duplicate input ids
        # are possible)
        ia, ib = np.triu_indices(len(ids), k=1)
        est = (sig[ia] == sig[ib]).mean(axis=1)
        m = est >= threshold
        ia, ib, est = ia[m], ib[m], est[m]
        return pa.table({"id_a": pa.array(ids[ia], pa.int64()),
                         "id_b": pa.array(ids[ib], pa.int64()),
                         "est_jaccard": pa.array(est, pa.float64())})

    cand = exploded.groupby(["band", "bh"]).map_groups(
        pairs_in_bucket, batch_format="pyarrow")

    # Distinct pairs (a pair can surface from several bands).
    def distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return cand.groupby("id_a").map_groups(distinct, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes (numpy-vectorized per batch)."""

    def __init__(self, text_col: str, id_col: str, seed: int = 29):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import re
        texts = t[self.text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        token_re = re.compile(r"\w+")
        for i, s in enumerate(texts):
            toks = token_re.findall((s or "").lower())
            if not toks:
                continue
            h = pd.util.hash_pandas_object(pd.Series(toks), index=False).to_numpy()
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = ((v > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        return pa.table({self.id_col: t[self.id_col],
                         "simhash": pa.array(out.view(np.int64))})


def simhash_pairs(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", *, max_hamming: int = 3,
                  concurrency=None) -> ray.data.Dataset:
    """Near-dup pairs with Hamming distance <= max_hamming between 64-bit
    SimHashes. Banding: 4 x 16-bit chunks — any pair within distance 3 shares
    at least one exact chunk (pigeonhole), so bucket by (chunk_id, chunk)."""
    if concurrency:
        sigs = ds.map_batches(SimHasher, fn_constructor_args=(text_col, id_col),
                              batch_format="pyarrow", concurrency=concurrency)
    else:
        sigs = ds.map_batches(SimHasher(text_col, id_col),
                              batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        parts = []
        for c in range(4):
            chunk = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                id_col: pa.array(ids), "chunk_id": pa.array(np.full(n, c, np.int32)),
                "chunk": pa.array(chunk), "simhash": t["simhash"]}))
        return pa.concat_tables(parts) if parts else t

    def pairs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for s in range(0, 64, 8):
            ham += np.unpackbits(((x >> np.uint64(s)) & np.uint64(0xFF))
                                 .astype(np.uint8)[:, None],
                                 axis=1).sum(axis=1).astype(np.int64)
        m = (ham <= max_hamming) & (ids[ia] != ids[ib])
        return pa.table({"id_a": pa.array(ids[ia][m], pa.int64()),
                         "id_b": pa.array(ids[ib][m], pa.int64()),
                         "hamming": pa.array(ham[m], pa.int64())})

    cand = sigs.map_batches(explode, batch_format="pyarrow") \
               .groupby(["chunk_id", "chunk"]) \
               .map_groups(pairs, batch_format="pyarrow")

    def distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return cand.groupby("id_a").map_groups(distinct, batch_format="pyarrow")


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard similarity (verification helper)."""
    a = {text_a[i:i + k] for i in range(max(1, len(text_a) - k + 1))}
    b = {text_b[i:i + k] for i in range(max(1, len(text_b) - k + 1))}
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds: ray.data.Dataset, vec_col: str = "embedding",
                        id_col: str = "vec_id", *, threshold: float = 0.95,
                        num_planes: int = 8, seed: int = 17) -> ray.data.Dataset:
    """Cosine near-dup pairs: LSH-bucket by random-hyperplane sign bits, then
    exact cosine verification within each bucket (numpy matmul)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in t[vec_col].to_pylist()])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], num_planes))
        signs = (vecs @ planes) > 0
        bucket = np.packbits(signs, axis=1, bitorder="little")[:, 0].astype(np.int64)
        return pa.table({id_col: t[id_col], vec_col: t[vec_col],
                         "bucket": pa.array(bucket)})

    def pairs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in t[vec_col].to_pylist()])[order]
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sim = unit @ unit.T
        ia, ib = np.triu_indices(len(ids), k=1)
        m = sim[ia, ib] >= threshold
        return pa.table({"id_a": pa.array(ids[ia][m], pa.int64()),
                         "id_b": pa.array(ids[ib][m], pa.int64()),
                         "cosine": pa.array(sim[ia, ib][m], pa.float64())})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pyarrow"))
