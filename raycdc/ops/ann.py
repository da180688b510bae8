"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``); each batch computes a numpy matmul and emits
  only its local top-k candidates per query; a final tiny per-query reduce
  keeps the global top-k. Work shuffled = O(num_queries * k * num_batches)
  rows, never the corpus.
- :func:`lsh_topk` — the scale path: random-hyperplane LSH restricts each
  query to its bucket (approximate; same output schema).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _stack(col) -> np.ndarray:
    """(n,) list<float> column → (n, dim) float64 matrix.

    Zero-copy-ish fast path: when the lists are null-free and uniform width
    (the embedding-table invariant) the values buffer is reshaped directly —
    no per-row Python conversion. Ragged/nullable input falls back to the
    row loop."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.FixedSizeListArray) and arr.null_count == 0:
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False).reshape(len(arr), dim)
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)) and arr.null_count == 0:
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all():
            return arr.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.float64, copy=False).reshape(len(arr), int(widths[0]))
    return np.stack([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _local_topk(sim: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k under the GLOBAL ordering (-sim, id asc).

    A plain argpartition on scores can cut score-ties at the k-th place
    arbitrarily, dropping the min-id candidate the final rank (and the SQL
    oracle) keeps. Here candidates strictly above the k-th score are always
    in; ties AT the k-th score are filled by ascending id — so the local
    head provably contains the global top-k rows."""
    n = len(sim)
    k = min(k, n)
    if k == n:
        return np.arange(n)
    head = np.argpartition(-sim, k - 1)[:k]
    thresh = sim[head].min()
    above = np.flatnonzero(sim > thresh)
    tied = np.flatnonzero(sim == thresh)
    need = k - len(above)
    fill = tied[np.argsort(ids[tied], kind="stable")[:need]]
    return np.concatenate([above, fill])


class BatchTopK:
    """Per-batch scorer: cosine against the broadcast query matrix, local
    top-k per query. Query matrix fetched once per actor in ``__init__``."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int,
                 round_to: int | None):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids, qmat = q
        self.qunit = _unit(qmat)
        self.vec_col, self.id_col, self.k = vec_col, id_col, k
        self.round_to = round_to

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        unit = _unit(_stack(t[self.vec_col]))
        sim = self.qunit @ unit.T  # (Q, N)
        if self.round_to is not None:
            sim = np.round(sim, self.round_to)
        out_q, out_id, out_s = [], [], []
        for qi in range(sim.shape[0]):
            cand = _local_topk(sim[qi], ids, self.k)
            out_q.append(np.full(len(cand), self.qids[qi], dtype=np.int64))
            out_id.append(ids[cand])
            out_s.append(sim[qi, cand])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def _final_query_topk(cand: ray.data.Dataset, id_col: str,
                      k: int, num_partitions: int = 16) -> ray.data.Dataset:
    """Per-query global top-k over the per-batch candidates via the
    partition-only exchange (repo invariant: keyed exchanges never ride
    Ray's sort-based groupby). Candidates are ≤ k rows per (query, batch),
    so each bucket is tiny; the kernel is ONE vectorized sort + grouped
    head per bucket, not a per-query loop. Output: (query_id, id, cosine,
    rank) with rank = row_number ordered by (cosine DESC, id ASC)."""
    from raycdc.ops.ordered import _hash_bucket
    from raycdc.shuffle import partition_map

    bcol = "__rcdc_annb"

    def bucket_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = (df.groupby("query_id", sort=False).cumcount()
                      + 1).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    empty = pa.schema([("query_id", pa.int64()), (id_col, pa.int64()),
                       ("cosine", pa.float64()), ("rank", pa.int64())])
    bucketed = cand.map_batches(
        lambda t: _hash_bucket(t, "query_id", bcol, num_partitions),
        batch_format="pyarrow")
    return partition_map(bucketed, bcol, num_partitions, bucket_topk,
                         empty_schema=empty)


def _scorer_stage(ds, cls, args, batch_size, concurrency):
    """Scorer stage: plain tasks by default (cheap init — one plasma fetch
    of the broadcast query state; see shuffle.stateless_stage), an actor
    pool only when the caller asks for one."""
    if concurrency is None:
        from raycdc.shuffle import stateless_stage

        return ds.map_batches(stateless_stage(cls, *args),
                              batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(cls, fn_constructor_args=args,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    round_to: int | None = None,
    concurrency=None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Exact cosine top-k. ``queries`` = (query_ids, query_matrix).

    Output: (query_id, vec_id, cosine, rank) with deterministic tie-break on
    ascending id. ``round_to`` rounds scores before ranking (useful for
    cross-engine comparisons).
    """
    q_ref = ray.put(queries)
    cand = _scorer_stage(ds, BatchTopK,
                         (q_ref, vec_col, id_col, k, round_to),
                         batch_size, concurrency)
    return _final_query_topk(cand, id_col, k)


def _kmeans(sample: np.ndarray, nlist: int, seed: int,
            iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd's k-means on unit vectors (numpy, vectorized)."""
    rng = np.random.default_rng(seed)
    unit = _unit(sample)
    centroids = unit[rng.choice(len(unit), size=min(nlist, len(unit)),
                                replace=False)]
    for _ in range(iters):
        sims = unit @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = unit[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit(centroids)
    return centroids


class IvfScorer:
    """Per-batch IVF probe: assign each corpus vector to its nearest
    centroid; score it only against queries whose probe list contains that
    cell. Centroids + per-query probe lists broadcast once per actor."""

    def __init__(self, state_ref, vec_col: str, id_col: str, k: int,
                 round_to: int | None = None):
        state = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.centroids, self.qids, self.qunit, self.probe = state
        self.vec_col, self.id_col, self.k = vec_col, id_col, k
        self.round_to = round_to

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          self.id_col: pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) == 0:
            return empty
        unit = _unit(_stack(t[self.vec_col]))
        cells = (unit @ self.centroids.T).argmax(axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(self.qids)):
            m = np.isin(cells, self.probe[qi])
            if not m.any():
                continue
            sims = self.qunit[qi] @ unit[m].T
            if self.round_to is not None:
                sims = np.round(sims, self.round_to)
            cand = _local_topk(sims, ids[m], self.k)
            out_q.append(np.full(len(cand), self.qids[qi], dtype=np.int64))
            out_id.append(ids[m][cand])
            out_s.append(sims[cand])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def ivf_topk(
    ds: ray.data.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    train_size: int = 10_000,
    seed: int = 41,
    round_to: int | None = None,
    concurrency=None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """IVF approximate top-k: k-means cells trained on a corpus sample, each
    query probes its ``nprobe`` nearest cells. With ``nprobe == nlist`` the
    result is exactly brute force (every cell probed) — the accuracy knob is
    explicit. Scale path: per-batch work drops by ~nprobe/nlist.
    """
    qids, qmat = queries
    sample = ds.limit(train_size)
    # batch_size=None: consume whole blocks (CLAUDE.md — the default
    # re-slices into 1024-row batches on one driver thread)
    batches = list(sample.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    if not batches or sum(b.num_rows for b in batches) == 0:
        return brute_force_topk(ds, queries, vec_col=vec_col, id_col=id_col,
                                k=k, round_to=round_to,
                                concurrency=concurrency,
                                batch_size=batch_size)
    sample_vecs = _stack(pa.concat_tables(batches)[vec_col])
    centroids = _kmeans(sample_vecs, nlist, seed)
    qunit = _unit(qmat.astype(np.float64))
    qsims = qunit @ centroids.T
    nprobe = min(nprobe, len(centroids))
    probe = np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]
    state_ref = ray.put((centroids, qids.astype(np.int64), qunit, probe))

    cand = _scorer_stage(ds, IvfScorer,
                         (state_ref, vec_col, id_col, k, round_to),
                         batch_size, concurrency)
    return _final_query_topk(cand, id_col, k)


def _bucket_ids(bits: np.ndarray) -> np.ndarray:
    """(n, num_planes) sign bits -> int64 bucket id (multi-byte safe)."""
    packed = np.packbits(bits, axis=1, bitorder="little").astype(np.int64)
    mult = 256 ** np.arange(packed.shape[1], dtype=np.int64)
    return packed @ mult


class LshScorer:
    """Per-batch LSH probe: only corpus vectors sharing a query's
    random-hyperplane bucket are scored. Queries fetched via the object
    store once per actor; planes + query buckets computed once in
    ``__init__`` (never per batch)."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int,
                 num_planes: int, seed: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids, qmat = q
        self.planes = np.random.default_rng(seed).standard_normal(
            (qmat.shape[1], num_planes))
        self.qbuckets = _bucket_ids(qmat @ self.planes > 0)
        self.qunit = _unit(qmat)
        self.vec_col, self.id_col, self.k = vec_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          self.id_col: pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) == 0:
            return empty
        vecs = _stack(t[self.vec_col])
        vbuckets = _bucket_ids(vecs @ self.planes > 0)
        unit = _unit(vecs)
        out_q, out_id, out_s = [], [], []
        for qi, qb in enumerate(self.qbuckets):
            m = vbuckets == qb
            if not m.any():
                continue
            sim = self.qunit[qi] @ unit[m].T
            cand = _local_topk(sim, ids[m], self.k)
            out_q.append(np.full(len(cand), self.qids[qi], dtype=np.int64))
            out_id.append(ids[m][cand])
            out_s.append(sim[cand])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def lsh_topk(
    ds: ray.data.Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_planes: int = 6,
    seed: int = 23,
    concurrency=None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Approximate top-k: only corpus vectors sharing the query's LSH bucket
    are scored (bucket = random-hyperplane sign bits). Scale path trading
    recall for a ~2^num_planes reduction in scored vectors."""
    qids, qmat = queries
    q_ref = ray.put((np.asarray(qids, dtype=np.int64),
                     np.asarray(qmat, dtype=np.float64)))
    cand = _scorer_stage(ds, LshScorer,
                         (q_ref, vec_col, id_col, k, num_planes, seed),
                         batch_size, concurrency)
    return _final_query_topk(cand, id_col, k)
