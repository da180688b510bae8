"""Mergeable sketches for approximate analytics at corpus scale.

:func:`approx_distinct` — HyperLogLog distinct count: each batch folds its
values into 2^p max-leading-zero registers (numpy-vectorized); register
vectors merge with an elementwise max (associative + commutative, so any
batch/partition grouping gives the identical sketch), and only the tiny
register vector ever leaves a task — counting a 10^10-row column shuffles
kilobytes. Deterministic: the value hash is seeded pandas hashing, so the
same input gives the same estimate on any cluster shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _registers(values: "pa.Array | pa.ChunkedArray", p: int) -> np.ndarray:
    """Fold one batch of values into 2^p HLL registers. Hashing is
    batch-layout-invariant (shuffle.stable_hash): a nullable int column
    must hash a value identically whether its batch has nulls or not, or
    the register merge double-counts. Nulls are dropped FIRST: SQL
    COUNT(DISTINCT) never counts NULL, and stable_hash otherwise gives
    nulls a fixed hash that lands in a register like a real value —
    a systematic +1 in the small-cardinality linear-counting regime
    (and a divergence from approx_distinct_by, which masks nulls)."""
    from raycdc.shuffle import stable_hash

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()
    m = 1 << p
    h = stable_hash(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # pad the reclaimed low bits with 1s so rest is never 0 and the rank is
    # capped at 64 - p + 1
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # vectorized leading-zero count via float log2; rank = lz + 1
    lz = (63 - np.floor(np.log2(rest.astype(np.float64)))).astype(np.int64)
    rank = np.clip(lz + 1, 1, 64).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinality
    return float(est)


def approx_distinct(ds: ray.data.Dataset, col: str, *,
                    precision: int = 12) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT col) — one-row Dataset
    ``{approx_distinct: int64}``. Standard error ≈ 1.04/sqrt(2^precision)
    (~1.6% at the default p=12; 4 KiB of registers per task)."""

    def batch_regs(t: pa.Table) -> pa.Table:
        regs = _registers(t[col], precision)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(
            pa.array(regs, pa.uint8()), len(regs))})

    def combine_regs(t: pa.Table) -> pa.Table:
        flat = t["regs"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(-1, 1 << precision)
        merged = flat.max(axis=0)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(
            pa.array(merged, pa.uint8()), len(merged))})

    from raycdc.shuffle import tree_reduce

    partials = ds.map_batches(batch_regs, batch_format="pyarrow",
                              batch_size=None)
    # register vectors merge with elementwise max (associative +
    # idempotent), so the fan-in tree is exact and the driver only ever
    # sees ONE 2^p-byte register row
    final = tree_reduce(partials, combine_regs)
    merged = np.zeros(1 << precision, dtype=np.uint8) if final is None else \
        final["regs"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(-1, 1 << precision).max(axis=0)
    return ray.data.from_arrow(pa.table({
        "approx_distinct": pa.array([int(round(_estimate(merged)))],
                                    pa.int64())}))


def heavy_hitters(ds: ray.data.Dataset, col: str, *,
                  threshold_frac: float = 0.01) -> ray.data.Dataset:
    """EXACT heavy hitters at corpus scale, without a full groupby.

    Two passes: (1) mergeable Misra-Gries summaries (k = 2/threshold_frac
    counters per batch; the merged summary is a guaranteed superset of every
    item with frequency >= threshold_frac*n, since MG undercounts by at
    most n/k = threshold*n/2), then (2) the small candidate set is
    broadcast and counted exactly in one vectorized filtered pass. Output
    (col, n) for items with exact count >= threshold_frac*n — identical to
    GROUP BY ... HAVING, but the only per-item state that ever exists is
    k counters per task plus the candidate set.
    """
    import ray

    k = max(8, int(np.ceil(2.0 / threshold_frac)))

    def batch_summary(t: pa.Table) -> pa.Table:
        # masked-dtype pandas hop (repo invariant): a null in a plain
        # to_pandas flips int64 → float64 and candidate values above 2^53
        # would round to the wrong integer — the exact recount then counts
        # the wrong candidate and the true heavy item silently disappears
        from raycdc.shuffle import stable_types_mapper

        s = t.select([col]).to_pandas(
            types_mapper=stable_types_mapper)[col]
        # Arrow-level null count: pandas isna() would also swallow float
        # NaN VALUES, which SQL groups separately from NULL. (Float NaN
        # keys remain unsupported through the pandas value_counts leg —
        # intended for string/int key columns.)
        arr = t[col]
        n_null = arr.null_count if not isinstance(arr, pa.ChunkedArray) \
            else sum(c.null_count for c in arr.chunks)
        vc = s.value_counts()  # non-null items; nulls are tallied exactly
        head = vc.head(k)
        # decrement by the (k+1)-th count: the MG "reduce to k counters"
        # step; undercount per batch is bounded by batch_rows / k
        cut = int(vc.iloc[k]) if len(vc) > k else 0
        kept = head[head > cut] - cut
        vals = pa.Array.from_pandas(kept.index.to_series().reset_index(drop=True))
        # marker row (null item) carries the batch row count AND the exact
        # null tally: SQL GROUP BY treats NULL as a group, and the null
        # group needs no candidate pass — its exact count is free here
        return pa.table({
            col: pa.concat_arrays([vals.cast(t[col].type),
                                   pa.nulls(1, t[col].type)]),
            "mg": pa.array(list(kept.to_numpy()) + [0], pa.int64()),
            "rows": pa.array([0] * len(kept) + [t.num_rows], pa.int64()),
            "nulls": pa.array([0] * len(kept) + [int(n_null)], pa.int64()),
        })

    def mg_combine(t: pa.Table) -> pa.Table:
        """Merge MG summaries: group-sum counts per item, then reduce back
        to k counters by subtracting the (k+1)-th largest (the standard
        mergeable-summary merge — Agarwal et al. 2012; total undercount
        stays bounded by n/k). Null rows are the per-batch markers: their
        rows/nulls tallies just sum. Associative and idempotent on
        already-combined input, so any fan-in tree gives a superset of
        every >= threshold item."""
        g = t.group_by(col).aggregate(
            [("mg", "sum"), ("rows", "sum"), ("nulls", "sum")])
        item_arr = g[col].combine_chunks() if isinstance(
            g[col], pa.ChunkedArray) else g[col]
        is_item = pc.is_valid(item_arr).to_numpy(zero_copy_only=False)
        mg = g["mg_sum"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(g), dtype=bool)
        n_items = int(is_item.sum())
        if n_items > k:
            vals = np.where(is_item, mg, -1)
            order = np.argsort(-vals, kind="stable")
            cut = int(vals[order[k]])
            if cut > 0:
                keep = (~is_item) | (vals > cut)
                mg = np.where(is_item, mg - cut, mg)
        return pa.table({
            col: item_arr.filter(pa.array(keep)),
            "mg": pa.array(mg[keep], pa.int64()),
            "rows": g["rows_sum"].filter(pa.array(keep)).cast(pa.int64()),
            "nulls": g["nulls_sum"].filter(pa.array(keep)).cast(pa.int64()),
        })

    from raycdc.shuffle import tree_reduce

    summaries = ds.map_batches(batch_summary, batch_format="pyarrow",
                               batch_size=None)
    # fan-in tree: driver holds object refs only; the one table it ever
    # fetches is the final merged summary (<= k items + one marker row)
    merged = tree_reduce(summaries, mg_combine)
    s = ds.schema()
    try:
        col_type = dict(zip(s.names, s.types))[col]
    except (AttributeError, KeyError):
        # fully-empty mapped upstream: schema() is None (documented Ray
        # degrade) — merged is None too, so the type only shapes the empty
        col_type = pa.string()
    out_schema = pa.schema([(col, col_type), ("n", pa.int64())])
    if merged is None:
        return ray.data.from_arrow(out_schema.empty_table())
    total = int(pc.sum(merged["rows"]).as_py() or 0)
    total_nulls = int(pc.sum(merged["nulls"]).as_py() or 0)
    items = merged.filter(pc.is_valid(merged[col]))
    cand_arr = (items[col].combine_chunks() if isinstance(
        items[col], pa.ChunkedArray) else items[col]).cast(col_type)
    threshold = threshold_frac * total

    def count_candidates(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(t[col], value_set=cand_arr), False)
        sub = t.filter(mask)
        g = sub.group_by(col).aggregate([([], "count_all")])
        return pa.table({col: g[col].cast(col_type),
                         "n": g["count_all"].cast(pa.int64())})

    def sum_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(col).aggregate([("n", "sum")])
        return pa.table({col: g[col], "n": g["n_sum"].cast(pa.int64())})

    exact_tab = None
    if len(cand_arr):
        counts = ds.map_batches(count_candidates, batch_format="pyarrow",
                                batch_size=None)
        # exact recount merges by group-sum through the same fan-in tree —
        # per-node state is <= |candidates| (<= k) rows, never O(batches)
        exact_tab = tree_reduce(counts, sum_counts)
    if exact_tab is not None and exact_tab.num_rows:
        exact = exact_tab.to_pandas().set_index(col)["n"].sort_index()
    else:
        exact = pd.Series([], dtype="int64", name="n")
    final = exact[exact >= threshold].sort_values(ascending=False,
                                                  kind="stable")
    vals = pa.Array.from_pandas(
        final.index.to_series().reset_index(drop=True)).cast(col_type)
    ns = list(final.to_numpy())
    if total_nulls >= threshold and total_nulls > 0:
        # the NULL group (SQL GROUP BY semantics) — exact count from markers
        vals = pa.concat_arrays([vals, pa.nulls(1, col_type)])
        ns.append(total_nulls)
    return ray.data.from_arrow(pa.table(
        {col: vals, "n": pa.array(ns, pa.int64())}, schema=out_schema))


def _compress(vals: np.ndarray, weights: np.ndarray, m: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Compress a weighted, value-sorted summary to ``m`` representatives.

    Representative j is the smallest value whose cumulative weight reaches
    target t_j = ceil((j+1)·W/m), carrying weight t_j − t_{j-1}. Each rep
    upper-bounds every value it absorbs, so the final "smallest rep with
    cumweight ≥ target" pick never understates a quantile's rank by more
    than one run (≤ W/m)."""
    if len(vals) <= m:
        return vals, weights
    cw = np.cumsum(weights)
    total = int(cw[-1])
    targets = np.ceil(np.arange(1, m + 1) * (total / m)).astype(np.int64)
    targets[-1] = total
    idx = np.searchsorted(cw, targets, side="left")
    out_w = np.diff(np.concatenate([[0], targets]))
    keep = out_w > 0
    return vals[idx[keep]], out_w[keep]


def approx_quantile(ds: ray.data.Dataset, col: str, qs: list[float],
                    names: list[str] | None = None, *,
                    m: int = 2048) -> ray.data.Dataset:
    """Approximate global quantiles via a mergeable compressed summary
    (MRL-style): every block reduces to ≤ m (value, weight) representatives
    — value-sorted, each rep the max of its run — and summaries merge
    through the shuffle.tree_reduce fan-in, re-compressing only when a
    node's buffer exceeds 64·m, so per-node state stays O(m) and the
    driver fetches ONE bounded table no matter how many blocks stream in.
    Rank error is bounded by ~n/m per compressing level (block pass + one
    tree level at typical depths ⇒ ~2·n/m). Nulls are excluded per SQL;
    NaN sorts last (DuckDB's "NaN is largest" convention).

    EXACT when m ≥ rows-per-block and no re-compression triggers: each
    block then emits every value at weight 1 and the final pick is
    literally percentile_disc — which is what the oracle-checked
    ``approx_quantile_full`` entry exercises (same pattern as
    ``ann_ivf_full``: the sketch at full fidelity must equal the exact
    engine). The compressed configuration is accuracy-gated in pytest
    (rank error < 1% vs exact on a skewed fixture).

    Output: one row, one float64 column per q (disc convention — actual
    input values, never interpolated).
    """
    names = names or [f"q{int(q * 100)}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names must match qs")

    def block_summary(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        v.sort()
        n = len(v)
        if n > m:
            # m runs of near-equal length; representative = run max, so the
            # smallest-rep-with-cumweight>=target pick stays conservative
            bounds = np.floor(np.arange(1, m + 1) * (n / m)).astype(np.int64)
            bounds[-1] = n
            w = np.diff(np.concatenate([[0], bounds]))
            keep = w > 0
            v, w = v[bounds[keep] - 1], w[keep]
        else:
            w = np.ones(n, dtype=np.int64)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.int64())})

    def combine_summaries(t: pa.Table) -> pa.Table:
        """Fan-in node: concat summaries; re-compress only past the 64·m
        buffer bound (so full-fidelity configs — m ≥ every block's rows,
        as the oracle-checked *_full entries use — never compress and stay
        EXACTLY percentile_disc). Rank error grows by ≤ one run (n/m) per
        compressing level of the tree."""
        bv = t["v"].to_numpy(zero_copy_only=False)
        bw = t["w"].to_numpy(zero_copy_only=False)
        if len(bv) > 64 * m:
            order = np.argsort(bv, kind="stable")
            cv, cw_ = _compress(bv[order], bw[order], m)
            return pa.table({"v": pa.array(cv, pa.float64()),
                             "w": pa.array(cw_, pa.int64())})
        return t.select(["v", "w"])

    from raycdc.shuffle import tree_reduce

    partials = ds.map_batches(block_summary, batch_format="pyarrow",
                              batch_size=None)
    # summaries merge associatively (concat + optional re-compression), so
    # the fan-in tree keeps the driver out of the merge entirely: it
    # fetches ONE table bounded by max(m, last fan-in) rows instead of
    # streaming every block's summary
    final = tree_reduce(partials, combine_summaries)
    if final is not None and final.num_rows:
        buf_v = final["v"].to_numpy(zero_copy_only=False)
        buf_w = final["w"].to_numpy(zero_copy_only=False)
    else:
        buf_v = np.empty(0, np.float64)
        buf_w = np.empty(0, np.int64)
    cols: dict[str, pa.Array] = {}
    if len(buf_v) == 0:
        for name in names:
            cols[name] = pa.nulls(1, pa.float64())
    else:
        order = np.argsort(buf_v, kind="stable")
        v, w = buf_v[order], buf_w[order]
        cw = np.cumsum(w)
        total = int(cw[-1])
        for q, name in zip(qs, names):
            target = max(int(np.ceil(q * total)), 1)
            i = int(np.searchsorted(cw, target, side="left"))
            cols[name] = pa.array([float(v[i])], pa.float64())
    return ray.data.from_arrow(pa.table(cols))


def approx_distinct_by(ds: ray.data.Dataset, key_col: str, col: str, *,
                       precision: int = 12,
                       num_partitions: int = 32) -> ray.data.Dataset:
    """Approximate ``count(DISTINCT col)`` per group — the grouped HLL.

    Per batch, ALL groups' registers update in one vectorized pass
    (``np.maximum.at`` on a flat ``n_groups × 2^p`` register matrix —
    no per-group Python loop); each group then ships one 2^p-byte
    register row through the partition-only exchange, where rows merge
    with a sorted ``np.maximum.reduceat`` (elementwise max, associative —
    any batch/partition layout gives the identical sketch). Shuffle
    volume is ``groups-per-batch × batches × 2^p`` bytes regardless of
    row count. Accuracy matches :func:`approx_distinct` (~1.6% at p=12);
    gated in pytest against the exact grouped count."""
    from raycdc.ops.ordered import _hash_bucket, _key_codes
    from raycdc.shuffle import partition_map

    m = 1 << precision
    bcol = "__rcdc_gh"

    def batch_regs(t: pa.Table) -> pa.Table:
        vals = t[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        codes, dictionary = _key_codes(t, key_col)
        from raycdc.shuffle import stable_hash

        h = stable_hash(vals)
        idx = (h >> np.uint64(64 - precision)).astype(np.int64)
        rest = (h << np.uint64(precision)) | np.uint64((1 << precision) - 1)
        lz = (63 - np.floor(np.log2(rest.astype(np.float64)))).astype(
            np.int64)
        rank = np.clip(lz + 1, 1, 64).astype(np.uint8)
        live = np.unique(codes[valid]) if valid.any() else \
            np.empty(0, np.int64)
        remap = np.full(len(dictionary), -1, np.int64)
        remap[live] = np.arange(len(live))
        flat = np.zeros(len(live) * m, dtype=np.uint8)
        v = valid
        np.maximum.at(flat, remap[codes[v]] * m + idx[v], rank[v])
        keys_out = dictionary.take(pa.array(live))
        return pa.table({
            key_col: keys_out,
            "regs": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.uint8()), m),
        })

    def bucket_merge(t: pa.Table) -> pa.Table:
        codes, dictionary = _key_codes(t, key_col)
        regs = t["regs"]
        if isinstance(regs, pa.ChunkedArray):
            regs = regs.combine_chunks()
        mat = regs.flatten().to_numpy(zero_copy_only=False).reshape(-1, m)
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], c[1:] != c[:-1]])) if len(c) else np.empty(0, np.int64)
        merged = np.maximum.reduceat(mat[order], starts, axis=0) \
            if len(c) else np.empty((0, m), np.uint8)
        ests = [int(round(_estimate(merged[i]))) for i in range(len(starts))]
        return pa.table({
            key_col: dictionary.take(pa.array(c[starts])),
            "approx_nd": pa.array(ests, pa.int64()),
        })

    def empty_schema():
        s = ds.schema()
        try:
            kt = dict(zip(s.names, s.types))[key_col]
        except (AttributeError, KeyError):
            kt = pa.string()
        return pa.schema([(key_col, kt), ("approx_nd", pa.int64())])

    pruned = ds.select_columns([key_col, col])
    partials = pruned.map_batches(batch_regs, batch_format="pyarrow",
                                  batch_size=None)
    bucketed = partials.map_batches(
        lambda t: _hash_bucket(t, key_col, bcol, num_partitions),
        batch_format="pyarrow", batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_merge,
                         empty_schema=empty_schema)


def grouped_approx_quantile(
    ds: ray.data.Dataset, key_col: str, col: str, qs: list[float],
    names: list[str] | None = None, *, m: int = 512,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group approximate quantiles with BOUNDED per-group state — the
    scale path for the giant-group case where
    :func:`raycdc.ops.ordered.grouped_quantile` (exact, needs the whole
    group co-located) cannot apply. Every batch compresses each group to
    ≤ m (value, weight) reps (run max as representative, like
    :func:`approx_quantile`); reps ship as plain rows through the
    partition-only exchange (≤ groups × m × batches rows total) and each
    bucket computes the weighted disc pick per group. Rank error ≤
    ~2·n_g/m per group.

    EXACT when m ≥ every group's rows-per-batch (all reps weight 1 — the
    pick is literally percentile_disc), which is what the oracle-checked
    full-fidelity entry exercises. Nulls excluded per SQL; all-null
    groups emit null quantiles.
    """
    from raycdc.ops.ordered import _hash_bucket, _key_codes
    from raycdc.shuffle import partition_map

    names = names or [f"q{int(q * 100)}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names must match qs")
    bcol = "__rcdc_gaq"

    def batch_summaries(t: pa.Table) -> pa.Table:
        vals = t[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        codes, dictionary = _key_codes(t, key_col)
        vn = vals.to_numpy(zero_copy_only=False)
        null_rank = (~valid).astype(np.int64)
        with np.errstate(invalid="ignore"):
            order = np.lexsort((vn, null_rank, codes))
        c = codes[order]
        n = len(c)
        keep_idx: list[np.ndarray] = []
        weights: list[np.ndarray] = []
        out_codes: list[np.ndarray] = []
        if n:
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = c[1:] != c[:-1]
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, n))
            nn = np.add.reduceat(valid[order].astype(np.int64), starts)
            # vectorized paths: groups at/below m keep every non-null row
            # at weight 1; all-null groups emit one weight-0 marker; ONLY
            # oversized groups (> m rows — rare by construction) loop
            sizes = np.repeat(nn, counts)
            pos = np.arange(n) - np.repeat(starts, counts)
            small = (sizes <= m) & (sizes > 0) & (pos < sizes)
            idx_small = np.flatnonzero(small)
            if len(idx_small):
                keep_idx.append(idx_small)
                weights.append(np.ones(len(idx_small), np.int64))
                out_codes.append(c[idx_small])
            null_g = np.flatnonzero(nn == 0)
            if len(null_g):
                keep_idx.append(starts[null_g])
                weights.append(np.zeros(len(null_g), np.int64))
                out_codes.append(c[starts[null_g]])
            for gi in np.flatnonzero(nn > m):
                s, ng = int(starts[gi]), int(nn[gi])
                bounds = np.floor(
                    np.arange(1, m + 1) * (ng / m)).astype(np.int64)
                bounds[-1] = ng
                w = np.diff(np.concatenate([[0], bounds]))
                kp = w > 0
                keep_idx.append(s + bounds[kp] - 1)
                weights.append(w[kp])
                out_codes.append(np.full(int(kp.sum()), c[s]))
        if keep_idx:
            idx = np.concatenate(keep_idx)
            w = np.concatenate(weights)
            cc = np.concatenate(out_codes)
        else:
            idx = np.empty(0, np.int64)
            w = np.empty(0, np.int64)
            cc = np.empty(0, np.int64)
        return pa.table({
            key_col: dictionary.take(pa.array(cc)),
            "v": pc.cast(vals.take(pa.array(order[idx])), pa.float64()),
            "w": pa.array(w),
        })

    def bucket_quantiles(t: pa.Table) -> pa.Table:
        codes, dictionary = _key_codes(t, key_col)
        vn = t["v"].to_numpy(zero_copy_only=False)
        wn = t["w"].to_numpy(zero_copy_only=False)
        null_rank = np.isnan(vn).astype(np.int64) | \
            (~pc.is_valid(t["v"].combine_chunks()
                          if isinstance(t["v"], pa.ChunkedArray)
                          else t["v"]).to_numpy(zero_copy_only=False)
             ).astype(np.int64)
        with np.errstate(invalid="ignore"):
            order = np.lexsort((vn, null_rank, codes))
        c = codes[order]
        v = vn[order]
        w = wn[order]
        n = len(c)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        cols = {key_col: dictionary.take(pa.array(c[starts]))}
        # global cumsum is nondecreasing (weights >= 0), so the per-group
        # disc pick is ONE vectorized searchsorted over group-offset
        # targets — no per-group Python loop
        cw = np.cumsum(w)
        base = cw[starts] - w[starts]
        totals = (cw[ends - 1] - base) if n else np.empty(0, np.int64)
        for q, nm in zip(qs, names):
            target = np.maximum(np.ceil(q * totals).astype(np.int64), 1)
            j = np.searchsorted(cw, base + target, side="left")
            j = np.minimum(j, max(n - 1, 0))
            picked = v[j] if n else np.empty(0, np.float64)
            cols[nm] = pc.if_else(
                pa.array(totals > 0), pa.array(picked, pa.float64()),
                pa.nulls(len(starts), pa.float64()))
        return pa.table(cols)

    def empty_schema():
        s = ds.schema()
        try:
            kt = dict(zip(s.names, s.types))[key_col]
        except (AttributeError, KeyError):
            kt = pa.string()
        return pa.schema([(key_col, kt)]
                         + [(nm, pa.float64()) for nm in names])

    pruned = ds.select_columns([key_col, col])
    partials = pruned.map_batches(batch_summaries, batch_format="pyarrow",
                                  batch_size=None)
    bucketed = partials.map_batches(
        lambda t: _hash_bucket(t, key_col, bcol, num_partitions),
        batch_format="pyarrow", batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_quantiles,
                         empty_schema=empty_schema)
