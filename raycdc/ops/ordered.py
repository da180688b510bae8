"""Keyed ordered-window functions and exact grouped quantiles.

Ray Data has no SQL window functions (``row_number() OVER (PARTITION BY k
ORDER BY ts)``, ``lag``/``lead``) and no exact per-group quantile. Both are
per-key computations that need all rows of a key co-located but nothing
else — exactly the engine's partition-only exchange shape
(``raycdc.shuffle.partition_map``): hash-bucket rows by key (no sort, no
barrier), then ONE vectorized pass per bucket (dictionary-encode keys,
``np.lexsort``, boundary masks). Millions of keys cost P Python calls
total, not one per key — the same scale argument as
``raycdc.ops.window.session_window``.

Partitioning assumption (documented per the custom-operator contract): a
single key's rows must fit in one partition task. Keys are individually
small here (one user's events, one group's values); a pathological giant
key would need per-key salting with a merge finalizer, which these exact
operators intentionally do not attempt.

Reference parity note: the reference plugin (CDAP HierarchyToRelational)
has no window functions; these belong to the LLM-data-pipeline operator
set (sessionization cousins: event ordering, inter-event gaps, per-group
distribution stats for quality filtering).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.ops.window import _ts_us
from raycdc.shuffle import partition_map


def _key_codes(t: pa.Table, key_col: str) -> tuple[np.ndarray, pa.Array]:
    """Dictionary-encode a key column to int64 codes (nulls -> one extra
    code past the dictionary) and return (codes, dictionary-with-null)."""
    keys = t[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    enc = pc.dictionary_encode(keys)
    dictionary = pa.concat_arrays(
        [enc.dictionary, pa.nulls(1, enc.dictionary.type)])
    codes = pc.fill_null(pc.cast(enc.indices, pa.int64()),
                         len(enc.dictionary)).to_numpy(zero_copy_only=False)
    return codes, dictionary


def _hash_bucket(t: pa.Table, key_cols: "str | list[str]", bcol: str,
                 num_partitions: int) -> pa.Table:
    """Append an int64 bucket-id column from the hash of one key column
    (or a list of them) — the one shared implementation of the
    hash → % P → append dance used before every partition_map.
    Uses the batch-layout-invariant hash (shuffle.stable_hash): nullable
    int keys must not route differently in null-containing batches."""
    from raycdc.shuffle import stable_hash

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    h = stable_hash(t, list(key_cols))
    return t.append_column(
        bcol, pa.array((h % num_partitions).astype("int64")))


def ordered_window(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    lag_cols: list[str] | None = None,
    lead_cols: list[str] | None = None,
    cum_sums: dict[str, str] | None = None,
    roll_sums: dict[str, tuple[str, int]] | None = None,
    rn_name: str = "rn",
    gap_name: str | None = "gap_us",
    ntile: int | None = None,
    ntile_name: str = "ntile",
    percent_rank_name: str | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """SQL-window-function equivalent of::

        row_number() OVER w AS rn,
        lag(c)  OVER w AS prev_c,   -- for c in lag_cols
        lead(c) OVER w AS next_c,   -- for c in lead_cols
        sum(c)  OVER w AS <out>,    -- for out -> c in cum_sums
        sum(c)  OVER (w ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW)
                                    -- for out -> (c, N) in roll_sums
        ntile(N) OVER w,            -- if ntile is set
        percent_rank() OVER w,      -- if percent_rank_name is set
        epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        WINDOW w AS (PARTITION BY key ORDER BY ts, id)

    ntile follows SQL semantics (the first n % N buckets get one extra
    row); percent_rank = (rn-1)/(group_size-1), 0 for singleton groups —
    an exact double of two small ints, identical on any engine.

    Output: one row per input row with (id_col, key_col, rn, prev_*/next_*,
    cum-sum columns, gap_us). Ordering is total — ties on ts break by
    id_col, so the result is deterministic, the SQL default RANGE frame
    equals ROWS (no peer rows), and the output is oracle-hashable. lag/lead
    columns keep their input types (boundary rows are null via a validity
    mask + take, so any Arrow type works, not just numerics).

    ``cum_sums`` columns must be integer (the running sum is a sequential
    reduction — int64 keeps it accumulation-exact; float running sums are
    FP-rounding-order-sensitive vs other engines and are rejected). Null
    inputs count as 0 per running sum (callers wanting SQL's
    all-null-prefix -> null semantics should pre-filter). ``roll_sums``
    (out -> (col, N), N >= 1 rows including the current one) share the
    same integer/null rules; each is one cumsum + one shifted subtract —
    no per-row loop, any N is O(n).
    """
    lag_cols = list(lag_cols or [])
    lead_cols = list(lead_cols or [])
    cum_sums = dict(cum_sums or {})
    roll_sums = dict(roll_sums or {})
    for out, (col, nwin) in roll_sums.items():
        if nwin < 1:
            raise ValueError(f"roll_sums[{out!r}] window must be >= 1 row")
    bcol = "__rcdc_ow"
    need = [id_col, key_col, ts_col] + [
        c for c in dict.fromkeys(lag_cols + lead_cols + list(cum_sums.values())
                                 + [c for c, _ in roll_sums.values()])
        if c not in (id_col, key_col, ts_col)]

    def bucket_windows(t: pa.Table) -> pa.Table:
        codes, _ = _key_codes(t, key_col)
        tarr = t[ts_col]
        if isinstance(tarr, pa.ChunkedArray):
            tarr = tarr.combine_chunks()
        ts_valid = pc.is_valid(tarr).to_numpy(zero_copy_only=False)
        # null ts sorts LAST within its key (SQL ORDER BY ... ASC NULLS
        # LAST); _ts_us on a null would be an undefined NaN->int cast
        us = _ts_us(pc.fill_null(tarr, 0))
        ts_null_rank = (~ts_valid).astype(np.int64)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        order = np.lexsort((idn, us, ts_null_rank, codes))
        s = t.take(pa.array(order))
        c = codes[order]
        u = us[order]
        n = len(c)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            id_col: s[id_col], key_col: s[key_col],
            rn_name: pa.array(rn),
        }
        # lag: row i takes sorted row i-1 unless i starts a group
        prev_idx = pa.array(np.maximum(np.arange(n) - 1, 0))
        next_idx = pa.array(np.minimum(np.arange(n) + 1, max(n - 1, 0)))
        last = np.empty(n, dtype=bool)
        last[-1:] = True
        last[:-1] = new[1:]
        for col in lag_cols:
            taken = (s[col].combine_chunks()
                     if isinstance(s[col], pa.ChunkedArray) else s[col]
                     ).take(prev_idx)
            cols[f"prev_{col}"] = pc.if_else(
                pa.array(new), pa.nulls(n, taken.type), taken)
        for col in lead_cols:
            taken = (s[col].combine_chunks()
                     if isinstance(s[col], pa.ChunkedArray) else s[col]
                     ).take(next_idx)
            cols[f"next_{col}"] = pc.if_else(
                pa.array(last), pa.nulls(n, taken.type), taken)
        for out, col in cum_sums.items():
            arr = s[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not pa.types.is_integer(arr.type):
                raise TypeError(
                    f"cum_sums column {col!r} must be integer, got "
                    f"{arr.type} (float running sums are rounding-order-"
                    f"sensitive; cast or scale to int first)")
            v = pc.fill_null(pc.cast(arr, pa.int64()), 0).to_numpy(
                zero_copy_only=False)
            cs = np.cumsum(v)
            base = cs[starts] - v[starts]
            cols[out] = pa.array(cs - np.repeat(base, counts))
        for out, (col, nwin) in roll_sums.items():
            arr = s[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not pa.types.is_integer(arr.type):
                raise TypeError(
                    f"roll_sums column {col!r} must be integer, got "
                    f"{arr.type} (see cum_sums)")
            v = pc.fill_null(pc.cast(arr, pa.int64()), 0).to_numpy(
                zero_copy_only=False)
            cs = np.cumsum(v)
            base = cs[starts] - v[starts]
            g = cs - np.repeat(base, counts)  # group-local running sum
            roll = g.copy()
            # subtract the running sum N rows back; rn > N guarantees the
            # referenced row is in the same group, so no cross-group leak
            mask = rn > nwin
            roll[mask] -= g[np.flatnonzero(mask) - nwin]
            cols[out] = pa.array(roll)
        if ntile is not None or percent_rank_name is not None:
            gsize = np.repeat(counts, counts)
        if ntile is not None:
            # SQL NTILE: sizes q+1 for the first r buckets, q after
            # (q = size // N, r = size % N)
            q, rem = gsize // ntile, gsize % ntile
            big = rem * (q + 1)
            pos = rn - 1
            in_big = pos < big
            with np.errstate(divide="ignore", invalid="ignore"):
                tile = np.where(
                    in_big, pos // np.maximum(q + 1, 1),
                    rem + (pos - big) // np.maximum(q, 1)) + 1
            cols[ntile_name] = pa.array(tile.astype(np.int64))
        if percent_rank_name is not None:
            denom = np.maximum(gsize - 1, 1).astype(np.float64)
            cols[percent_rank_name] = pa.array((rn - 1) / denom)
        if gap_name is not None:
            gap = u - np.concatenate([u[:1], u[:-1]])
            tv = ts_valid[order]
            prev_tv = np.concatenate([tv[:1], tv[:-1]])
            # gap is null at group starts and wherever this or the previous
            # ts is null (SQL: ts - lag(ts) is NULL if either side is)
            invalid = new | ~tv | ~prev_tv
            cols[gap_name] = pc.if_else(
                pa.array(invalid), pa.nulls(n, pa.int64()),
                pa.array(gap.astype(np.int64)))
        return pa.table(cols)

    def empty_schema():
        s = ds.schema()
        try:
            types = dict(zip(s.names, s.types))
        except AttributeError:
            types = {}
        fields = [
            (id_col, types.get(id_col, pa.int64())),
            (key_col, types.get(key_col, pa.string())),
            (rn_name, pa.int64()),
        ]
        for col in lag_cols:
            fields.append((f"prev_{col}", types.get(col, pa.int64())))
        for col in lead_cols:
            fields.append((f"next_{col}", types.get(col, pa.int64())))
        for out in cum_sums:
            fields.append((out, pa.int64()))
        for out in roll_sums:
            fields.append((out, pa.int64()))
        if ntile is not None:
            fields.append((ntile_name, pa.int64()))
        if percent_rank_name is not None:
            fields.append((percent_rank_name, pa.float64()))
        if gap_name is not None:
            fields.append((gap_name, pa.int64()))
        return pa.schema(fields)

    pruned = ds.select_columns(need)
    bucketed = pruned.map_batches(
        lambda t: _hash_bucket(t, key_col, bcol, num_partitions),
        batch_format="pyarrow", batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_windows,
                         empty_schema=empty_schema)


def grouped_quantile(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    qs: list[float],
    names: list[str] | None = None,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact per-group discrete quantiles (``percentile_disc`` /
    DuckDB ``quantile_disc`` convention: sorted ascending, element at index
    ``ceil(q*n) - 1``). One output row per group with one column per q.

    Element selection, not interpolation — the result is an actual input
    value, so float columns stay bit-exact and oracle-hashable (no
    accumulation-order sensitivity; see CLAUDE.md invariants).

    Scale shape: only ``keys + [col]`` transit the exchange (prune at the
    read); each bucket does one lexsort over its rows. Null values are
    excluded per SQL semantics (percentile ignores NULLs); groups with only
    nulls emit null quantiles.
    """
    names = names or [f"q{int(q * 100)}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names must match qs")
    bcol = "__rcdc_gq"

    def add_bucket(t: pa.Table) -> pa.Table:
        return _hash_bucket(t.select(keys + [col]), keys, bcol,
                            num_partitions)

    def bucket_quantiles(t: pa.Table) -> pa.Table:
        if len(keys) == 1:
            codes, _ = _key_codes(t, keys[0])
        else:
            import pandas as pd

            from raycdc.shuffle import stable_types_mapper

            # masked-dtype hop (repo invariant): a null in any nullable-int
            # key column would flip the frame to float64 and distinct int64
            # keys >= 2^53 would factorize to ONE code — merged quantiles
            kdf = t.select(keys).to_pandas(
                types_mapper=stable_types_mapper)
            codes = pd.MultiIndex.from_frame(kdf).factorize()[0].astype(
                np.int64)
        vals = t[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        vn = vals.to_numpy(zero_copy_only=False)
        # sort by (code, null-last, value): nulls sort after every real
        # value within the group so the per-group prefix is the non-null run
        null_rank = (~valid).astype(np.int64)
        with np.errstate(invalid="ignore"):
            order = np.lexsort((vn, null_rank, codes))
        c = codes[order]
        n = len(c)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        nn = np.add.reduceat(valid[order].astype(np.int64), starts)
        first_rows = t.select(keys).take(pa.array(order[starts]))
        out_cols = {k: first_rows[k] for k in keys}
        for q, name in zip(qs, names):
            idx = starts + np.maximum(
                np.ceil(q * nn).astype(np.int64) - 1, 0)
            picked = vals.take(pa.array(order[idx]))
            out_cols[name] = pc.if_else(
                pa.array(nn > 0), picked, pa.nulls(len(starts), vals.type))
        return pa.table(out_cols)

    def empty_schema():
        s = ds.schema()
        try:
            types = dict(zip(s.names, s.types))
        except AttributeError:
            types = {}
        fields = [(k, types.get(k, pa.string())) for k in keys]
        fields += [(nm, types.get(col, pa.float64())) for nm in names]
        return pa.schema(fields)

    pruned = ds.select_columns(list(dict.fromkeys(keys + [col])))
    bucketed = pruned.map_batches(add_bucket, batch_format="pyarrow",
                                  batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_quantiles,
                         empty_schema=empty_schema)
