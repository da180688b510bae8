"""Last-writer-wins reduction kernels (vectorized, associative).

The CDC conflict rule (BASELINE.json north_star): for each key (``url``) the
winning event is the one with the maximal ``(warc_ts, seq)`` — a total order,
never wall-clock. The reduction is associative and commutative, so it can be
applied per batch (combiner), per shuffle partition, and against the existing
base partition, in any grouping, and converge to the same winner — this is
what makes replay idempotent and parallelism-invariant.

Deletes are carried as tombstone rows (``_deleted = True``) so that a replayed
lower-priority update can never resurrect a deleted key; tombstones are
filtered only at read time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DELETED_COL = "_deleted"


def lww_reduce(table: pa.Table, key: str = "url", ts: str = "warc_ts",
               seq: str = "seq") -> pa.Table:
    """Keep, per key, only the row with maximal (ts, seq).

    Vectorized and copy-light: the key column is dictionary-encoded (C
    hashing), the (key, ts, seq) order is computed with an integer lexsort,
    and only the winner rows are gathered — the wide payload columns are
    never copied for losing rows.
    """
    if table.num_rows == 0:
        return table
    enc = pc.dictionary_encode(_one_chunk(table[key]))
    codes = pc.fill_null(pc.cast(enc.indices, pa.int64()), -1) \
        .to_numpy(zero_copy_only=False)
    ts_np = _int_view(table[ts])
    seq_np = _int_view(table[seq])
    # lexsort: last key is primary → (code asc, ts desc, seq desc)
    order = np.lexsort((-seq_np, -ts_np, codes))
    sorted_codes = codes[order]
    first = np.empty(len(order), dtype=bool)
    first[0] = True
    np.not_equal(sorted_codes[1:], sorted_codes[:-1], out=first[1:])
    winners = order[first]
    if len(winners) == len(order):
        return table  # every key unique — zero-copy passthrough
    winners.sort()
    return table.take(pa.array(winners))


def _one_chunk(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    return col


def _int_view(col) -> np.ndarray:
    arr = _one_chunk(col)
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    elif not pa.types.is_integer(arr.type):
        arr = arr.cast(pa.int64())
    # Null ts/seq must LOSE against any real value. Fill with int64 min + 1,
    # not min: lww_reduce negates this view for its descending lexsort, and
    # -int64_min overflows back to int64_min — a plain-min fill would make a
    # null sort as the LARGEST timestamp and win LWW (diverging from the SQL
    # oracle's NULLS-LAST ordering and resurrecting stale rows).
    np_arr = pc.fill_null(arr, np.iinfo(np.int64).min + 1).to_numpy(
        zero_copy_only=False)
    return np_arr.astype(np.int64, copy=False)


def to_versioned_rows(flat: pa.Table, op_col: str = "op") -> pa.Table:
    """Convert flattened change events into versioned lake rows.

    Adds ``_deleted`` (op == "D") and drops the op column; all other columns
    pass through. Input columns must already be flat (post schema-walk).
    """
    deleted = pc.equal(flat[op_col], "D")
    out = flat.drop_columns([op_col])
    return out.append_column(DELETED_COL, pc.fill_null(deleted, False))


def lww_dataset(ds, key: str = "url", ts: str = "warc_ts", seq: str = "seq",
                num_partitions: int = 32):
    """Dataset-level LWW: per-batch combine, then a key-hash partition-only
    exchange (``raycdc.shuffle.partition_map`` — no sort barrier) with one
    vectorized reduce per bucket. The generic 'latest row per key' operator
    (CDC apply uses the same kernels fused with the base merge)."""
    from raycdc.shuffle import partition_map, stable_hash

    bcol = "__rcdc_lb"

    def local(t: pa.Table) -> pa.Table:
        r = lww_reduce(t, key, ts, seq)
        # stable_hash, not a plain .to_pandas() hash: `key` is generic, and
        # one null in a nullable-int key batch would flip the dtype and
        # re-hash EVERY key in that batch (repo invariant — two winners for
        # one key would survive the per-bucket reduce)
        h = stable_hash(r[key])
        return r.append_column(bcol, pa.array((h % num_partitions).astype("int64")))

    def bucket(t: pa.Table) -> pa.Table:
        return lww_reduce(t, key, ts, seq)

    from raycdc.shuffle import lazy_schema

    return partition_map(ds.map_batches(local, batch_format="pyarrow"),
                         bcol, num_partitions, bucket,
                         empty_schema=lazy_schema(ds))


class LocalLwwCombiner:
    """map_batches combiner: collapse each batch to one winner row per key
    before the shuffle (caps hot-key volume at one row per key per batch —
    the pre-aggregation step of SURVEY.md §4's skew note).

    As an actor-pool stage (callable class) it additionally keeps a
    per-actor map of the best (ts, seq) already emitted per key and drops
    any later row that does not beat it. Dropping such rows is sound: a
    strictly-better row for that key was already emitted to the same
    downstream LWW merge, so the dropped row could never win. This cuts
    repeat emissions of hot (Zipf-head) keys across batches to the rate at
    which their winner actually advances. ``max_keys`` bounds actor memory;
    on overflow the map resets (re-emission is always sound).
    """

    def __init__(self, key: str = "url", ts: str = "warc_ts", seq: str = "seq",
                 max_keys: int = 4_000_000):
        self.key, self.ts, self.seq = key, ts, seq
        self.max_keys = max_keys
        self._seen = None  # pd.DataFrame(index=key, columns=["ts", "seq"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        out = lww_reduce(batch, self.key, self.ts, self.seq)
        if out.num_rows == 0:
            return out
        cur = pd.DataFrame(
            {"ts": _int_view(out[self.ts]), "seq": _int_view(out[self.seq])},
            index=pd.Index(out[self.key].to_pandas()))
        if self._seen is None:
            self._seen = cur
            return out
        # reindex with an int64 sentinel, NOT the NaN default: NaN would
        # degrade the whole column to float64, which quantizes ns-scale
        # timestamps (~1.7e18 > 2^53) at ~256 ns — two close events could
        # compare ts-equal and the seq tiebreak drop the genuinely newer
        # row. The sentinel (int64 min) always LOSES: _int_view floors real
        # values at int64 min + 1, so an unseen key can never read beaten.
        sentinel = np.iinfo(np.int64).min
        prev = self._seen.reindex(cur.index, fill_value=sentinel)
        pts, pseq = prev["ts"].to_numpy(), prev["seq"].to_numpy()
        # exact integer (ts, seq) order; sentinel (unseen) compares False
        beaten = (pts > cur["ts"].to_numpy()) | (
            (pts == cur["ts"].to_numpy()) & (pseq >= cur["seq"].to_numpy()))
        keep = ~beaten
        improved = cur[keep]
        self._seen = pd.concat(
            [self._seen[~self._seen.index.isin(improved.index)], improved])
        if len(self._seen) > self.max_keys:
            self._seen = None
        if keep.all():
            return out
        return out.filter(pa.array(keep))
