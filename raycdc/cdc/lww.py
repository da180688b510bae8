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
    """Keep, per key, only the row with maximal (ts, seq). Vectorized:
    one sort + one boundary scan, no Python per-group work."""
    if table.num_rows == 0:
        return table
    idx = pc.sort_indices(table, sort_keys=[
        (key, "ascending"), (ts, "descending"), (seq, "descending")])
    t = table.take(idx)
    keys = t[key].to_numpy(zero_copy_only=False)
    first = np.empty(len(keys), dtype=bool)
    first[0] = True
    np.not_equal(keys[1:], keys[:-1], out=first[1:])
    return t.filter(pa.array(first))


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
    """Dataset-level LWW: per-batch combine, then a key-hash bucket shuffle
    with one vectorized reduce per bucket. The generic 'latest row per key'
    operator (CDC apply uses the same kernels fused with the base merge)."""
    import pandas as pd

    bcol = "__rcdc_lb"

    def local(t: pa.Table) -> pa.Table:
        r = lww_reduce(t, key, ts, seq)
        h = pd.util.hash_pandas_object(r[key].to_pandas(), index=False).to_numpy()
        return r.append_column(bcol, pa.array((h % num_partitions).astype("int64")))

    def bucket(t: pa.Table) -> pa.Table:
        return lww_reduce(t.drop_columns([bcol]), key, ts, seq)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby(bcol).map_groups(bucket, batch_format="pyarrow"))


class LocalLwwCombiner:
    """map_batches combiner: collapse each batch to one winner row per key
    before the shuffle (caps hot-key volume at one row per key per batch —
    the pre-aggregation step of SURVEY.md §4's skew note)."""

    def __init__(self, key: str = "url", ts: str = "warc_ts", seq: str = "seq"):
        self.key, self.ts, self.seq = key, ts, seq

    def __call__(self, batch: pa.Table) -> pa.Table:
        return lww_reduce(batch, self.key, self.ts, self.seq)
