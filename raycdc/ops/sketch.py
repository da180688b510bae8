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
import ray.data


def _registers(values: pd.Series, p: int) -> np.ndarray:
    """Fold one batch of values into 2^p HLL registers."""
    m = 1 << p
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()
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
        regs = _registers(t[col].to_pandas(), precision)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(
            pa.array(regs, pa.uint8()), len(regs))})

    partials = ds.map_batches(batch_regs, batch_format="pyarrow",
                              batch_size=None)
    merged = np.zeros(1 << precision, dtype=np.uint8)
    for t in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        flat = t["regs"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(-1, 1 << precision)
        merged = np.maximum(merged, flat.max(axis=0))
    return ray.data.from_arrow(pa.table({
        "approx_distinct": pa.array([int(round(_estimate(merged)))],
                                    pa.int64())}))
