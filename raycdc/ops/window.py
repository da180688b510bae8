"""Windowed aggregation over an ordered event stream.

Ray Data has no event-time windows; the engine expresses tumbling and
sliding windows as a partition-wise transform (SURVEY.md "streaming-shaped
workloads"): assign each event its window id(s) in a stateless vectorized
``map_batches`` (a tumbling window is a pure function of the timestamp;
a sliding window emits one row per covering window via ``np.repeat``), then
run the normal partial-aggregation groupby over ``(key, window)``. The
ordering assumption is only *within the aggregation*, which is order-free —
no global sort is ever needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.agg import grouped_aggregate


def _pin_us(out: "ray.data.Dataset", window_col: str) -> "ray.data.Dataset":
    """Pin the window column to timestamp[us]: tumbling carries it through
    the aggregate as int64 ticks (null-safe under Ray's sort-groupby), and
    the pandas leg can narrow second-aligned window starts to
    timestamp[s] — both cast straight to timestamp[us] here."""

    def fix_unit(t: pa.Table) -> pa.Table:
        i = t.column_names.index(window_col)
        return t.set_column(i, window_col,
                            t[window_col].cast(pa.timestamp("us")))

    return out.map_batches(fix_unit, batch_format="pyarrow")


def _ts_us(col) -> np.ndarray:
    """Timestamp column → int64 MICROSECOND ticks, whatever the storage
    unit (the repo's temporal invariant: never use native-unit ticks).
    s/ms scale up exactly; ns floors — safe for windowing, since window
    boundaries sit on whole microseconds, so flooring never moves an
    event across one. Plain int columns pass through as given (callers
    define their unit)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    scale_up, scale_down = 1, 1
    if pa.types.is_timestamp(arr.type):
        scale_up, scale_down = {
            "s": (1_000_000, 1), "ms": (1_000, 1),
            "us": (1, 1), "ns": (1, 1_000)}[arr.type.unit]
        arr = arr.cast(pa.int64())
    ticks = arr.to_numpy(zero_copy_only=False).astype(np.int64)
    if scale_up != 1:
        return ticks * scale_up
    if scale_down != 1:
        return np.floor_divide(ticks, scale_down)
    return ticks


def tumbling_window(
    ds: ray.data.Dataset,
    *,
    ts_col: str,
    key_cols: list[str],
    window: str | int,
    sums: dict[str, str] | None = None,
    means: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    count_name: str | None = "n",
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Tumbling-window aggregate: one row per (key, window).

    ``window`` is a size in seconds (int) or a string like "1h"/"10m"/"30s".
    The emitted ``window_start`` is the window's inclusive start timestamp.
    """
    size_us = _parse_window_us(window)

    def assign(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        us = _ts_us(ts)
        start = (us // size_us) * size_us
        # the window key rides the aggregate as int64 ticks, cast to
        # timestamp[us] only in the final _pin_us map: Ray's sort-groupby
        # degrades a null-containing timestamp key to a pickled-object
        # extension column, while a null int64 key stays int64
        col = pa.array(start, pa.int64())
        if ts.null_count:
            # SQL GROUP BY time_bucket(NULL) is the NULL window group —
            # never a garbage epoch window from the NaN→int64 tick cast
            col = pc.if_else(pc.is_valid(ts), col,
                             pa.scalar(None, pa.int64()))
        return t.append_column(window_col, col)

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    out = grouped_aggregate(assigned, key_cols + [window_col], sums=sums,
                            means=means, mins=mins, maxs=maxs,
                            count_name=count_name)
    return _pin_us(out, window_col)


def sliding_window(
    ds: ray.data.Dataset,
    *,
    ts_col: str,
    key_cols: list[str],
    window: str | int,
    slide: str | int,
    sums: dict[str, str] | None = None,
    count_name: str | None = "n",
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Sliding-window aggregate: each event joins every window covering it
    (window/slide ratio bounds the fan-out; rows are replicated with
    ``np.repeat``, vectorized)."""
    size_us = _parse_window_us(window)
    slide_us = _parse_window_us(slide)
    if size_us % slide_us != 0:
        raise ValueError("window must be a multiple of slide")
    fanout = size_us // slide_us

    def assign(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t[ts_col])
        if t.num_rows and not pc.all(valid).as_py():
            # a null timestamp covers no window (the SQL range-join a
            # sliding window desugars to never matches NULL)
            t = t.filter(valid)
        us = _ts_us(t[ts_col])
        n = len(us)
        # windows covering ts: starts = floor(ts/slide)*slide - k*slide for
        # k in [0, fanout) where start + size > ts
        base = (us // slide_us) * slide_us
        idx = np.repeat(np.arange(n), fanout)
        k = np.tile(np.arange(fanout, dtype=np.int64), n)
        starts = base[idx] - k * slide_us
        keep = starts + size_us > us[idx]
        idx, starts = idx[keep], starts[keep]
        out = t.take(pa.array(idx))
        return out.append_column(
            window_col, pa.array(starts).cast(pa.timestamp("us")))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    out = grouped_aggregate(assigned, key_cols + [window_col], sums=sums,
                            count_name=count_name)
    return _pin_us(out, window_col)


def session_window(
    ds: ray.data.Dataset,
    *,
    ts_col: str,
    key_col: str,
    gap: str | int,
    count_name: str = "n",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Session windows per key: events closer than ``gap`` merge into one
    session. Emits (key, session_start, session_end, n).

    Scale shape: keys are hash-bucketed with the engine's partition-only
    exchange (``raycdc.shuffle.partition_map`` — no sort, no barrier) and each
    bucket gets ONE vectorized pass (dictionary-encode keys, int64 lexsort by
    (key, ts), gap diff → session boundaries). Work per bucket is O(rows log
    rows) with zero per-key Python calls — millions of keys cost P Python
    calls total, not one per key. Timestamps are converted through Arrow
    (``_ts_us``), never via pandas dtype coercion, so the gap unit is always
    microseconds regardless of the pandas/pyarrow version.
    """
    gap_us = _parse_window_us(gap)
    bcol = "__rcdc_sb"

    def add_bucket(t: pa.Table) -> pa.Table:
        # function-local import: ordered.py imports _ts_us from this module
        from raycdc.ops.ordered import _hash_bucket

        return _hash_bucket(t, key_col, bcol, num_partitions)

    def bucket_sessions(t: pa.Table) -> pa.Table:
        from raycdc.ops.ordered import _key_codes

        valid = pc.is_valid(t[ts_col])
        if t.num_rows and not pc.all(valid).as_py():
            # a session at an unknown instant is undefined; a NaN→int64
            # tick would otherwise sort first and corrupt the key's
            # session_start
            t = t.filter(valid)
        if t.num_rows == 0:
            return pa.table({})  # empty partition: contributes nothing
        codes, dictionary = _key_codes(t, key_col)
        us = _ts_us(t[ts_col])
        order = np.lexsort((us, codes))
        c, u = codes[order], us[order]
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = (c[1:] != c[:-1]) | ((u[1:] - u[:-1]) > gap_us)
        starts_idx = np.flatnonzero(new)
        last = np.empty(len(u), dtype=bool)
        last[-1] = True
        last[:-1] = new[1:]
        counts = np.diff(np.append(starts_idx, len(u)))
        return pa.table({
            key_col: dictionary.take(pa.array(c[starts_idx])),
            "session_start": pa.array(u[starts_idx]).cast(pa.timestamp("us")),
            "session_end": pa.array(u[last]).cast(pa.timestamp("us")),
            count_name: pa.array(counts.astype(np.int64)),
        })

    from raycdc.shuffle import partition_map

    def empty_schema():
        # evaluated ONLY when every partition came up empty: ds.schema()
        # may trigger partial upstream execution, so don't pay it on the
        # happy path; fully-empty upstream (schema None) falls back to a
        # string key so the result still carries the contracted columns
        s = ds.schema()
        try:
            key_type = dict(zip(s.names, s.types))[key_col]
        except (AttributeError, KeyError):
            key_type = pa.string()
        return pa.schema([
            (key_col, key_type), ("session_start", pa.timestamp("us")),
            ("session_end", pa.timestamp("us")), (count_name, pa.int64())])

    # batch_size=None → whole blocks per call: the body is one vectorized
    # pass, so Ray's 1024-row default would only multiply Python overhead
    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              batch_size=None)
    return partition_map(bucketed, bcol, num_partitions, bucket_sessions,
                         empty_schema=empty_schema)


def _parse_window_us(w: str | int) -> int:
    if isinstance(w, int):
        us = w * 1_000_000
    else:
        units = {"s": 1, "m": 60, "h": 3600, "d": 86400}
        unit = w[-1].lower()
        if unit not in units:
            raise ValueError(
                f"Bad window spec {w!r} (use e.g. '30s', '10m', '1h')")
        us = int(float(w[:-1]) * units[unit] * 1_000_000)
    if us <= 0:
        # a zero size would floor-divide every event into one garbage
        # window (numpy int64 // 0 == 0 with only a RuntimeWarning)
        raise ValueError(f"window size must be positive, got {w!r}")
    return us
