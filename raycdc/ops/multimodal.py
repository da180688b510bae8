"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata columns
(mime, width/height or sample rate, ...). The Ray-side plumbing — schema,
small-batch actor pools, output layout — is real and tested; the actual codec
work is stubbed because no image/audio libraries exist in this container:

- ``decoder="strict"`` raises NotImplementedError at the decode call site
  (the marked stub), preserving the real control flow.
- ``decoder="fake"`` derives a deterministic feature vector from the payload
  bytes (content-hash seeded), so pipelines and tests can run end to end.

Batch sizing note: wide binary payloads need SMALL batches (default 256) so
batch x concurrency fits in a worker heap — see SURVEY.md §4 memory row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload → fixed-size float32 feature vector.

    ``__init__`` is where a real model/codec would be loaded once per actor;
    the fake decoder only sets up the projection seed.
    """

    def __init__(self, payload_col: str = "payload", dim: int = 64,
                 decoder: str = "fake", seed: int = 5):
        self.payload_col = payload_col
        self.dim = dim
        self.decoder = decoder
        self.rng_seed = seed

    def _decode(self, payload: bytes) -> np.ndarray:
        """Single-payload decode — the strict stub's call site and the
        one-row case of the vectorized batch kernel."""
        if self.decoder == "strict":
            # STUB: real image/audio decode requires codec libraries that are
            # not available in this environment.
            raise NotImplementedError(
                "media decode requires an image/audio codec library")
        data = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        return self._features(
            np.array([data.astype(np.uint64).sum()], np.uint64),
            np.array([len(data)], np.int64))[0]

    @staticmethod
    def _mix64(x: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — a vectorized integer mixer giving each
        (payload-hash, component) pair an independent pseudo-random word."""
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def _features(self, sums: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Content-hash-seeded fake features for a whole batch in one numpy
        pass: Box-Muller over two splitmix64 streams keyed by (actor seed,
        payload content hash, component index). Deterministic for a given
        (seed, payload) regardless of batch layout."""
        n = len(sums)
        h = (sums * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        base = (np.uint64(self.rng_seed) << np.uint64(32)) | h
        j = np.arange(self.dim, dtype=np.uint64)
        w1 = self._mix64(base[:, None] + j[None, :] * np.uint64(
            0x9E3779B97F4A7C15))
        w2 = self._mix64(w1 + np.uint64(0xD1B54A32D192ED03))
        # 53-bit mantissa uniforms in (0, 1]; Box-Muller to normals
        u1 = ((w1 >> np.uint64(11)).astype(np.float64) + 1.0) / (2.0**53)
        u2 = (w2 >> np.uint64(11)).astype(np.float64) / (2.0**53)
        feat = (np.sqrt(-2.0 * np.log(u1))
                * np.cos(2.0 * np.pi * u2)).astype(np.float32)
        if n:
            feat[:, 0] = lens  # keep one human-checkable component
        return feat

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decoder == "strict":
            # STUB: preserve the real control flow — a production build
            # decodes here with the codec loaded in __init__.
            raise NotImplementedError(
                "media decode requires an image/audio codec library")
        n = t.num_rows
        if n == 0:
            feats = np.zeros((0, self.dim), dtype=np.float32)
        else:
            # byte sums straight off the Arrow offsets/values buffers (same
            # zero-copy approach as frame_sample) — no per-row .as_py()
            arr = t[self.payload_col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.cast(pa.large_binary())
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                                 count=len(arr) + 1, offset=arr.offset * 8)
            values = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
            csum = np.concatenate(
                [[np.uint64(0)],
                 np.cumsum(values, dtype=np.uint64)]).astype(np.uint64)
            sums = csum[offs[1:]] - csum[offs[:-1]]
            lens = np.diff(offs)
            # null/empty payloads decode as b"\x00": sum 0, length 1
            empty = lens == 0
            if arr.null_count:
                empty |= np.asarray(arr.is_null())
            sums[empty] = np.uint64(0)
            lens = np.where(empty, 1, lens)
            feats = self._features(sums, lens)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.dim)
        return t.append_column("features", col)


def _default_pool_size(cap: int = 4) -> int:
    """Fixed actor-pool size: 3/8 of the cluster's CPUs (flatten's rule),
    capped. NEVER the whole cluster: a fixed pool that reserves every CPU
    starves the upstream read tasks and DEADLOCKS the pipeline (seen at
    ray.init(num_cpus=4) with concurrency=4 — the pool held all 4 slots
    while the parquet read waited forever for one)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - uninitialized ray
        cpus = 8
    return max(1, min(cap, (cpus * 3) // 8))


def extract_features(ds: ray.data.Dataset, payload_col: str = "payload",
                     *, dim: int = 64, decoder: str = "fake",
                     batch_size: int = 256,
                     concurrency: int | None = None) -> ray.data.Dataset:
    """Feature-extract a binary column with an actor pool (small batches).

    FIXED concurrency int, never an autoscaling range (repo invariant):
    __init__ is the model-load site, and an autoscaling pool ramps actors
    lazily so each late actor pays its init serially while batches queue.
    Default: :func:`_default_pool_size` (a fraction of the cluster, so the
    read stage always keeps a CPU).
    """
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_args=(payload_col, dim, decoder),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool_size())


def frame_sample(ds: ray.data.Dataset, payload_col: str = "payload",
                 *, stride: int = 10, batch_size: int = 64) -> ray.data.Dataset:
    """'Frame sampling' over an opaque video-bytes column: emits one row per
    sampled frame offset with a sliced byte window (real slicing; real codec
    frame extraction is the stubbed part).

    Fully vectorized: row fan-out via ``np.repeat`` + ``Table.take`` and the
    byte windows gathered with one numpy index expression over the Arrow
    values buffer — no per-row ``.as_py()`` in the hot path.
    """
    stride_ = max(stride, 1)

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("frame_idx", pa.array([], pa.int64())) \
                    .append_column("frame_bytes", pa.array([], pa.binary()))
        arr = t[payload_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.cast(pa.large_binary())
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                             count=len(arr) + 1, offset=arr.offset * 8)
        values = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        lens = np.diff(offs)
        if arr.null_count:
            lens = np.where(np.asarray(arr.is_null()), 0, lens)
        n_frames = np.maximum(1, lens // stride_)
        k = -(-n_frames // stride_)  # frames per row = ceil(n_frames/stride)
        rep = np.repeat(np.arange(n, dtype=np.int64), k)
        row_start = np.cumsum(k) - k
        frame_idx = (np.arange(len(rep), dtype=np.int64)
                     - row_start[rep]) * stride_
        out_len = np.clip(lens[rep] - frame_idx, 0, stride_)
        starts = offs[:-1][rep] + frame_idx
        total = int(out_len.sum())
        intra = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(out_len) - out_len, out_len))
        gathered = values[np.repeat(starts, out_len) + intra]
        out_offs = np.concatenate([[0], np.cumsum(out_len)]).astype(np.int64)
        frame_bytes = pa.Array.from_buffers(
            pa.large_binary(), len(rep),
            [None, pa.py_buffer(out_offs.tobytes()),
             pa.py_buffer(gathered.tobytes())]).cast(pa.binary())
        out = t.take(pa.array(rep))
        return out.append_column("frame_idx", pa.array(frame_idx)) \
                  .append_column("frame_bytes", frame_bytes)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class ImageResizer:
    """Actor-pool stage: resize an image payload to (target_w, target_h).

    Real codec decode/resample is STUBBED (``decoder="strict"`` raises —
    no image libraries exist in this environment); ``decoder="fake"``
    treats the payload as a row-major byte raster of the row's declared
    (width, height) and nearest-neighbour samples it to the target size
    with one vectorized numpy gather per batch, so the schema, actor
    signature, batch sizing and output layout are all real and tested.
    """

    def __init__(self, payload_col: str = "payload", width_col: str = "width",
                 height_col: str = "height", target_w: int = 32,
                 target_h: int = 32, decoder: str = "fake"):
        self.payload_col = payload_col
        self.width_col, self.height_col = width_col, height_col
        self.tw, self.th = target_w, target_h
        self.decoder = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decoder == "strict":
            # STUB: real decode/resample needs an image codec library.
            raise NotImplementedError(
                "image resize requires an image codec library")
        import pyarrow.compute as pc

        n = t.num_rows
        out = np.zeros((n, self.th * self.tw), dtype=np.uint8)
        if n:
            # payload bytes come straight off the Arrow offsets/values
            # buffers (same approach as frame_sample above) — no per-image
            # .as_py() round-trip through Python bytes objects
            arr = t[self.payload_col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.cast(pa.large_binary())
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                                 count=len(arr) + 1, offset=arr.offset * 8)
            values = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
            lens = np.diff(offs)
            if arr.null_count:
                lens = np.where(np.asarray(arr.is_null()), 0, lens)
            # null dimension metadata -> 0 -> the invalid-dims guard emits
            # zeros (int(NaN) from a raw to_numpy would crash the batch)
            widths = pc.fill_null(t[self.width_col], 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            heights = pc.fill_null(t[self.height_col], 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            valid = (widths > 0) & (heights > 0) & (lens >= widths * heights)
            vi = np.flatnonzero(valid)
            if len(vi):
                ty, tx = np.meshgrid(np.arange(self.th), np.arange(self.tw),
                                     indexing="ij")
                ty, tx = ty.reshape(-1), tx.reshape(-1)
                # one broadcast index matrix + one gather for the whole batch
                sy = (ty[None, :] * heights[vi, None]) // self.th
                sx = (tx[None, :] * widths[vi, None]) // self.tw
                idx = offs[:-1][vi, None] + sy * widths[vi, None] + sx
                out[vi] = values[idx]
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.uint8()), self.th * self.tw)
        return t.append_column("resized", col)


def resize_images(ds: ray.data.Dataset, *, payload_col: str = "payload",
                  width_col: str = "width", height_col: str = "height",
                  target_w: int = 32, target_h: int = 32,
                  decoder: str = "fake", batch_size: int = 64,
                  concurrency: int | None = None) -> ray.data.Dataset:
    """Resize an image column with an actor pool (small batches: wide
    binary payloads × concurrency must fit the worker heap). FIXED
    concurrency int sized by :func:`_default_pool_size` — see
    :func:`extract_features`."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_args=(payload_col, width_col, height_col,
                             target_w, target_h, decoder),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool_size())
