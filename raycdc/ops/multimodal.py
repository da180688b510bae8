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
        if self.decoder == "strict":
            # STUB: real image/audio decode requires codec libraries that are
            # not available in this environment.
            raise NotImplementedError(
                "media decode requires an image/audio codec library")
        # deterministic fake decode: content-hash-seeded feature vector
        data = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        h = int(data.astype(np.uint64).sum() * 2654435761 % (2**32))
        rng = np.random.default_rng((self.rng_seed << 32) | h)
        feat = rng.standard_normal(self.dim).astype(np.float32)
        feat[0] = len(data)  # keep one human-checkable component
        return feat

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        feats = np.stack([self._decode(p) for p in payloads]) if payloads else \
            np.zeros((0, self.dim), dtype=np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.dim)
        return t.append_column("features", col)


def extract_features(ds: ray.data.Dataset, payload_col: str = "payload",
                     *, dim: int = 64, decoder: str = "fake",
                     batch_size: int = 256,
                     concurrency=(1, 4)) -> ray.data.Dataset:
    """Feature-extract a binary column with an actor pool (small batches)."""
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_args=(payload_col, dim, decoder),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def frame_sample(ds: ray.data.Dataset, payload_col: str = "payload",
                 *, stride: int = 10, batch_size: int = 64) -> ray.data.Dataset:
    """'Frame sampling' over an opaque video-bytes column: emits one row per
    sampled frame offset with a sliced byte window (real slicing; real codec
    frame extraction is the stubbed part)."""

    def fn(t: pa.Table) -> pa.Table:
        rows = {name: [] for name in t.column_names}
        rows["frame_idx"] = []
        rows["frame_bytes"] = []
        for i in range(t.num_rows):
            payload = t[payload_col][i].as_py() or b""
            n_frames = max(1, len(payload) // max(stride, 1))
            for f in range(0, n_frames, stride):
                for name in t.column_names:
                    rows[name].append(t[name][i].as_py())
                rows["frame_idx"].append(f)
                rows["frame_bytes"].append(payload[f:f + stride])
        out = {name: pa.array(vals) for name, vals in rows.items()}
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
