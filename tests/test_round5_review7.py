"""Round-5 seventh review wave (entry/bench/changelog/pipeline/multimodal):
spec-validated WAL cache, pandas-block Pipeline inputs, and fixed actor
pools that must never reserve the whole cluster (the test_entry deadlock)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from raycdc.cdc.changelog import ChangelogSpec, generate_changelog
from raycdc.ops.multimodal import _default_pool_size, extract_features
from raycdc.pipeline import Pipeline


def test_changelog_cache_regenerates_on_spec_change(tmp_path):
    out = str(tmp_path / "wal")
    a = ChangelogSpec(num_events=400, num_urls=40, num_epochs=2, seed=1)
    paths_a = generate_changelog(out, a)
    assert len(paths_a) == 2 and all(os.path.exists(p) for p in paths_a)
    rows_a = sum(pq.read_table(p).num_rows for p in paths_a)
    assert rows_a == 400

    # same spec: served from cache (files untouched)
    mtimes = [os.path.getmtime(p) for p in paths_a]
    assert generate_changelog(out, a) == paths_a
    assert [os.path.getmtime(p) for p in paths_a] == mtimes

    # DIFFERENT spec on the same dir: regenerate, and a fewer-epoch respec
    # must not leave the old higher-numbered segment behind for globbers
    b = ChangelogSpec(num_events=200, num_urls=40, num_epochs=1, seed=2)
    paths_b = generate_changelog(out, b)
    assert len(paths_b) == 1
    assert sum(pq.read_table(p).num_rows for p in paths_b) == 200
    assert not os.path.exists(paths_a[1])  # stale events-00001 removed
    with open(os.path.join(out, "_COMPLETE")) as f:
        assert f.read().strip() == f"{b}"


class _IdentityStep:
    name = "identity"

    def schema_out(self, schema_in):
        return schema_in

    def validate(self, schema_in):
        return []

    def apply(self, ds):
        return ds


def test_pipeline_accepts_pandas_block_dataset():
    # from_pandas datasets report numpy dtypes from ds.schema(); run() must
    # convert them (or raise a clear error), never an opaque TypeError
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    ds = ray.data.from_pandas(df)
    out = Pipeline([_IdentityStep()]).run(ds)
    assert out.count() == 3


def test_fixed_pools_never_reserve_the_whole_cluster():
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    size = _default_pool_size()
    assert 1 <= size < cpus  # == cpus starves the read stage: deadlock

    # end-to-end at the session's small CPU count: this exact pipeline hung
    # forever when the pool reserved every CPU
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"ab", b"cdef"], pa.binary())})
    out = extract_features(ray.data.from_arrow(t), dim=4)
    assert out.count() == 2
