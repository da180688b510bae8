"""Per-domain document cap (pipelines/curation.cap_per_host): cap
semantics, under-cap hosts kept whole, canonicalization feeding the host
key, and determinism across parallelism/partition counts."""

import pyarrow as pa
import ray.data

from raycdc.pipelines.curation import cap_per_host


def _docs(urls):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(urls))),
        "url": pa.array(urls, pa.string())}))


def test_cap_and_small_hosts_kept_whole():
    urls = ([f"http://big.com/p{i}" for i in range(10)]
            + ["http://small.org/a", "http://small.org/b"])
    out = cap_per_host(_docs(urls), max_per_host=3).to_pandas()
    by_host = out.groupby("host").size().to_dict()
    assert by_host == {"big.com": 3, "small.org": 2}


def test_canonicalization_unifies_host_spellings():
    # same registrable host under different case/port spellings
    urls = ["HTTP://Host.COM:80/a", "http://host.com/b",
            "https://HOST.com/c", "http://host.com/d"]
    out = cap_per_host(_docs(urls), max_per_host=2).to_pandas()
    assert set(out["host"]) == {"host.com"} and len(out) == 2


def test_deterministic_across_partitioning():
    urls = [f"http://h{i % 7}.net/{i}" for i in range(200)]
    a = cap_per_host(_docs(urls).repartition(1), max_per_host=5,
                     num_partitions=2).to_pandas()
    b = cap_per_host(_docs(urls).repartition(13), max_per_host=5,
                     num_partitions=16).to_pandas()
    key = ["doc_id", "host"]
    assert (a[key].sort_values(key).reset_index(drop=True)
            .equals(b[key].sort_values(key).reset_index(drop=True)))
    assert a.groupby("host").size().max() == 5
