"""Point lookup (cdc/apply.lookup_urls): hash-routed serving reads. Hits
return the LWW winner, misses and tombstones are absent, as-of lookups see
history, and the read touches only the partitions the keys hash to."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycdc.cdc import (apply_changelog, generate_changelog, lookup_urls,
                        read_manifest)
from raycdc.cdc.apply import _url_pid, oracle_final_state
from raycdc.cdc.changelog import ChangelogSpec, generate_events

from tests.test_cdc import lake_state

SPEC = ChangelogSpec(num_events=8_000, num_urls=600, num_epochs=4, seed=33)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, SPEC)
    lake = str(tmp_path_factory.mktemp("lk") / "lake")
    for e in range(SPEC.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    return lake


def test_hits_misses_and_tombstones(lake):
    live = lake_state(lake)
    hits = sorted(live["url"].to_pylist())[:6]
    ev = generate_events(SPEC)
    all_winners = oracle_final_state(ev)  # live only
    # a url whose LAST event is a delete (seed=33 guarantees some)
    page = ev["page"].combine_chunks()
    import pandas as pd

    df = pd.DataFrame({"url": page.field("url").to_pandas(),
                       "ts": page.field("fetch").field("warc_ts").to_pandas(),
                       "seq": ev["seq"].to_pandas(),
                       "op": ev["op"].to_pandas()})
    w = df.sort_values(["ts", "seq"]).groupby("url").tail(1)
    dead = w[w["op"] == "D"]["url"].tolist()
    assert dead
    never = ["https://nowhere.example/xyz"]
    got = lookup_urls(lake, hits + dead[:2] + never)
    assert sorted(got["url"].to_pylist()) == hits  # misses/tombstones absent
    by_url = {r["url"]: r for r in got.to_pylist()}
    want = {r["url"]: r for r in all_winners.to_pylist()}
    for u in hits:
        assert by_url[u]["text"] == want[u]["text"]
        assert by_url[u]["seq"] == want[u]["seq"]
    # include_deleted surfaces the tombstone row
    full = lookup_urls(lake, dead[:1], include_deleted=True)
    assert full.num_rows == 1 and full["_deleted"][0].as_py() is True


def test_as_of_lookup_sees_history(lake):
    ev = generate_events(SPEC)
    prefix = oracle_final_state(ev.filter(pc.less_equal(ev["epoch"], 0)))
    u = prefix["url"][0].as_py()
    got0 = lookup_urls(lake, [u], as_of_epoch=0)
    assert got0["text"][0].as_py() == prefix["text"][0].as_py()


def test_column_selection_and_sorted_output(lake):
    urls = sorted(lake_state(lake)["url"].to_pylist())[:8]
    got = lookup_urls(lake, list(reversed(urls)),
                      columns=["url", "seq"])
    assert got.column_names == ["url", "seq"]
    assert got["url"].to_pylist() == urls  # url-sorted regardless of input


def test_routing_touches_only_key_partitions(lake):
    """The urls' hash partitions are a strict subset of the lake's — the
    lookup's file set is bounded by the keys, not the corpus."""
    m = read_manifest(lake)
    urls = sorted(lake_state(lake)["url"].to_pylist())[:2]
    pids = {int(p) for p in _url_pid(
        pa.chunked_array([pa.array(urls, pa.string())]), m.num_partitions)}
    assert len(pids) <= 2 < m.num_partitions


def test_all_miss_returns_typed_empty(lake):
    got = lookup_urls(lake, ["https://never.example/a"])
    assert "url" in got.column_names
    # may or may not share a partition with real data; 0 rows either way
    assert got.num_rows == 0


def test_columns_without_url_still_sorted(lake):
    """A projection omitting the key must not crash the url-sort (ADVICE
    r4): sort happens before the projection, so values still arrive in
    url order."""
    urls = sorted(lake_state(lake)["url"].to_pylist())[:6]
    full = lookup_urls(lake, urls, columns=["url", "seq", "text"])
    got = lookup_urls(lake, list(reversed(urls)), columns=["seq", "text"])
    assert got.column_names == ["seq", "text"]
    assert got["seq"].to_pylist() == full["seq"].to_pylist()
    assert got["text"].to_pylist() == full["text"].to_pylist()
