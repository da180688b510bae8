"""Co-partitioned lake join (cdc/cojoin.py): partition-pairwise joins with
zero exchange must equal the generic hash_join over the same live states,
for every join type, including the self-join across two versions and
partitions absent on one side."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycdc.cdc import apply_changelog, generate_changelog, read_lake
from raycdc.cdc.changelog import ChangelogSpec
from raycdc.cdc.cojoin import copartitioned_lake_join
from raycdc.joins import hash_join

SPEC_A = ChangelogSpec(num_events=6_000, num_urls=500, num_epochs=2, seed=7)
SPEC_B = ChangelogSpec(num_events=4_000, num_urls=400, num_epochs=2, seed=8)


@pytest.fixture(scope="module")
def lakes(tmp_path_factory):
    out = []
    for name, spec in (("a", SPEC_A), ("b", SPEC_B)):
        wal = str(tmp_path_factory.mktemp(f"wal{name}"))
        generate_changelog(wal, spec)
        lake = str(tmp_path_factory.mktemp(f"cj{name}") / "lake")
        for e in range(spec.num_epochs):
            apply_changelog(wal, lake, num_partitions=4, epochs=[e])
        out.append(lake)
    return out


def collect(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in sorted(t.column_names)]))


def reference_join(lake_a, lake_b, join_type, **as_of):
    def side(lake, suffix, kw):
        ds = read_lake(lake, **kw)
        return ds.map_batches(
            lambda t, s=suffix: pa.table(
                {"url": t["url"],
                 **{f"{c}{s}": t[c] for c in t.column_names if c != "url"}}),
            batch_format="pyarrow")
    return hash_join(side(lake_a, "_a", as_of.get("a", {})),
                     side(lake_b, "_b", as_of.get("b", {})),
                     on=["url"], join_type=join_type, num_partitions=4,
                     strategy="shuffle")


@pytest.mark.parametrize("join_type", ["inner", "left_outer", "right_outer",
                                       "full_outer"])
def test_parity_with_hash_join(lakes, join_type):
    lake_a, lake_b = lakes
    got = collect(copartitioned_lake_join(lake_a, lake_b,
                                          join_type=join_type))
    want = collect(reference_join(lake_a, lake_b, join_type))
    assert got.num_rows == want.num_rows
    assert got.equals(want.select(got.column_names).cast(got.schema))


def test_self_join_across_versions(lakes):
    lake_a, _ = lakes
    got = collect(copartitioned_lake_join(
        lake_a, as_of_epoch_a=0, columns_a=["seq"], columns_b=["seq"]))
    want = collect(reference_join(lake_a, lake_a, "inner",
                                  a={"as_of_epoch": 0}))
    want = want.select(["url", "seq_a", "seq_b"])
    want = want.take(pc.sort_indices(
        want, sort_keys=[(c, "ascending") for c in sorted(want.column_names)]))
    assert got.equals(want.cast(got.schema))
    # the join is url-total: every url live at both versions appears once
    urls = got["url"].to_pylist()
    assert len(urls) == len(set(urls))


def test_column_selection_and_suffixes(lakes):
    lake_a, lake_b = lakes
    ds = copartitioned_lake_join(lake_a, lake_b, columns_a=["lang"],
                                 columns_b=["seq"], suffixes=("_old", "_new"))
    t = collect(ds)
    assert t.column_names == ["url", "lang_old", "seq_new"]
    assert t.num_rows > 0


def test_mismatched_partition_counts_raise(lakes, tmp_path):
    lake_a, _ = lakes
    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC_B)
    other = str(tmp_path / "lake8")
    apply_changelog(wal, other, num_partitions=8)
    with pytest.raises(ValueError, match="not co-partitioned"):
        copartitioned_lake_join(lake_a, other)


def test_semi_join_rejected(lakes):
    with pytest.raises(ValueError, match="semi/anti"):
        copartitioned_lake_join(lakes[0], lakes[1], join_type="left_semi")


def test_nested_payload_excluded_from_defaults(lakes, tmp_path):
    """merge_into admits nested payloads (e.g. fixed_size_list embeddings);
    Acero joins reject nested non-key fields, so defaults must skip them
    and an explicit request must fail upfront with a clear error
    (ADVICE r4)."""
    import numpy as np
    import ray.data
    from raycdc.cdc import merge_into

    lake_a, _ = lakes
    lake = str(tmp_path / "nested_lake")
    src = pa.table({
        "url": pa.array(["https://n.example/1", "https://n.example/2"]),
        "warc_ts": pa.array([np.datetime64("2030-01-01", "us")] * 2,
                            pa.timestamp("us")),
        "seq": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "de"]),
        "emb": pa.FixedSizeListArray.from_arrays(
            pa.array([0.1, 0.2, 0.3, 0.4], pa.float32()), 2),
    })
    merge_into(lake, ray.data.from_arrow(src), num_partitions=4)
    out = collect(copartitioned_lake_join(lake))  # defaults: no crash
    assert "emb_a" not in out.column_names and "emb_b" not in out.column_names
    assert out.num_rows == 2
    with pytest.raises(ValueError, match="nested"):
        copartitioned_lake_join(lake, columns_a=["emb"])
