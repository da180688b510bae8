"""Lake repartitioning (cdc/apply.repartition_lake): state-preserving
partition-count evolution. The repartitioned lake must read back byte-equal,
keep its tombstones, resume applies under the new layout to the same final
state, and become co-partition-joinable with lakes of the new count."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycdc.cdc import (apply_changelog, generate_changelog, read_lake,
                        read_manifest, repartition_lake)
from raycdc.cdc.apply import oracle_final_state
from raycdc.cdc.changelog import ChangelogSpec, generate_events

from tests.test_cdc import lake_state, url_text_digest

# seed=33 leaves final-state tombstones (urls whose LAST event is a delete)
# — test_repartition_keeps_tombstones needs at least one to be meaningful
SPEC = ChangelogSpec(num_events=8_000, num_urls=600, num_epochs=4, seed=33)


@pytest.fixture()
def fresh_lake(tmp_path):
    wal = str(tmp_path / "wal")
    generate_changelog(wal, SPEC)
    lake = str(tmp_path / "lake")
    return wal, lake


def oracle_prefix(k: int) -> pa.Table:
    ev = generate_events(SPEC)
    return oracle_final_state(ev.filter(pc.less_equal(ev["epoch"], k)))


def test_repartition_preserves_state_both_directions(fresh_lake):
    wal, lake = fresh_lake
    apply_changelog(wal, lake, num_partitions=4)
    before = url_text_digest(lake_state(lake))
    for new_p in (8, 2):
        m = repartition_lake(lake, new_p)
        assert not m["noop"] and m["num_partitions"] == new_p
        assert read_manifest(lake).num_partitions == new_p
        assert url_text_digest(lake_state(lake)) == before


def test_repartition_keeps_tombstones(fresh_lake):
    wal, lake = fresh_lake
    apply_changelog(wal, lake, num_partitions=4)

    def counts(l):
        full = pa.concat_tables(list(read_lake(l, include_deleted=True)
                                     .iter_batches(batch_format="pyarrow")))
        live = pa.concat_tables(list(read_lake(l)
                                     .iter_batches(batch_format="pyarrow")))
        return full.num_rows, live.num_rows

    full0, live0 = counts(lake)
    assert full0 > live0  # the fixture has deletes
    repartition_lake(lake, 8)
    assert counts(lake) == (full0, live0)


def test_apply_resumes_under_new_layout(fresh_lake):
    """Replay half the WAL at 4 partitions, repartition to 8, replay the
    rest at 8 — the final state must equal the full-replay oracle."""
    wal, lake = fresh_lake
    apply_changelog(wal, lake, num_partitions=4, epochs=[0, 1])
    repartition_lake(lake, 8)
    with pytest.raises(ValueError, match="partitions"):
        apply_changelog(wal, lake, num_partitions=4)  # old count now rejected
    apply_changelog(wal, lake, num_partitions=8)
    assert url_text_digest(lake_state(lake)) \
        == url_text_digest(oracle_prefix(SPEC.num_epochs - 1))


def test_noop_on_same_count(fresh_lake):
    wal, lake = fresh_lake
    apply_changelog(wal, lake, num_partitions=4)
    v = read_manifest(lake).version
    m = repartition_lake(lake, 4)
    assert m["noop"] and read_manifest(lake).version == v


def test_cojoin_after_repartition(fresh_lake, tmp_path):
    """Repartitioning one lake to another's count makes them joinable with
    zero exchange (the cojoin mismatch error's own advice)."""
    from raycdc.cdc.cojoin import copartitioned_lake_join
    from raycdc.joins import hash_join

    wal, lake = fresh_lake
    apply_changelog(wal, lake, num_partitions=4)
    other = str(tmp_path / "other")
    apply_changelog(wal, other, num_partitions=8)
    with pytest.raises(ValueError, match="not co-partitioned"):
        copartitioned_lake_join(lake, other)
    repartition_lake(lake, 8)
    got = pa.concat_tables(list(
        copartitioned_lake_join(lake, other, columns_a=["seq"],
                                columns_b=["seq"])
        .iter_batches(batch_format="pyarrow")))
    # both lakes replay the same WAL: every live url matches itself
    live = lake_state(lake)
    assert got.num_rows == live.num_rows
    assert pc.all(pc.equal(got["seq_a"], got["seq_b"])).as_py()
