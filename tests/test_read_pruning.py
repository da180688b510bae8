"""read_lake(columns=...): pruned reads must equal the full read's column
selection on every lake layout — compacted, multi-file streaming runs, and
schema-evolved lakes where early files lack the requested column."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycdc.cdc import apply_changelog, generate_changelog, read_lake
from raycdc.cdc.changelog import ChangelogSpec

SPEC = ChangelogSpec(num_events=6_000, num_urls=500, num_epochs=2, seed=19)
EVO = ChangelogSpec(num_events=6_000, num_urls=3_000, num_epochs=4, seed=19,
                    evolve_from_epoch=3)


def collect(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


@pytest.fixture(scope="module")
def compacted(tmp_path_factory):
    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, SPEC)
    lake = str(tmp_path_factory.mktemp("c") / "lake")
    apply_changelog(wal, lake, num_partitions=4)
    return lake


@pytest.fixture(scope="module")
def streaming(tmp_path_factory):
    """Multi-file partition run sets (per-epoch actor commits, no compact)."""
    from raycdc.cdc.actors import CdcEngine

    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, SPEC)
    lake = str(tmp_path_factory.mktemp("s") / "lake")
    eng = CdcEngine(wal, lake, num_partitions=4)
    eng.tail(epochs_per_commit=1)
    eng.shutdown()
    return lake


@pytest.fixture(scope="module")
def evolved(tmp_path_factory):
    wal = str(tmp_path_factory.mktemp("wal"))
    generate_changelog(wal, EVO)
    lake = str(tmp_path_factory.mktemp("e") / "lake")
    for e in range(EVO.num_epochs):
        apply_changelog(wal, lake, num_partitions=4, epochs=[e])
    return lake


@pytest.mark.parametrize("fixture", ["compacted", "streaming", "evolved"])
def test_pruned_equals_selected(fixture, request):
    lake = request.getfixturevalue(fixture)
    cols = ["url", "lang"]
    pruned = collect(read_lake(lake, columns=cols))
    full = collect(read_lake(lake)).select(cols)
    assert pruned.column_names == cols
    assert pruned.equals(full)


def test_evolved_column_pruned_read(evolved):
    """Requesting the evolved column works even though early files lack it
    in their file schema (nulls where the winner predates the evolution)."""
    pruned = collect(read_lake(evolved, columns=["url", "title"]))
    full = collect(read_lake(evolved)).select(["url", "title"])
    assert pruned.equals(full)
    titles = pruned["title"]
    assert 0 < titles.null_count < len(titles)  # both generations present


def test_include_deleted_with_columns(compacted):
    pruned = collect(read_lake(compacted, include_deleted=True,
                               columns=["url", "seq"]))
    assert pruned.column_names == ["url", "seq", "_deleted"]
    full = collect(read_lake(compacted, include_deleted=True))
    assert pruned.equals(full.select(["url", "seq", "_deleted"]))


def test_unknown_column_raises(compacted):
    with pytest.raises(KeyError, match="not in lake schema"):
        read_lake(compacted, columns=["url", "nope"])
