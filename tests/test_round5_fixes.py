"""Round-5 fixes: the two-level (√P) exchange for very large partition
counts (VERDICT r4 #7) — unchanged results, bounded driver ref counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from raycdc import shuffle
from raycdc.shuffle import last_exchange_stats, partition_map


def to_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


def _mk_ds(P: int, n: int = 20_000, blocks: int = 32):
    rng = np.random.default_rng(5)
    k = rng.integers(0, 100_000, n).astype(np.int64)
    v = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"k": pa.array(k), "v": pa.array(v),
                  "__p": pa.array(k % P)})
    step = -(-n // blocks)
    tabs = [t.slice(i, step) for i in range(0, n, step)]
    return ray.data.from_arrow(tabs), t


def _grouped_sum(ds, P):
    return to_table(partition_map(
        ds, "__p", P,
        lambda t: t.group_by("k").aggregate([("v", "sum")])))


def _canon(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().sort_values("k").reset_index(drop=True)


@pytest.mark.parametrize("P", [1536, 1057])  # 1057: ragged tail, gs == 1
def test_two_level_exchange_matches_single_level(P, monkeypatch):
    ds, t = _mk_ds(P)
    got2 = _grouped_sum(ds, P)
    stats2 = dict(last_exchange_stats)
    assert stats2["level"] == "two"

    monkeypatch.setattr(shuffle, "_TWO_LEVEL_MIN_PARTITIONS", 1 << 30)
    got1 = _grouped_sum(ds, P)
    stats1 = dict(last_exchange_stats)
    assert stats1["level"] == "one"

    want = (t.to_pandas().groupby("k", as_index=False)["v"].sum()
            .rename(columns={"v": "v_sum"}))
    pd.testing.assert_frame_equal(_canon(got2), _canon(got1))
    pd.testing.assert_frame_equal(
        _canon(got2), want.sort_values("k").reset_index(drop=True))
    # the point of the plan: the driver holds ~√P-bounded split refs
    assert stats2["split_refs"] * 4 < stats1["split_refs"]


def test_two_level_ref_growth_is_sqrt_p():
    """At a synthetic high P with many blocks, the two-level footprint is
    chunks×√P (level 1) + P×ceil(chunks/√P) (level 2) ≈ 2×chunks×√P —
    a √P/2 reduction over single-level's chunks×P (the VERDICT r4 #7
    10^9-ref scenario scaled down)."""
    P = 4096  # S = 64
    ds, _ = _mk_ds(P, n=8_192, blocks=512)  # 512 blocks → 128 split chunks
    _grouped_sum(ds, P)
    stats = dict(last_exchange_stats)
    assert stats["level"] == "two"
    s, chunks = 64, 128
    expected = chunks * s + P * -(-chunks // s)  # 8,192 + 8,192
    single_level = chunks * P                    # 524,288
    assert stats["split_refs"] == expected
    assert stats["split_refs"] * (s // 2) == single_level


def test_two_level_drops_partition_col_like_single_level():
    P = 2048
    ds, _ = _mk_ds(P, n=4_000, blocks=8)
    out = to_table(partition_map(ds, "__p", P, lambda t: t))
    assert "__p" not in out.column_names
    kept = to_table(partition_map(ds, "__p", P, lambda t: t,
                                  drop_partition_col=False))
    assert "__p" in kept.column_names
    assert out.num_rows == kept.num_rows == 4_000


def test_cdc_apply_two_level_split_matches_oracle(tmp_path):
    """The flagship merge path above the two-level threshold: replaying a
    WAL into a 1,200-partition lake must produce the exact LWW oracle
    state and a clean deep fsck (same plan family as partition_map's
    √P exchange)."""
    import pyarrow.compute as pc

    from raycdc.cdc import apply_changelog, generate_changelog
    from raycdc.cdc.apply import oracle_final_state
    from raycdc.cdc.changelog import ChangelogSpec, generate_events
    from raycdc.cdc.fsck import check_lake

    from tests.test_cdc import lake_state, url_text_digest

    spec = ChangelogSpec(num_events=6_000, num_urls=400, num_epochs=2,
                         seed=17)
    wal = str(tmp_path / "wal")
    generate_changelog(wal, spec)
    lake = str(tmp_path / "lake")
    apply_changelog(wal, lake, num_partitions=1_200)

    got = lake_state(lake)
    want = oracle_final_state(generate_events(spec))
    want = want.take(pc.sort_indices(want,
                                     sort_keys=[("url", "ascending")]))
    assert url_text_digest(got) == url_text_digest(want)
    assert got.num_rows == want.num_rows

    rep = check_lake(lake, deep=True)
    assert rep["ok"], rep["errors"][:3]
