"""Training-data operator tests (dedup / ANN / text / multimodal / agg)."""

import numpy as np
import pyarrow as pa
import ray.data

from raycdc.agg import grouped_aggregate
from raycdc.ops.ann import brute_force_topk, lsh_topk
from raycdc.ops.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
)
from raycdc.ops.multimodal import BinaryFeatureExtractor, extract_features
from raycdc.ops.text import (
    Fingerprinter,
    LangId,
    QualityScorer,
    add_token_count,
)


def to_table(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def docs_ds():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs to the hills",
        "the quick brown fox jumps over the lazy dog and runs to the hill",
        "der hund läuft nicht mit der katze und das ist ein problem auf jeden",
        "le chat est dans la maison et il ne veut pas sortir pour le moment",
        "the quick brown fox jumps over the lazy dog and runs to the hills",
        "completely unrelated text about databases, queries, and shuffles!!!",
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def test_token_count():
    out = to_table(add_token_count(docs_ds()))
    t0 = out.filter(pa.compute.equal(out["doc_id"], 0))["n_tokens"][0].as_py()
    assert t0 == 14


def test_quality_scorer():
    out = QualityScorer()(to_table(docs_ds()))
    q = dict(zip(out["doc_id"].to_pylist(), out["quality"].to_pylist()))
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert out["stop_ratio"].to_pylist()[0] > 0.1  # English stopwords present


def test_lang_id():
    out = LangId()(to_table(docs_ds()))
    pred = dict(zip(out["doc_id"].to_pylist(), out["lang_pred"].to_pylist()))
    assert pred[0] == "en"
    assert pred[2] == "de"
    assert pred[3] == "fr"


def test_fingerprint_deterministic_and_shift_stable():
    fp = Fingerprinter()
    t = to_table(docs_ds())
    out1, out2 = fp(t), fp(t)
    assert out1["fp_full"].to_pylist() == out2["fp_full"].to_pylist()
    # identical texts → identical fingerprints
    fps = out1["fp_full"].to_pylist()
    assert fps[0] == fps[4]
    assert fps[0] != fps[5]


def test_exact_dedup():
    out = to_table(exact_dedup(docs_ds(), num_partitions=2))
    # texts 0 and 4 are identical → survivor is doc_id 0
    assert out.num_rows == 5
    assert 0 in out["doc_id"].to_pylist()
    assert 4 not in out["doc_id"].to_pylist()


def test_minhash_lsh_finds_near_dups():
    out = to_table(minhash_lsh_pairs(docs_ds(), threshold=0.6))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 4) in pairs          # exact duplicate
    assert (0, 1) in pairs          # near duplicate (one char)
    assert all(b != 5 for _, b in pairs)  # unrelated text is not a dup
    assert ngram_jaccard("abcdefgh", "abcdefgh") == 1.0


def test_simhash_finds_near_dups():
    out = to_table(simhash_pairs(docs_ds(), max_hamming=4))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 4) in pairs


def test_embedding_dup_pairs():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((10, 16))
    vecs = np.vstack([base, base[0] + 0.001 * rng.standard_normal(16)])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(11), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    out = to_table(embedding_dup_pairs(ds, threshold=0.99))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 10) in pairs


def test_brute_force_topk_matches_numpy():
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((200, 8))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    qids = np.array([0, 1], dtype=np.int64)
    qmat = vecs[:2].astype(np.float64)
    out = to_table(brute_force_topk(ds, (qids, qmat), k=5, batch_size=64))
    # exact numpy reference (note: corpus vectors round-trip through float32)
    v32 = vecs.astype(np.float32).astype(np.float64)
    unit = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    qunit = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    for qi in range(2):
        sims = qunit[qi] @ unit.T
        expect = set(np.argsort(-sims)[:5])
        got = {r for q, r in zip(out["query_id"].to_pylist(),
                                 out["vec_id"].to_pylist()) if q == qids[qi]}
        assert got == expect


def test_ivf_topk_full_probe_equals_brute_force():
    from raycdc.ops.ann import ivf_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 16))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    q = (np.array([0, 5], dtype=np.int64), vecs[[0, 5]].astype(np.float64))
    # nprobe == nlist → every cell probed → identical to brute force
    ivf = to_table(ivf_topk(ds, q, k=8, nlist=8, nprobe=8)).to_pandas()
    bf = to_table(brute_force_topk(ds, q, k=8)).to_pandas()
    key = ["query_id", "rank"]
    ivf = ivf.sort_values(key).reset_index(drop=True)
    bf = bf.sort_values(key).reset_index(drop=True)
    assert (ivf["vec_id"] == bf["vec_id"]).all()


def test_ivf_topk_partial_probe_recall():
    from raycdc.ops.ann import ivf_topk

    rng = np.random.default_rng(8)
    # clustered corpus: IVF with few probes should still find neighbors
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.vstack([c + 0.3 * rng.standard_normal((40, 16)) for c in centers])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    q = (np.array([0], dtype=np.int64), vecs[[0]].astype(np.float64))
    ivf = to_table(ivf_topk(ds, q, k=10, nlist=8, nprobe=2)).to_pandas()
    bf = to_table(brute_force_topk(ds, q, k=10)).to_pandas()
    recall = len(set(ivf["vec_id"]) & set(bf["vec_id"])) / 10
    assert recall >= 0.8


def test_lsh_topk_schema():
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((100, 8))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    out = to_table(lsh_topk(ds, (np.array([0]), vecs[:1]), k=3))
    assert set(out.column_names) == {"query_id", "vec_id", "cosine", "rank"}
    assert out.num_rows >= 1


def test_multimodal_feature_stub():
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"\x01\x02\x03" * 50, b"\xff" * 10], pa.binary()),
    }))
    out = to_table(extract_features(ds, dim=16))
    feats = out["features"].to_pylist()
    assert len(feats[0]) == 16
    assert feats[0][0] == 150.0  # first component = payload length
    # strict decoder is a marked stub
    import pytest
    with pytest.raises(NotImplementedError):
        BinaryFeatureExtractor(decoder="strict")._decode(b"x")


def test_grouped_aggregate(sf_dir):
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity"])
    out = to_table(grouped_aggregate(
        li, ["l_returnflag"],
        sums={"sum_qty": "l_quantity"},
        means={"avg_qty": "l_quantity"},
        count_name="n")).to_pandas().set_index("l_returnflag")
    import duckdb
    ref = duckdb.sql(
        f"SELECT l_returnflag, sum(l_quantity) sum_qty, avg(l_quantity) avg_qty,"
        f" count(*) n FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
    ).df().set_index("l_returnflag")
    for flag in ref.index:
        assert abs(out.loc[flag, "sum_qty"] - ref.loc[flag, "sum_qty"]) < 1e-6
        assert abs(out.loc[flag, "avg_qty"] - ref.loc[flag, "avg_qty"]) < 1e-9
        assert out.loc[flag, "n"] == ref.loc[flag, "n"]


def test_grouped_aggregate_salted_equals_unsalted(sf_dir):
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity"])

    def run(salt):
        return to_table(grouped_aggregate(
            li, ["l_returnflag"], sums={"sum_qty": "l_quantity"},
            means={"avg_qty": "l_quantity"}, count_name="n",
            salt=salt)).to_pandas().set_index("l_returnflag").sort_index()

    a, b = run(0), run(8)
    assert (a["n"] == b["n"]).all()
    assert (abs(a["sum_qty"] - b["sum_qty"]) < 1e-9).all()
    assert (abs(a["avg_qty"] - b["avg_qty"]) < 1e-12).all()


def test_top_k():
    from raycdc.agg import top_k

    t = pa.table({"id": pa.array(range(1000), pa.int64()),
                  "v": pa.array([i % 97 for i in range(1000)], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)
    out = to_table(top_k(ds, ["v", "id"], 5, descending=[True, False]))
    df = out.to_pandas().sort_values(["v", "id"],
                                     ascending=[False, True])
    # global max v is 96 (ids 96, 193, 290, ...); ties break by min id
    assert df["v"].tolist() == [96] * 5
    assert df["id"].tolist() == [96, 193, 290, 387, 484]


def test_approx_distinct_accuracy_and_merge_invariance():
    from raycdc.ops.sketch import approx_distinct

    n_distinct = 40_000
    vals = pa.array([f"u{i % n_distinct}" for i in range(120_000)])
    t = pa.table({"v": vals})
    est1 = to_table(approx_distinct(
        ray.data.from_arrow(t), "v"))["approx_distinct"][0].as_py()
    assert abs(est1 - n_distinct) / n_distinct < 0.03
    # merge invariance: a different block layout gives the SAME sketch
    est2 = to_table(approx_distinct(
        ray.data.from_arrow(t).repartition(16), "v"))["approx_distinct"][0].as_py()
    assert est1 == est2


def test_heavy_hitters_exact():
    from raycdc.ops.sketch import heavy_hitters

    # 1 item at 30%, 1 at 10%, the rest spread thin across batches
    vals = (["hot"] * 3000 + ["warm"] * 1000
            + [f"cold{i}" for i in range(6000)])
    rng = np.random.default_rng(11)
    vals = [vals[i] for i in rng.permutation(len(vals))]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    out = to_table(heavy_hitters(ds, "v", threshold_frac=0.05)).to_pandas()
    got = dict(zip(out["v"], out["n"]))
    assert got == {"hot": 3000, "warm": 1000}  # exact counts, no cold items


def test_normalize_text_and_extract_host():
    from raycdc.ops.text import extract_host, normalize_text

    t = pa.table({"text": ["  Hello\t\nWORLD  x ", None],
                  "url": ["HTTPS://User@Example.COM:8080/a/b?q=1",
                          "example.org/path"]})
    out = to_table(normalize_text(ray.data.from_arrow(t)))
    assert out["text_norm"].to_pylist() == ["hello world x", None]
    out = to_table(extract_host(ray.data.from_arrow(t)))
    assert out["host"].to_pylist() == ["example.com", "example.org"]


def test_resize_images_fake_decoder():
    from raycdc.ops.multimodal import ImageResizer, resize_images

    # 4x4 gradient raster resized to 2x2 picks the nearest-neighbour corners
    img = bytes(range(16))
    t = pa.table({"payload": pa.array([img, None], pa.binary()),
                  "width": pa.array([4, 4], pa.int32()),
                  "height": pa.array([4, 0], pa.int32())})
    out = to_table(resize_images(ray.data.from_arrow(t),
                                 target_w=2, target_h=2))
    first = out["resized"][0].as_py()
    assert first == [0, 2, 8, 10]
    assert out["resized"][1].as_py() == [0, 0, 0, 0]  # invalid dims -> zeros
    import pytest as _pytest
    with _pytest.raises(Exception):
        to_table(resize_images(ray.data.from_arrow(t), target_w=2,
                               target_h=2, decoder="strict"))


def test_resize_images_mixed_sizes_and_sliced_offsets():
    # the batched buffer gather must honour per-image (w, h) AND a nonzero
    # Arrow slice offset (buffers are read with arr.offset arithmetic)
    from raycdc.ops.multimodal import ImageResizer

    imgs = [bytes(range(16)),          # 4x4
            bytes([9]),                # junk row, sliced away below
            bytes(range(0, 36)),       # 6x6
            bytes(range(4))]           # 2x2
    t = pa.table({"payload": pa.array(imgs, pa.binary()),
                  "width": pa.array([4, 1, 6, 2], pa.int32()),
                  "height": pa.array([4, 1, 6, 2], pa.int32())})
    r = ImageResizer(target_w=2, target_h=2)
    sliced = t.slice(2)  # nonzero offset view
    out = r(sliced)
    assert out["resized"][0].as_py() == [0, 3, 18, 21]   # 6x6 corners
    assert out["resized"][1].as_py() == [0, 1, 2, 3]     # identity 2x2
    full = r(t)
    assert full["resized"][0].as_py() == [0, 2, 8, 10]
    assert full["resized"][2].as_py() == [0, 3, 18, 21]


def test_review_fix_null_edges():
    # null width/height metadata -> zeros (not a batch crash)
    from raycdc.ops.multimodal import resize_images

    t = pa.table({"payload": pa.array([bytes(range(16))], pa.binary()),
                  "width": pa.array([None], pa.int32()),
                  "height": pa.array([4], pa.int32())})
    out = to_table(resize_images(ray.data.from_arrow(t), target_w=2,
                                 target_h=2))
    assert out["resized"][0].as_py() == [0, 0, 0, 0]

    # heavy hitters: the NULL group counts like SQL GROUP BY
    from raycdc.ops.sketch import heavy_hitters

    vals = pa.array(["a"] * 30 + [None] * 40 + [f"x{i}" for i in range(30)])
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(4)
    out = to_table(heavy_hitters(ds, "v", threshold_frac=0.2)).to_pandas()
    got = dict(zip(out["v"], out["n"]))
    assert got.get("a") == 30
    nulls = out[out["v"].isna()]
    assert len(nulls) == 1 and nulls["n"].iloc[0] == 40

    # normalize_text leaves non-RE2 whitespace edges alone (like SQL trim)
    from raycdc.ops.text import normalize_text

    t = pa.table({"text": ["hi\x0b", "  A  b "]})
    out = to_table(normalize_text(ray.data.from_arrow(t)))
    assert out["text_norm"].to_pylist() == ["hi\x0b", "a b"]


def test_heavy_hitters_all_null_and_empty_session():
    # all-null column: the NULL group alone must survive (SQL semantics)
    from raycdc.ops.sketch import heavy_hitters
    from raycdc.ops.window import session_window

    t = pa.table({"v": pa.array([None] * 50, pa.string())})
    out = to_table(heavy_hitters(ray.data.from_arrow(t),
                                 "v", threshold_frac=0.2)).to_pandas()
    assert len(out) == 1 and out["n"].iloc[0] == 50 and out["v"].isna().all()

    # empty-upstream session_window returns the contracted columns
    ds = ray.data.from_items([])
    res = session_window(ds, ts_col="ts", key_col="user_id", gap="30m")
    tabs = list(res.iter_batches(batch_format="pyarrow"))
    got = pa.concat_tables(tabs) if tabs else res.schema()
    names = got.column_names if isinstance(got, pa.Table) else got.names
    assert names == ["user_id", "session_start", "session_end", "n"]
