"""Multimodal plumbing (schemas, batching, stub gates) and ANN
strategies (LSH/IVF recall vs the brute-force baseline)."""
import pytest

import pyspark.sql.functions as F

from xtract import multimodal as mm
from xtract import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    df = mm.gen_media(spark, 90).cache()
    df.count()
    yield df
    df.unpersist()


def test_media_schema_and_determinism(spark, media):
    assert media.schema == mm.MEDIA
    a = sorted((r.media_id, bytes(r.payload)) for r in media.collect())
    b = sorted((r.media_id, bytes(r.payload)) for r in mm.gen_media(spark, 90).collect())
    assert a == b
    kinds = {r.kind for r in media.collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_fake_path(spark, media):
    dec = mm.decode(media).collect()
    assert len(dec) == 90
    img = [r for r in dec if r.kind == "image"][0]
    assert img.width and img.height and img.duration_ms is None
    au = [r for r in dec if r.kind == "audio"][0]
    assert au.width is None and au.duration_ms


def test_decode_foreign_bytes_hits_stub_gate(spark):
    import pandas as pd

    foreign = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["image"],
                "payload": [b"\x89PNG not really"],
                "meta": [
                    {
                        "mime": "image/png",
                        "width": 1,
                        "height": 1,
                        "duration_ms": None,
                        "sample_rate": None,
                    }
                ],
            }
        ),
        schema=mm.MEDIA,
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKEMM"):
        mm.decode(foreign).collect()


def test_frame_sampling(spark, media):
    frames = mm.sample_frames(media, every_ms=7000, max_frames=5).collect()
    assert frames
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for rows in by_id.values():
        rows.sort(key=lambda r: r.frame_idx)
        assert len(rows) <= 5
        assert [r.offset_ms for r in rows] == [7000 * i for i in range(len(rows))]
        assert all(len(bytes(r.frame)) == 32 for r in rows)


def test_embed_unit_norm(spark, media):
    vecs = mm.embed(media).collect()
    assert len(vecs) == 90
    for r in vecs[:10]:
        n = sum(v * v for v in r.embedding) ** 0.5
        assert abs(n - 1.0) < 1e-5


# ------------------------------------------------------------------ ANN
@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def exact(spark, emb):
    q = emb.filter(F.col("id") < 15)
    return {
        (r.query_id, r.rank): r.neighbor_id
        for r in sim.cosine_topk(emb, q, k=5).collect()
    }


def test_lsh_finds_planted_near_duplicates(spark):
    """On uniform random vectors LSH rightly prunes ~everything (true
    neighbors are barely above random similarity) — the operator's
    job is near-DUPLICATE detection, so test with planted dupes."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 64))
    dupes = base[:40] + 0.15 * rng.standard_normal((40, 64))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"id": range(200), "vec": [list(map(float, v)) for v in base]}
        )
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": range(1000, 1040),
                "vec": [list(map(float, v)) for v in dupes],
            }
        )
    )
    got = {
        r.query_id: r.neighbor_id
        for r in sim.lsh_topk(
            corpus, queries, k=1, n_planes=10, n_tables=6
        ).collect()
    }
    hits = sum(1 for i in range(40) if got.get(1000 + i) == i)
    assert hits / 40 >= 0.9, hits


def test_ivf_recall(spark, emb, exact):
    q = emb.filter(F.col("id") < 15)
    got = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(emb, q, k=5, n_cells=8, nprobe=4).collect()
    }
    hits = sum(1 for (qid, _), nid in exact.items() if (qid, nid) in got)
    recall = hits / len(exact)
    assert recall >= 0.6, recall


def test_exact_topk_is_sane(exact):
    assert len(exact) == 15 * 5


def test_resize_images_and_passthrough(spark):
    """resize: MEDIA → MEDIA; images re-decode with the target dims
    and a deterministic payload, audio/video pass through untouched —
    so the stage chains with decode/embed without plan changes."""
    from xtract import multimodal as mm

    media = mm.gen_media(spark, 30, partitions=4)
    resized = mm.resize(media, 224, 224)
    dec = {r.media_id: r for r in mm.decode(resized).collect()}
    orig = {r.media_id: r for r in media.collect()}
    assert len(dec) == 30
    for mid, r in dec.items():
        if orig[mid].kind == "image":
            assert (r.width, r.height) == (224, 224)
        else:
            # non-image payload bytes unchanged
            pass
    untouched = {
        r.media_id: bytes(r.payload)
        for r in resized.collect()
        if r.kind != "image"
    }
    for mid, buf in untouched.items():
        assert buf == bytes(orig[mid].payload)
    # deterministic: same input + dims → same bytes
    again = {
        r.media_id: bytes(r.payload)
        for r in mm.resize(media, 224, 224).collect()
    }
    assert again == {r.media_id: bytes(r.payload) for r in resized.collect()}
    # embeddings over resized images still unit-norm and consumable
    emb = mm.embed(resized).collect()
    assert len(emb) == 30
    for r in emb:
        n = sum(v * v for v in r.embedding) ** 0.5
        assert abs(n - 1.0) < 1e-5
