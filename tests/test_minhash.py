"""minhash.py: kernel-vs-naive equality, S-curve behavior, planted
near-dup recall of the 128-perm / 32x4 banding pipeline."""
import random

import pandas as pd
import pytest

from xtract import minhash as mh


def test_signature_matches_naive_oracle():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "7、证明三角形内角和为一百八十度并写出完整的推理过程。（10分）",
        "short",
        "混合 mixed 内容 content 123 with digits",
    ]
    for t in texts:
        got = mh.signature_np(t)
        want = mh.signature_naive(t)
        assert got is not None and want is not None
        assert got.tolist() == want


def test_too_short_yields_none():
    assert mh.signature_np("abcd") is None
    assert mh.signature_naive("abcd") is None
    assert mh.signature_np("") is None


def test_estimated_jaccard_endpoints():
    a = mh.signature_np("a completely self-similar document body " * 4)
    assert mh.estimated_jaccard(a.tolist(), a.tolist()) == 1.0
    b = mh.signature_np("厨房里的铜壶在黄昏时分发出暗淡的光泽与声响")
    assert mh.estimated_jaccard(a.tolist(), b.tolist()) < 0.2


def _corpus(n_base=40, seed=20260817):
    r = random.Random(seed)
    words = [f"w{r.randrange(9999):04d}" for _ in range(400)]
    rows = []
    planted = []
    for i in range(n_base):
        body = " ".join(r.choice(words) for _ in range(60))
        rows.append({"doc_id": i, "text": body})
        # planted near-dup: ~10% of the words replaced → Jaccard on
        # 5-char shingles well above the 0.42 banding midpoint
        toks = body.split(" ")
        for j in range(len(toks)):
            if r.random() < 0.10:
                toks[j] = r.choice(words)
        rows.append({"doc_id": 1000 + i, "text": " ".join(toks)})
        planted.append((i, 1000 + i))
    return rows, planted


def test_planted_dup_recall_and_precision(spark):
    rows, planted = _corpus()
    docs = spark.createDataFrame(
        pd.DataFrame(rows), schema="doc_id long, text string"
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in mh.candidate_pairs(docs, max_bucket=50).collect()
    }
    hits = sum(1 for p in planted if p in pairs)
    recall = hits / len(planted)
    assert recall >= 0.9, (recall, len(pairs))
    # random unrelated pairs must stay out: candidates beyond the
    # planted ones should be rare (S-curve low tail)
    extras = len(pairs) - hits
    assert extras <= len(planted) // 2, (extras, len(pairs))


def test_band_keys_shape(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": "abcdefghij klmnop qrstuv"}]),
        schema="doc_id long, text string",
    )
    bk = mh.band_keys(mh.signatures(docs)).collect()
    assert len(bk) == mh.BANDS
    assert {r.band for r in bk} == set(range(mh.BANDS))


from hypothesis import given, settings, strategies as st


@given(st.text(max_size=600))
@settings(max_examples=150, deadline=None)
def test_kernel_naive_equality_fuzz(text):
    got = mh.signature_np(text)
    want = mh.signature_naive(text)
    if want is None:
        assert got is None
    else:
        assert got is not None and got.tolist() == want
