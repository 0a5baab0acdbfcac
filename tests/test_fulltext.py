"""Full-text (cap=None) fingerprint/minhash kernels: chunked-kernel
exactness against the pure-Python oracles on multi-KB docs, and the
planted mid-document-duplicate recall that the capped kernels MISS —
the r2 semantic gap (prefix-only similarity) closed and pinned."""
import numpy as np
import pytest

from xtract import fingerprint as fp
from xtract import minhash as mh


def _doc(seed: int, n: int) -> str:
    """Deterministic pseudo-text (mixed ASCII/CJK, no RNG state)."""
    out = []
    x = (seed * 2654435761 + 99991) % (1 << 61)
    for _ in range(n):
        # LCG low bits are short-period — draw from the high bits only
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 61)
        r = (x >> 40) % 64
        out.append(chr(0x4E00 + ((x >> 20) % 512)) if r < 20 else chr(32 + r))
    return "".join(out)


# --------------------------------------------------------- exactness
@pytest.mark.parametrize("n", [40, 500, 3000])
def test_fingerprints_uncapped_matches_naive(n):
    t = _doc(7, n)
    got = fp.fingerprints_np(t, cap=None).tolist()
    assert got == fp.fingerprints_naive(t, cap=None)


def test_fingerprints_chunked_equals_single_pass(monkeypatch):
    """Chunk boundaries are invisible: with CHUNK forced tiny, the
    multi-chunk path must reproduce the single-pass fingerprint set
    bit-for-bit (overlap K+W-2 covers every hash window)."""
    t = _doc(11, 5000)
    want = fp.fingerprints_np(t, cap=None).tolist()
    for chunk in (64, 257, 1000, 4999, 5000):
        monkeypatch.setattr(fp, "CHUNK", chunk)
        assert fp.fingerprints_np(t, cap=None).tolist() == want, chunk
    monkeypatch.undo()


@pytest.mark.parametrize("n", [10, 400, 2500])
def test_signature_uncapped_matches_naive(n):
    t = _doc(3, n)
    got = mh.signature_np(t, cap=None)
    want = mh.signature_naive(t, cap=None)
    if want is None:
        assert got is None
    else:
        assert got.tolist() == want


def test_signature_chunked_equals_single_pass(monkeypatch):
    t = _doc(5, 4000)
    want = mh.signature_np(t, cap=None).tolist()
    for chunk in (128, 333, 3999):
        monkeypatch.setattr(mh, "CHUNK", chunk)
        assert mh.signature_np(t, cap=None).tolist() == want, chunk
    monkeypatch.undo()


def test_shingle_stream_chunked_contiguous(monkeypatch):
    t = _doc(9, 2000)
    want = mh.shingle_hashes_np(t, cap=None).tolist()
    monkeypatch.setattr(mh, "CHUNK", 100)
    assert mh.shingle_hashes_np(t, cap=None).tolist() == want
    monkeypatch.undo()


# ------------------------------------------------- planted recall gap
def _mid_dup_corpus():
    """Two 6 KB docs: distinct prefixes (so capped kernels see nothing
    shared) but an identical 1.5 KB block planted at char ~3000."""
    shared = _doc(42, 1500)
    a = _doc(1, 3000) + shared + _doc(2, 1500)
    b = _doc(3, 3000) + shared + _doc(4, 1500)
    return a, b


def test_winnow_mid_document_dup_needs_full_text():
    a, b = _mid_dup_corpus()
    capped = set(fp.fingerprints_np(a, cap=fp.CAP)) & set(
        fp.fingerprints_np(b, cap=fp.CAP)
    )
    full = set(fp.fingerprints_np(a, cap=None)) & set(
        fp.fingerprints_np(b, cap=None)
    )
    assert len(capped) == 0  # the r2 gap: prefix-capped misses it
    # winnowing guarantee: a >= K+W-1 char match shares a fingerprint;
    # a 1.5 KB planted block shares many
    assert len(full) >= 50


def test_minhash_mid_document_dup_needs_full_text():
    a, b = _mid_dup_corpus()
    sa, sb = mh.signature_np(a, cap=mh.CAP), mh.signature_np(b, cap=mh.CAP)
    est_capped = mh.estimated_jaccard(sa.tolist(), sb.tolist())
    fa, fb = mh.signature_np(a, cap=None), mh.signature_np(b, cap=None)
    est_full = mh.estimated_jaccard(fa.tolist(), fb.tolist())
    # prefixes are unrelated -> capped estimate ~0; full text sees the
    # planted quarter-document overlap
    assert est_capped <= 0.05
    assert est_full >= 0.12


def test_spark_full_pairs_find_planted_mid_dup(spark):
    """End-to-end over the Spark kernels: candidate_pairs(cap=None)
    surfaces the planted pair; the capped kernel does not. The shared
    block dominates (Jaccard ≈ 0.77, far above the 32×4 S-curve
    midpoint ~0.42) so banding fires; the distinct 600-char prefixes
    exceed CAP=400, so the capped kernel sees only unrelated text."""
    shared = _doc(77, 4000)
    a = _doc(1, 600) + shared
    b = _doc(3, 600) + shared
    rows = [(1, a), (2, b)] + [(10 + i, _doc(100 + i, 4000)) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["doc_a"], r["doc_b"])
        for r in mh.candidate_pairs(docs, cap=None).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in mh.candidate_pairs(docs, cap=mh.CAP).collect()
    }
    assert (1, 2) in full
    assert (1, 2) not in capped
