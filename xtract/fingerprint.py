"""Document fingerprinting: k-gram rolling hash + winnowing.

The winnowing scheme (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
algorithm): hash every k-gram of the document, slide a window of w
consecutive hashes, keep each window's minimum; the resulting
fingerprint set has the guarantee that any substring match of length
≥ k+w-1 between two documents produces at least one shared
fingerprint. This is the "document fingerprinting (rolling hash)"
arm of the training-data dedup toolkit (complements exact-hash,
MinHash/LSH, SimHash, n-gram Jaccard in similarity.py/queries.py).

Hash is a plain base-B polynomial over unicode codepoints mod M —
deliberately simple so the SAME function is expressible in DuckDB SQL
(driver oracle queries fp_winnow / fp_shared_pairs) and the Arrow
kernel can be cross-validated against an independent engine.

Scale shape: the kernel is a narrow mapInPandas (numpy Horner over a
codepoint array — k vectorized passes per batch, no per-char Python);
per-doc output is the distinct fingerprint set, ~len/w values.
shared_pairs is then a fingerprint-key equi-join + count — the classic
inverted-index shape that shuffles |fp| rows, not |doc|² pairs.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

K = 8  # k-gram length (chars)
W = 4  # winnowing window (hashes)
B = 131  # polynomial base
M = 1_000_000_007  # modulus (fits intermediate math in int64/BIGINT)
# Default chars hashed per doc (both engines apply the same cap — it
# keeps the DuckDB restatement tractable). Every kernel also takes
# ``cap`` explicitly; cap=None winnows the WHOLE document via the
# chunked kernel below — the 100-TB semantics (two 100 KB docs that
# differ only after char 2000 must NOT be fingerprint-identical).
CAP = 2000
# chars per kernel chunk when uncapped; chunks overlap K+W-2 chars so
# every length-W hash window is evaluated in exactly one chunk — the
# fingerprint set equals the single-pass result bit-for-bit
CHUNK = 1 << 16


def _clip(text: str | None, cap: int | None) -> str:
    t = text or ""
    return t if cap is None else t[:cap]


POW_MOD = [pow(B, K - 1 - j, M) for j in range(K)]  # B^(k-1-j) % M


def fingerprints_naive(text: str, cap: int | None = CAP) -> list[int]:
    """Reference implementation (pure Python, O(len·k)) — the local
    oracle for the vectorized kernel."""
    t = _clip(text, cap)
    n = len(t)
    if n < K + W - 1:
        return []
    hashes = []
    for p in range(n - K + 1):
        h = 0
        for j in range(K):
            h = (h + ord(t[p + j]) * POW_MOD[j]) % M
        hashes.append(h)
    sel = set()
    for s in range(len(hashes) - W + 1):
        sel.add(min(hashes[s : s + W]))
    return sorted(sel)


def _winnow_chunk(chunk: str) -> np.ndarray:
    """Window-min selection over one chunk's hash stream."""
    cp = np.frombuffer(chunk.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    npos = len(chunk) - K + 1
    h = np.zeros(npos, dtype=np.int64)
    for j in range(K):
        h = (h * B + cp[j : j + npos]) % M
    sel = h[: npos - W + 1].copy()
    for s in range(1, W):
        np.minimum(sel, h[s : s + npos - W + 1], out=sel)
    return sel


def fingerprints_np(text: str, cap: int | None = CAP) -> np.ndarray:
    """Vectorized winnowing: k Horner passes over the codepoint array,
    then a w-way minimum reduce. int64 throughout (max intermediate
    M·B + 0x110000 < 2^63). Texts longer than CHUNK stream through in
    overlapping pieces (overlap K+W-2 ⇒ every hash window lands in
    exactly one chunk), so memory stays O(CHUNK) per doc and the
    result is identical to a single pass."""
    t = _clip(text, cap)
    n = len(t)
    if n < K + W - 1:
        return np.empty(0, dtype=np.int64)
    # a chunk shorter than one full hash window cannot advance the
    # loop (step = chunk - (K+W-2) would be ≤ 0) — clamp defensively
    chunk = max(CHUNK, K + W - 1)
    if n <= chunk:
        return np.unique(_winnow_chunk(t))
    sels = []
    start = 0
    while start <= n - (K + W - 1):
        end = min(n, start + chunk)
        sels.append(_winnow_chunk(t[start:end]))
        if end == n:
            break
        start = end - (K + W - 2)
    return np.unique(np.concatenate(sels))


FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fp", T.LongType(), False),
    ]
)

FP_SCHEMA_STR = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("fp", T.LongType(), False),
    ]
)


def fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int | None = CAP,
) -> DataFrame:
    """(id, text) → one row per distinct winnowed fingerprint. Narrow
    kernel, no shuffle; column pruning pushes to the scan. String ids
    pass through unchanged (restatable cross-engine, unlike a hashed
    key); everything else folds to long. ``cap=None`` winnows whole
    documents (chunked kernel)."""
    is_str = dict(docs.dtypes)[id_col] == "string"
    out_schema = FP_SCHEMA_STR if is_str else FP_SCHEMA
    id_expr = F.col(id_col) if is_str else F.col(id_col).cast("long")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[np.ndarray] = []
            fps: list[np.ndarray] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                f = fingerprints_np(text, cap=cap)
                if len(f):
                    key = doc_id if is_str else int(doc_id)
                    ids.append(np.full(len(f), key, dtype=object if is_str else np.int64))
                    fps.append(f)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(fps)}
                )

    return docs.select(id_expr.alias(id_col), F.col(text_col).alias(text_col)).mapInPandas(
        kernel, schema=out_schema
    )


def span_key():
    """The spans' natural key folded to one string column — the same
    expression is restatable in DuckDB (``conv_id || '#' || …``), so
    dup_spans output is directly oracle-comparable."""
    return F.concat_ws("#", "conv_id", "turn_idx", "seq")


def dup_spans(
    spans: DataFrame, min_shared: int = 4, max_df: int = 20
) -> DataFrame:
    """Duplicate-question detection over extracted spans: winnowing
    fingerprints of span_text keyed by the spans' natural key
    (conv_id#turn_idx#seq — one sortable string, identical in SQL),
    then shared-fingerprint pairs. The training-data dedup step
    applied to the engine's own output — repeated exam questions
    across conversations surface as pairs."""
    keyed = spans.select(
        span_key().alias("doc_id"), F.col("span_text").alias("text")
    )
    return shared_pairs(fingerprints(keyed), min_shared=min_shared, max_df=max_df)


def winnow_summary(fps: DataFrame) -> DataFrame:
    """Per-doc fingerprint digest (count / min / max / sum) — compact,
    deterministic, hashable cross-engine."""
    return fps.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
        F.sum("fp").cast("long").alias("fp_sum"),
    )


def word_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) → distinct word-bigram set per doc ([a-z0-9]+ token
    stream). The exact-scoring feature for near-dup candidates.

    Shape note: pairing uses zip_with over two slices, NOT
    transform(sequence, i -> toks[i] || toks[i+1]) — an indexed lambda
    re-evaluates the ``toks`` expression (a regex scan of the whole
    text) on EVERY element access, turning O(len) tokenization into
    O(len·grams); zip_with materializes each array argument once per
    row (measured ~10× on the sf0.1 sample)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), 0)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    grams = F.when(F.size(toks) >= 2, F.array_distinct(pairs)).otherwise(
        F.array().cast("array<string>")
    )
    return docs.select(F.col(id_col).alias("doc_id"), grams.alias("grams"))


def jaccard_score_pairs(candidates: DataFrame, grams: DataFrame) -> DataFrame:
    """Exact n-gram Jaccard over CANDIDATE pairs only — the composed
    near-dup operator: cheap recall stage (inverted-index candidates
    from shared_pairs / minhash bands) → exact precision stage. Two
    equi-joins attach each side's gram set; cost scales with candidate
    count, never |doc|² (the staged-filtering strategy the reference
    documents: cheap prune before expensive check,
    docs/题目分割优化方案.md:356-370).

    ``candidates`` needs (doc_a, doc_b); extra columns (n_shared) pass
    through. ``grams`` is word_bigrams() output. jaccard integerized
    to ppm for cross-engine hashing."""
    extra = [c for c in candidates.columns if c not in ("doc_a", "doc_b")]
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    uni = F.greatest(F.size(F.array_distinct(F.concat("ga", "gb"))), F.lit(1))
    return (
        candidates.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            *extra,
            F.floor(F.lit(1000000.0) * inter / uni).cast("long").alias("jaccard_ppm"),
        )
    )


def near_dup_scored(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 4,
    max_df: int = 20,
    cap: int | None = CAP,
) -> DataFrame:
    """End-to-end near-dup scoring: winnowing-fingerprint candidates
    (inverted index + stop-gram cap) → exact word-bigram Jaccard on
    candidates only."""
    keyed = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    cands = shared_pairs(
        fingerprints(keyed, cap=cap), min_shared=min_shared, max_df=max_df
    )
    return jaccard_score_pairs(cands, word_bigrams(keyed))


def shared_pairs(
    fps: DataFrame, min_shared: int = 2, max_df: int | None = None
) -> DataFrame:
    """Near-dup candidates: pairs of docs sharing ≥ min_shared
    fingerprints. Equi-join on fp (inverted index), so cost scales
    with fingerprint collisions, not doc pairs. ``max_df`` drops
    stop-gram fingerprints (those occurring in more than max_df docs)
    before the self-join — the standard guard that keeps the join
    skew-free on a boilerplate-heavy corpus: a fingerprint in d docs
    otherwise contributes d² pairs."""
    if max_df is not None:
        # df cap via a window, not an agg+semi-join: the (doc_id, fp)
        # rows are distinct, so a per-fp row count IS the doc
        # frequency — one pass over the kernel output instead of
        # re-evaluating the fingerprint lineage for the keep side
        from pyspark.sql import Window

        fps = (
            fps.withColumn("_df", F.count("*").over(Window.partitionBy("fp")))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
