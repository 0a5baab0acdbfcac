"""Similarity search over embedding columns (training-data ops).

Three strategies, one contract — ``(query_id, rank, neighbor_id,
score)``:

- ``cosine_topk``  — brute force: broadcast the (small) query side,
  JVM-side dot products via zip_with/aggregate, per-query top-k
  window. The exactness baseline; O(|Q|·|C|).
- ``lsh_topk``     — random-hyperplane LSH: seeded plane projections
  (vectorized numpy in an Arrow UDF) → per-table signature buckets →
  equi-join on (table, signature) generates candidates → exact
  rerank. The 100-TB path: the bucket join shuffles on a compact key
  and candidate count is a small multiple of k.
- ``ivf_topk``     — IVF-style: deterministic seeded centroids,
  nearest-centroid assignment for candidates, queries probe
  ``nprobe`` nearest cells → candidates → exact rerank. Bounded fan-in
  per query; centroid table broadcasts.

Scores are rounded to 6dp for stable cross-run comparison.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "neighbor_id"
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """corpus(id, vec) × queries(id, vec) → exact top-k by cosine."""
    c = corpus.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("cv"))
    q = F.broadcast(
        queries.select(F.col("id").alias("query_id"), F.col("vec").alias("qv"))
    )
    pairs = c.crossJoin(q).where(F.col("neighbor_id") != F.col("query_id"))
    score = F.round(
        _dot(F.col("qv"), F.col("cv")) / _norm(F.col("qv")) / _norm(F.col("cv")), 6
    )
    return _ranked(pairs.select("query_id", "neighbor_id", score.alias("score")), k)


def _planes(dim: int, n_planes: int, table: int) -> np.ndarray:
    rng = np.random.RandomState(SEED + 1000 * table)
    return rng.standard_normal((n_planes, dim))


def _signatures(df: DataFrame, dim: int, n_planes: int, n_tables: int) -> DataFrame:
    """(id, vec) → one row per hash table with the bit-signature."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("table", T.IntegerType(), False),
            T.StructField("sig", T.LongType(), False),
        ]
    )
    planes = [_planes(dim, n_planes, t_) for t_ in range(n_tables)]
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            ids = pdf["id"].to_numpy()
            frames = []
            for t_, pl in enumerate(planes):
                bits = (mat @ pl.T) > 0
                sigs = (bits @ weights).astype(np.int64)
                frames.append(
                    pd.DataFrame({"id": ids, "table": t_, "sig": sigs})
                )
            yield pd.concat(frames, ignore_index=True)

    return df.select("id", "vec").mapInPandas(kernel, schema=out_schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share a full signature in ≥1
    table; exact cosine rerank on the candidate set."""
    cs = _signatures(corpus, dim, n_planes, n_tables).withColumnRenamed(
        "id", "neighbor_id"
    )
    qs = _signatures(queries, dim, n_planes, n_tables).withColumnRenamed(
        "id", "query_id"
    )
    cand = (
        qs.join(cs, ["table", "sig"])
        .select("query_id", "neighbor_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .distinct()
    )
    c = corpus.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("cv"))
    q = queries.select(F.col("id").alias("query_id"), F.col("vec").alias("qv"))
    pairs = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
    score = F.round(
        _dot(F.col("qv"), F.col("cv")) / _norm(F.col("qv")) / _norm(F.col("cv")), 6
    )
    return _ranked(pairs.select("query_id", "neighbor_id", score.alias("score")), k)


def _centroids(dim: int, n_cells: int) -> np.ndarray:
    rng = np.random.RandomState(SEED + 7)
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _assign(df: DataFrame, dim: int, n_cells: int, nprobe: int) -> DataFrame:
    """(id, vec) → nprobe rows (id, cell) of nearest centroids."""
    cents = _centroids(dim, n_cells)
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cell", T.IntegerType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ cents.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, nprobe),
                    "cell": top.ravel().astype(np.int32),
                }
            )

    return df.select("id", "vec").mapInPandas(kernel, schema=out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their single nearest cell;
    queries probe their ``nprobe`` nearest cells; exact rerank."""
    ca = _assign(corpus, dim, n_cells, 1).withColumnRenamed("id", "neighbor_id")
    qa = _assign(queries, dim, n_cells, nprobe).withColumnRenamed("id", "query_id")
    cand = (
        qa.join(ca, "cell")
        .select("query_id", "neighbor_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .distinct()
    )
    c = corpus.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("cv"))
    q = queries.select(F.col("id").alias("query_id"), F.col("vec").alias("qv"))
    pairs = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
    score = F.round(
        _dot(F.col("qv"), F.col("cv")) / _norm(F.col("qv")) / _norm(F.col("cv")), 6
    )
    return _ranked(pairs.select("query_id", "neighbor_id", score.alias("score")), k)
