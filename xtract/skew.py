"""Explicit skew handling for conversation-keyed work (north rule:
"hash-partition by conv_id with salt on skewed mega-conversations").

The extraction hot path never needs this — it keys by (conv_id,
turn_idx) or finer. It exists for the operations that genuinely group
by conv_id alone:

- ``salted_agg``: two-phase aggregation — groupBy(conv_id, salt)
  partial, then groupBy(conv_id) final — so a 10^6-turn
  mega-conversation's rows spread across ``n_salts`` reducers instead
  of one. (Spark's map-side partial aggregation already gives this for
  algebraic aggregates; the explicit salt matters for the non-algebraic
  ones — collect_list/percentile/large distinct sets — and under
  groupBy-with-UDF.)

- ``salted_repartition``: hash-partition by (conv_id, salt mod k) where
  only detected-heavy conversations are salted, for downstream
  per-partition work (e.g. grouped UDFs over conversations).
"""
from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(
    df: DataFrame, n_salts: int = 16, salt_from: str = "turn_idx"
) -> DataFrame:
    """Deterministic per-row salt derived from ``salt_from`` (NOT
    random — resume/idempotency requires stable assignment)."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    partials: Sequence[tuple[Column, str, Column]],
    n_salts: int = 16,
    key: str = "conv_id",
    salt_from: str = "turn_idx",
) -> DataFrame:
    """Two-phase keyed aggregation (default: by conv_id, salted on
    turn_idx — the transcript shape).

    ``partials`` is a list of (partial_expr, name, final_expr_over_name):
    e.g. ``(F.count("*"), "c", F.sum("c"))`` or
    ``(F.collect_set("x"), "s", F.array_distinct(F.flatten(F.collect_list("s"))))``.
    """
    salted = with_salt(df, n_salts, salt_from=salt_from)
    stage1 = salted.groupBy(key, "salt").agg(
        *[expr.alias(name) for expr, name, _ in partials]
    )
    return stage1.groupBy(key).agg(
        *[final.alias(name) for _, name, final in partials]
    )


def heavy_conversations(df: DataFrame, threshold_turns: int = 10_000) -> DataFrame:
    """Detect mega-conversations (count by conv_id — itself safe:
    partial aggregation moves one row per partition per conv)."""
    return (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("turns"))
        .filter(F.col("turns") >= threshold_turns)
        .select("conv_id")
    )


def salted_repartition(
    df: DataFrame, n_partitions: int, n_salts: int = 16, threshold_turns: int = 10_000
) -> DataFrame:
    """Repartition by conv_id with salt applied ONLY to heavy
    conversations (broadcast anti-membership keeps light convs
    single-partition, preserving cheap per-conv locality)."""
    heavy = F.broadcast(
        heavy_conversations(df, threshold_turns).withColumn("is_heavy", F.lit(True))
    )
    tagged = df.join(heavy, "conv_id", "left")
    key = F.when(
        F.col("is_heavy").isNotNull(),
        F.pmod(F.xxhash64("turn_idx"), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    return tagged.withColumn("salt", key.cast("int")).drop("is_heavy").repartition(
        n_partitions, "conv_id", "salt"
    )
