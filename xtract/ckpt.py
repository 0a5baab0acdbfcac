"""Checkpoint + lineage sidecar: idempotent mid-run resume (north rule;
the Spark-scale generalization of the reference's md5-keyed result
cache, question_merger.py:568-609).

The input is bucketed by ``pmod(xxhash64(conv_id), n_buckets)``; each
bucket is a resumable unit. Completed buckets append a lineage row
(run_id, partition_key, status, row counts, order-free checksum) to a
sidecar parquet table; span output is written with dynamic partition
overwrite keyed by the bucket, so re-running a bucket replaces exactly
its own files. Resume = anti-join of buckets against the lineage's
completed set — a re-launched job recomputes only unfinished buckets.

At cluster scale each bucket maps to many tasks (it is a logical
commit unit, not a physical partition); n_buckets trades resume
granularity against lineage-table size.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import pipeline


def bucket_of(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, ckpt_dir: str, run_id: str) -> list[int]:
    try:
        lin = spark.read.parquet(ckpt_dir)
    except Exception:  # first run: no sidecar yet  # noqa: BLE001
        return []
    return [
        int(r.partition_key)
        for r in lin.filter(
            (F.col("run_id") == run_id) & (F.col("status") == "done")
        )
        .select("partition_key")
        .distinct()
        .collect()
    ]


def run_with_checkpoint(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    ckpt_dir: str,
    run_id: str = "run0",
    mode: str = "fused",
    merge: str = "greedy",
    n_buckets: int = 64,
) -> dict:
    done = set(completed_buckets(spark, ckpt_dir, run_id))
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return {"partitions_done": 0, "partitions_skipped": len(done)}

    src = transcripts.withColumn("pk", bucket_of(F.col("conv_id"), n_buckets))
    todo = src.filter(F.col("pk").isin(pending))

    spans = pipeline.extract(todo.drop("pk"), mode=mode, merge=merge).withColumn(
        "pk", bucket_of(F.col("conv_id"), n_buckets)
    )

    # dynamic overwrite: only the partitions present in `spans` are
    # replaced — a crashed bucket's partial files are overwritten
    # whole on retry, never appended to
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spans.write.mode("overwrite").partitionBy("pk").parquet(output_dir)

    # per-bucket lineage: counts + an order-free checksum of the span
    # identities (commutative XOR of row hashes)
    # every pending bucket gets a lineage row, including empty ones —
    # otherwise an empty bucket would be "recomputed" on every resume
    all_pending = spark.createDataFrame([(b,) for b in pending], "pk int")
    rows_in = all_pending.join(
        todo.groupBy("pk").agg(F.count("*").alias("rows_in")), "pk", "left"
    ).select("pk", F.coalesce("rows_in", F.lit(0)).alias("rows_in"))
    metrics = (
        spark.read.parquet(output_dir)
        .filter(F.col("pk").isin(pending))
        .groupBy("pk")
        .agg(
            F.count("*").alias("rows_out"),
            F.count_if("split_from_merged").alias("splits"),
            F.count_if("has_image").alias("merges"),
            F.conv(
                F.bit_xor(
                    F.xxhash64("conv_id", "turn_idx", "seq", "span_text")
                ).cast("string"),
                10,
                16,
            ).alias("checksum"),
        )
    )
    lineage = (
        rows_in.join(metrics, "pk", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("pk").cast("string").alias("partition_key"),
            F.lit("done").alias("status"),
            F.col("rows_in").cast("long"),
            F.coalesce("rows_out", F.lit(0)).cast("long").alias("rows_out"),
            F.coalesce("splits", F.lit(0)).cast("long").alias("splits"),
            F.coalesce("merges", F.lit(0)).cast("long").alias("merges"),
            F.coalesce("checksum", F.lit("0")).alias("checksum"),
            F.current_timestamp().alias("ts"),
        )
    )
    lineage.write.mode("append").parquet(ckpt_dir)
    return {"partitions_done": len(pending), "partitions_skipped": len(done)}
