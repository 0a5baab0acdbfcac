"""SparkSession factory with the engine's scale posture baked in.

Single place for the configs the north rule calls out explicitly:
AQE + skew-join handling, Arrow-backed pandas UDFs, explicit shuffle
partitioning (SURVEY.md §4).
"""
from __future__ import annotations

from pyspark.sql import SparkSession


def build(
    app: str = "xtract",
    master: str | None = None,
    cores: int = 32,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    b = (
        SparkSession.builder.appName(app)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # byte cap matters more than the record cap for transcript
        # payloads: a 10k-record batch of 1 MB turns would be 10 GB
        # without it — 64 MB bounds per-batch worker memory regardless
        # of row width
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.session.timeZone", "UTC")
        # managed-table warehouse off the repo tree (btable: refs,
        # catalog.py); in-memory catalog — metadata is per-session,
        # data files persist under the warehouse dir
        .config("spark.sql.warehouse.dir", "/tmp/xtract_warehouse")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master:
        b = b.master(master)
    elif not SparkSession.getActiveSession():
        b = b.master(f"local[{cores}]")
    return b.getOrCreate()
