"""Materialized intermediates for driver-oracle cross-checks.

The flagship extraction kernel hinges on Python ``re`` semantics
(question_splitter.py pattern family) and is not restatable in SQL
from the raw driver tables. To still put the flagship path on the
driver's hard correctness signal, a query materializes the kernel's
intermediate output (spans / flat blocks) to a deterministic parquet
path, computes the downstream operator Spark-side over that
intermediate, and the DuckDB oracle restates the SAME downstream
computation over the SAME parquet via ``read_parquet()``. The kernel
itself is cross-checked against the pure-Python oracle in
tests/test_parity.py; this pattern extends the independent-engine
check to the aggregation / window / regex stages on top (and, for the
relational-vs-fused pair, turns plan equivalence into a driver row).

Freshness: files are rewritten on first use in each Python process
(never trusted across processes), so a stale artifact from an older
engine build can never satisfy an oracle.
"""
from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

ROOT = "/tmp/xtract_mat"
# the driver's oracle pass compares at this scale; its read_parquet
# globs are pinned here (see __spark_entry__._extraction_oracles)
ORACLE_SF = "sf0.01"

_written: set[str] = set()


def path(sf_dir: str, name: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return f"{ROOT}/{sf}/{name}"


def glob(sf_dir: str, name: str) -> str:
    """The read_parquet() glob the DuckDB oracle uses for this target."""
    return f"{path(sf_dir, name)}/*.parquet"


def materialize(
    spark: SparkSession, sf_dir: str, name: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Write ``build()`` to the target path once per process (overwrite
    — never reuse bytes from a previous run) and return the read-back
    DataFrame."""
    p = path(sf_dir, name)
    if p not in _written:
        # Cross-scale guard: the oracle globs are pinned to ORACLE_SF,
        # so if this process materializes ``name`` at a DIFFERENT
        # scale without (yet) writing the ORACLE_SF slot, delete any
        # leftover ORACLE_SF artifact from an older process — a stale
        # one would satisfy read_parquet() silently; a missing one
        # fails the oracle loudly, which is the honest outcome.
        op = path(ORACLE_SF, name)
        if p != op and op not in _written:
            import shutil

            shutil.rmtree(op, ignore_errors=True)
        build().write.mode("overwrite").parquet(p)
        _written.add(p)
    return spark.read.parquet(p)


def materialize_partitioned(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    partition_cols: list[str],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Same freshness/cross-scale contract as :func:`materialize`, but
    the write is hive-partitioned by ``partition_cols`` — used when the
    physical LAYOUT is itself the artifact under test (partition-dir
    pruning is Spark's file-skipping mechanism, so a zone-map audit
    must run over a genuinely partitioned dataset). The DuckDB oracle
    reads it with ``read_parquet(glob, hive_partitioning=1)``."""
    p = path(sf_dir, name)
    if p not in _written:
        op = path(ORACLE_SF, name)
        if p != op and op not in _written:
            import shutil

            shutil.rmtree(op, ignore_errors=True)
        build().write.mode("overwrite").partitionBy(*partition_cols).parquet(p)
        _written.add(p)
    return spark.read.parquet(p)


def materialize_text(
    spark: SparkSession, sf_dir: str, name: str, build: Callable[[], DataFrame]
) -> str:
    """Same freshness/cross-scale contract as :func:`materialize`, but
    the target is a TEXT directory (one record per line — the JSONL
    ingestion fixture). Returns the path; callers choose their own
    reader (``spark.read.json`` with a schema, DuckDB ``read_csv``)
    because the point of the fixture is exercising readers."""
    p = path(sf_dir, name)
    if p not in _written:
        op = path(ORACLE_SF, name)
        if p != op and op not in _written:
            import shutil

            shutil.rmtree(op, ignore_errors=True)
        build().write.mode("overwrite").text(p)
        _written.add(p)
    return p


def materialize_multi(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    parts: dict[str, Callable[[], DataFrame]],
) -> str:
    """Same freshness/cross-scale contract as :func:`materialize`, but
    writes each ``parts[sub]()`` under ``<path>/<sub>/`` with its OWN
    schema — the schema-EVOLUTION fixture (a real lakehouse dataset is
    many write batches, and later batches add columns). Returns the
    root path; callers pick their schema-merging reader (Spark
    ``mergeSchema``, DuckDB ``union_by_name``)."""
    p = path(sf_dir, name)
    if p not in _written:
        op = path(ORACLE_SF, name)
        if p != op and op not in _written:
            import shutil

            shutil.rmtree(op, ignore_errors=True)
        for sub, build in parts.items():
            build().write.mode("overwrite").parquet(f"{p}/{sub}")
        _written.add(p)
    return p
