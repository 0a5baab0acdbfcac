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
        build().write.mode("overwrite").parquet(p)
        _written.add(p)
    return spark.read.parquet(p)
