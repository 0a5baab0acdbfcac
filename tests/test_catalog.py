"""Table IO abstraction (xtract/catalog.py): ref parsing, runtime
Iceberg capability probe, parquet fallback round-trip, and the
spark-submit surface accepting pdf:/table: refs."""
from __future__ import annotations

import pytest

from xtract import catalog


def test_ref_parsing():
    assert catalog.is_table_ref("table:local.db.spans")
    assert not catalog.is_table_ref("/data/spans")
    assert not catalog.is_table_ref("gen:100")
    assert catalog.table_name("table:local.db.spans") == "local.db.spans"
    with pytest.raises(ValueError):
        catalog.table_name("/data/spans")
    with pytest.raises(ValueError):
        catalog.table_name("table:")


def test_iceberg_probe_is_honest(spark):
    """This container ships no Iceberg runtime jar: the probe must say
    so (and must not raise). On a deployment with the jar, the same
    probe flips the engine to catalog tables with no code change."""
    assert catalog.iceberg_available(spark) is False


def test_configure_iceberg_sets_catalog_confs():
    captured: dict = {}

    class FakeBuilder:
        def config(self, k, v):
            captured[k] = v
            return self

    catalog.configure_iceberg(FakeBuilder(), catalog="prod", warehouse="/wh")
    assert captured["spark.sql.catalog.prod"] == catalog.ICEBERG_CATALOG_CLASS
    assert captured["spark.sql.catalog.prod.type"] == "hadoop"
    assert captured["spark.sql.catalog.prod.warehouse"] == "/wh"
    assert "IcebergSparkSessionExtensions" in captured["spark.sql.extensions"]


def test_parquet_fallback_roundtrip(spark, tmp_path):
    df = spark.range(10).selectExpr("cast(id as string) conv_id", "id * 2 as v")
    path = str(tmp_path / "t")
    catalog.write_ref(df, path)
    back = catalog.read_ref(spark, path)
    assert back.count() == 10
    assert catalog.count_ref(spark, path) == 10
    assert {r.v for r in back.collect()} == {2 * i for i in range(10)}


def test_table_ref_without_catalog_fails_cleanly(spark):
    df = spark.range(1).selectExpr("cast(id as string) conv_id")
    with pytest.raises(Exception):  # no catalog configured in sandbox
        catalog.write_ref(df, "table:nosuch.db.t")
