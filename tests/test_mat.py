"""mat.py: materialized intermediates must be rewritten on first use
per process (stale bytes from an older build may never satisfy an
oracle) and memoized within a process."""
import pyspark.sql.functions as F

from xtract import mat


def test_rewrites_stale_then_memoizes(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(mat, "ROOT", str(tmp_path / "mat"))
    monkeypatch.setattr(mat, "_written", set())
    calls = []

    def build_v(v):
        def build():
            calls.append(v)
            return spark.range(3).select(F.lit(v).alias("v"), "id")
        return build

    # simulate a STALE artifact from a previous process
    spark.range(1).select(F.lit("stale").alias("v"), "id").write.parquet(
        mat.path("sf0.01", "t")
    )
    df = mat.materialize(spark, "sf0.01", "t", build_v("fresh"))
    assert {r.v for r in df.collect()} == {"fresh"}
    assert calls == ["fresh"]
    # second use in the same process: no rebuild
    df2 = mat.materialize(spark, "sf0.01", "t", build_v("again"))
    assert calls == ["fresh"]
    assert {r.v for r in df2.collect()} == {"fresh"}


def test_path_keys_on_sf_basename():
    assert mat.path("/root/testdata/sf0.01", "x").endswith("/sf0.01/x")
    assert mat.path("sf0.1", "x").endswith("/sf0.1/x")
    assert mat.glob("sf0.01", "x").endswith("/sf0.01/x/*.parquet")
