"""Geometry column functions (G6, G8-G10)."""
import pyspark.sql.functions as F

from xtract import geom


def _one(spark, expr, **cols):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({k: [v] for k, v in cols.items()}))
    return df.select(expr.alias("out")).collect()[0].out


def test_iou(spark):
    a = F.array(*[F.lit(v) for v in (0, 0, 10, 10)])
    assert _one(spark, geom.iou(a, F.array(*[F.lit(v) for v in (0, 0, 10, 10)])), x=1) == 1.0
    assert _one(spark, geom.iou(a, F.array(*[F.lit(v) for v in (20, 20, 30, 30)])), x=1) == 0.0
    # half overlap: inter 50, union 150
    got = _one(spark, geom.iou(a, F.array(*[F.lit(v) for v in (5, 0, 15, 10)])), x=1)
    assert abs(got - 50 / 150) < 1e-9
    # malformed → 0
    assert _one(spark, geom.iou(F.array(F.lit(1)), a), x=1) == 0.0


def test_normalize_coords(spark):
    got = _one(
        spark,
        geom.normalize_coords(
            F.array(*[F.lit(v) for v in (100, 200, 500, 900)]),
            F.lit(2866),
            F.lit(2023),
        ),
        x=1,
    )
    # int(v * dim / 1000) truncation, x uses width, y uses height
    assert list(got) == [
        int(100 * 2866 / 1000),
        int(200 * 2023 / 1000),
        int(500 * 2866 / 1000),
        int(900 * 2023 / 1000),
    ]


def test_parse_bbox_string(spark):
    got = _one(
        spark, geom.parse_bbox_string(F.col("s")), s="前缀 <bbox>12 34 560 780</bbox> 后缀"
    )
    assert list(got) == [12, 34, 560, 780]
    assert _one(spark, geom.parse_bbox_string(F.col("s")), s="no box here") is None


def test_autofix_scale(spark):
    # coords in a ~600px space on a 2866x2023 page → rescaled
    got = _one(
        spark,
        geom.autofix_scale(
            F.array(*[F.lit(v) for v in (10, 20, 300, 600)]),
            F.lit(2866),
            F.lit(2023),
        ),
        x=1,
    )
    scale = 2023 / 600
    assert list(got) == [int(10 * scale), int(20 * scale), int(300 * scale), int(600 * scale)]
    # already-page-scale coords untouched
    got2 = _one(
        spark,
        geom.autofix_scale(
            F.array(*[F.lit(v) for v in (100, 200, 1500, 1900)]),
            F.lit(2866),
            F.lit(2023),
        ),
        x=1,
    )
    assert list(got2) == [100, 200, 1500, 1900]
