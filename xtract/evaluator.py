"""Extraction-quality evaluation (reference evaluator.py:15-161):
precision/recall/F1 on detected question ids, mean bbox IoU,
image-association accuracy (exact id-set match), and split accuracy
(IoU > 0.7 among split questions) — restated as joins + aggregates.

Both sides are span tables keyed by (conv_id, turn_idx,
question_number); the ground truth is any DataFrame with the same
shape (in tests: oracle output, or a perturbed copy).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .config import LIMITS

_KEYS = ["conv_id", "turn_idx", "question_number"]


def _dedup(df: DataFrame) -> DataFrame:
    """The reference evaluator keys questions by id and assumes
    uniqueness per page (evaluator.py:47-52); real turns can repeat a
    number (two blocks both starting '1.'), which would fan out the
    match join — keep the first span (by seq) per key."""
    w = Window.partitionBy(*_KEYS).orderBy("seq")
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def _iou(a, b):
    """G6 (evaluator.py:135-161): 0.0 for malformed or disjoint."""
    ok = (F.size(a) == 4) & (F.size(b) == 4)
    ix1 = F.greatest(a[0], b[0])
    iy1 = F.greatest(a[1], b[1])
    ix2 = F.least(a[2], b[2])
    iy2 = F.least(a[3], b[3])
    inter = F.greatest(F.lit(0), ix2 - ix1) * F.greatest(F.lit(0), iy2 - iy1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return F.when(ok & (union > 0), inter / union).otherwise(F.lit(0.0))


def evaluate(extracted: DataFrame, truth: DataFrame) -> DataFrame:
    """One-row metrics DataFrame (evaluator.py:37-44 fields).

    Detection P/R/F1 count (turn, question_number) identities via
    semi/anti joins (SO2); the bbox/association/split metrics come
    from the inner join of matched questions (J6).
    """
    ex = _dedup(extracted.filter(F.col("question_number").isNotNull())).select(
        *_KEYS,
        F.col("bbox").alias("ex_bbox"),
        F.col("image_ids").alias("ex_imgs"),
        F.col("split_from_merged").alias("ex_split"),
    )
    gt = _dedup(truth.filter(F.col("question_number").isNotNull())).select(
        *_KEYS,
        F.col("bbox").alias("gt_bbox"),
        F.col("image_ids").alias("gt_imgs"),
        F.col("split_from_merged").alias("gt_split"),
    )

    n_ex = ex.count()
    n_gt = gt.count()
    matched = ex.join(gt, _KEYS)

    agg = matched.agg(
        F.count("*").alias("n_matched"),
        F.avg(_iou(F.col("ex_bbox"), F.col("gt_bbox"))).alias("bbox_iou_mean"),
        F.count_if(
            F.sort_array("ex_imgs") == F.sort_array("gt_imgs")
        ).alias("assoc_ok"),
        F.count_if("gt_split").alias("n_split"),
        F.count_if(
            F.col("gt_split")
            & (_iou(F.col("ex_bbox"), F.col("gt_bbox")) > LIMITS.split_iou_gate)
        ).alias("split_ok"),
    )

    return agg.select(
        F.lit(n_ex).alias("n_extracted"),
        F.lit(n_gt).alias("n_truth"),
        F.col("n_matched"),
        (F.col("n_matched") / F.greatest(F.lit(n_ex), F.lit(1))).alias(
            "detection_precision"
        ),
        (F.col("n_matched") / F.greatest(F.lit(n_gt), F.lit(1))).alias(
            "detection_recall"
        ),
        F.when(
            F.col("n_matched") > 0,
            2.0
            * (F.col("n_matched") / F.greatest(F.lit(n_ex), F.lit(1)))
            * (F.col("n_matched") / F.greatest(F.lit(n_gt), F.lit(1)))
            / (
                F.col("n_matched") / F.greatest(F.lit(n_ex), F.lit(1))
                + F.col("n_matched") / F.greatest(F.lit(n_gt), F.lit(1))
            ),
        )
        .otherwise(0.0)
        .alias("detection_f1"),
        F.coalesce("bbox_iou_mean", F.lit(0.0)).alias("bbox_iou_mean"),
        (F.col("assoc_ok") / F.greatest(F.col("n_matched"), F.lit(1))).alias(
            "image_association_acc"
        ),
        F.when(
            F.col("n_split") > 0, F.col("split_ok") / F.col("n_split")
        )
        .otherwise(F.lit(1.0))
        .alias("split_accuracy"),
    )
