"""Geometry column functions not already embedded in split/merge
(SURVEY.md §2.4 G6, G8-G10) — reusable native expressions."""
from __future__ import annotations

import pyspark.sql.functions as F


def iou(a, b):
    """G6 IoU of two [x1,y1,x2,y2] arrays; 0.0 when malformed or
    disjoint (evaluator.py:135-161)."""
    ok = (F.size(a) == 4) & (F.size(b) == 4)
    iw = F.greatest(F.lit(0), F.least(a[2], b[2]) - F.greatest(a[0], b[0]))
    ih = F.greatest(F.lit(0), F.least(a[3], b[3]) - F.greatest(a[1], b[1]))
    inter = iw * ih
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return F.when(ok & (union > 0), inter / union).otherwise(F.lit(0.0))


def normalize_coords(bbox, width, height):
    """G8: 0-1000-normalized coords → pixels, int truncation per the
    reference: int(v * dim / 1000) (tests/exam_paper_splitter_v3.py:108-126)."""
    dim = lambda i: width if i % 2 == 0 else height  # noqa: E731
    return F.array(
        *[
            (bbox[i] * dim(i) / 1000).cast("int")
            for i in range(4)
        ]
    )


def parse_bbox_string(col):
    """G9: '<bbox>x1 y1 x2 y2</bbox>' → array<int>
    (tests/exam_paper_splitter_v3.py:92-106); null when absent."""
    pat = r"<bbox>\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*</bbox>"
    nums = [
        F.nullif(F.regexp_extract(col, pat, i), F.lit("")).cast("int")
        for i in (1, 2, 3, 4)
    ]
    return F.when(nums[0].isNotNull(), F.array(*nums))


def autofix_scale(bbox, width, height):
    """G10 scale-mismatch autofix: when the recorded coords are clearly
    in a smaller space (max coord < min(page_dim)/3), rescale by
    actual/recorded (docs/坐标缩放问题修复说明.md:151-173). The recorded
    extent is estimated from the bbox itself (its max coordinate)."""
    max_c = F.greatest(bbox[0], bbox[1], bbox[2], bbox[3])
    needs = max_c < F.least(width, height) / 3
    scale = F.least(width, height).cast("double") / F.greatest(
        max_c.cast("double"), F.lit(1.0)
    )
    return F.when(
        needs, F.transform(bbox, lambda v: (v * scale).cast("int"))
    ).otherwise(bbox)
