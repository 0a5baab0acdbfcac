"""Split stage: merged multi-question text blocks → per-question spans.

Spark mapping of SURVEY.md §2.3-§2.4 / §2.7: detection happens in the
Arrow UDF (detect.py); everything else — line lookup (an intra-row
aggregate over the block's OCR lines), positional-estimate fallback
(G2), y-ordering (W2), lead-boundaries (W3/G3), char slicing (R11),
sub-ids (G4) — is native Spark SQL, inside whole-stage codegen.

Reference semantics mirrored here:
- ≤1 validated match → block passes through whole, optionally tagged
  with its single question number (question_splitter.py:58-63).
- ≥2 matches, OCR lines present → each match resolves to the
  best-scoring line containing str(number); unresolved matches are
  dropped silently (question_splitter.py:242-275).
- ≥2 matches, no lines → linear char-ratio estimate for ALL matches
  (question_splitter.py:277-308).
- boundaries: sort by located y (stable), bottom = next top else block
  bottom, min-height clamp 50px (question_splitter.py:338-407).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .config import LIMITS
from .detect import with_matches

# columns shared by both the pass-through and the split arm
SPAN_COLS = [
    "conv_id",
    "turn_idx",
    "block_pos",
    "span_ord",
    "question_number",
    "span_text",
    "bbox",
    "split_from_merged",
    "source_block_id",
    "confidence",
]


def _strip(col):
    """Python str.strip() parity: (?U) makes Java \\s match the same
    unicode whitespace class Python strips."""
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


def split_spans(blocks: DataFrame, mode: str = "v1") -> DataFrame:
    """exploded text blocks (sources.exploded_blocks) → span rows.

    Narrow except for one window keyed by (conv_id, turn_idx,
    block_pos) — at scale this is the only ordering-sensitive step and
    its key is strictly finer than the turn key, so skew cannot
    concentrate (SURVEY.md §4 note on per-turn parallelism).
    """
    tb = blocks.filter(F.col("block.block_label") == "text")
    tb = with_matches(tb, "block.block_content", mode)

    content = F.col("block.block_content")
    bbox = F.col("block.block_bbox")
    valid = (F.length(F.coalesce(content, F.lit(""))) > 0) & (F.size(bbox) == 4)
    n = F.size("matches")

    # ---- pass-through arm (P2 guard / single-number blocks) ----------
    whole = tb.filter(~valid | (n <= 1)).select(
        "conv_id",
        "turn_idx",
        "block_pos",
        F.lit(0).alias("span_ord"),
        F.when(valid & (n == 1), F.col("matches")[0]["number"])
        .cast("int")
        .alias("question_number"),
        content.alias("span_text"),
        bbox.alias("bbox"),
        F.lit(False).alias("split_from_merged"),
        F.col("block.block_id").alias("source_block_id"),
        F.lit(1.0).alias("confidence"),
    )

    # ---- split arm ---------------------------------------------------
    multi = tb.filter(valid & (n >= 2)).select(
        "conv_id",
        "turn_idx",
        "block_pos",
        content.alias("content"),
        bbox.alias("bb"),
        F.col("block.block_id").alias("block_id"),
        F.col("own_lines").alias("own_lines"),
        F.posexplode("matches").alias("m_pos", "m"),
    )

    x1 = F.col("bb")[0]
    y1 = F.col("bb")[1]
    x2 = F.col("bb")[2]
    y2 = F.col("bb")[3]
    has_lines = F.size("own_lines") > 0

    # line lookup: best-scoring line containing str(number); strict ">"
    # keeps the first line on score ties (question_splitter.py:253-260)
    num_str = F.col("m.number").cast("string")
    containing = F.filter(
        F.col("own_lines"), lambda l: F.instr(l["text"], num_str) > 0
    )
    best = F.aggregate(
        containing,
        F.struct(
            F.lit(0.0).alias("score"),
            F.lit(None).cast("double").alias("rel_y"),
        ),
        lambda acc, l: F.when(
            F.coalesce(l["score"], F.lit(0.0)) > acc["score"],
            F.struct(
                F.coalesce(l["score"], F.lit(0.0)).alias("score"),
                F.array_min(F.transform(l["poly"], lambda p: p[1])).alias("rel_y"),
            ),
        ).otherwise(acc),
    )

    # estimate fallback (G2): int() truncation order matches reference
    est_y = y1 + (
        y2.cast("double") - y1.cast("double")
    ) * (F.col("m.position").cast("double") / F.length("content"))

    multi = multi.select(
        "*",
        F.when(
            has_lines,
            F.when(
                best["rel_y"].isNotNull(),
                (y1 + best["rel_y"]).cast("int"),
            ),
        )
        .otherwise(est_y.cast("int"))
        .alias("top_y"),
        F.when(has_lines, best["score"])
        .otherwise(F.lit(LIMITS.estimate_confidence))
        .alias("confidence"),
    ).filter(F.col("top_y").isNotNull())

    w = Window.partitionBy("conv_id", "turn_idx", "block_pos").orderBy(
        "top_y", "m_pos"
    )
    nxt_start = F.lead("m.lookup_pos").over(w)
    nxt_top = F.lead("top_y").over(w)

    start = F.col("m.lookup_pos")
    end = F.coalesce(nxt_start, F.length("content"))
    piece = _strip(F.substring(F.col("content"), start + 1, end - start))

    top = F.col("top_y")
    bottom0 = F.coalesce(nxt_top, y2)
    bottom = F.when(
        bottom0 - top < LIMITS.min_question_height,
        top + LIMITS.min_question_height,
    ).otherwise(bottom0)

    split_rows = multi.select(
        "conv_id",
        "turn_idx",
        "block_pos",
        (F.row_number().over(w) - 1).alias("span_ord"),
        F.col("m.number").alias("question_number"),
        piece.alias("span_text"),
        F.array(
            x1.cast("int"), top.cast("int"), x2.cast("int"), bottom.cast("int")
        ).alias("bbox"),
        F.lit(True).alias("split_from_merged"),
        F.col("block_id").alias("source_block_id"),
        F.col("confidence"),
    )

    return whole.select(SPAN_COLS).unionByName(split_rows.select(SPAN_COLS))


def split_spans_v2(blocks: DataFrame) -> DataFrame:
    """v2 OCR-based split, relational form (v2:97-245 semantics):

    - detection: unanchored patterns + line-start/content validation
      (strict arm of the R4 arbitration; the deterministic no-VL
      fallback is strict either way, v2:390-399)
    - geometry: per match, the FIRST OCR line whose stripped text
      matches ^n\\. |^n、|第n题|\\(n\\) (v2:249-261) — an intra-row
      lookup via higher-order filter with a dynamic regex
    - any unresolved match aborts the whole block's split (v2:134-136)
    - sub-block 0 slices from char 0 and inherits the parent top;
      ids are parent*100+i (v2:140-153); no min-height clamp

    Output columns = SPAN_COLS, with ``source_block_id`` carrying the
    v2 id (parent*100+i for splits, the block's own id otherwise) —
    the group-assembly key of groups.py.
    """
    tb = blocks.filter(F.col("block.block_label") == "text")
    tb = with_matches(tb, "block.block_content", "v2-strict")

    content = F.col("block.block_content")
    bbox = F.col("block.block_bbox")
    valid = (F.length(F.coalesce(content, F.lit(""))) > 0) & (F.size(bbox) == 4)
    n = F.size("matches")

    # per-match line-top lookup (None → unresolved)
    def line_top(m):
        num = m["number"].cast("string")
        pat = F.concat(
            F.lit("^"), num, F.lit("\\.|^"), num, F.lit("、|第"),
            num, F.lit("题|\\("), num, F.lit("\\)"),
        )
        hits = F.filter(
            F.col("own_lines"),
            lambda l: F.regexp_like(
                F.regexp_replace(l["text"], r"(?U)^\s+|\s+$", ""), pat
            ),
        )
        return F.when(
            F.size(hits) > 0,
            (bbox[1] + F.array_min(F.transform(hits[0]["poly"], lambda p: p[1])))
            .cast("int"),
        )

    tops = F.transform(F.col("matches"), line_top)
    can_split = (
        valid
        & (n >= 2)
        & (F.size("own_lines") > 0)
        & ~F.exists(tops, lambda t_: t_.isNull())
    )
    tb = tb.withColumn("tops", tops).withColumn("can_split", can_split)

    whole = tb.filter(~F.col("can_split")).select(
        "conv_id",
        "turn_idx",
        "block_pos",
        F.lit(0).alias("span_ord"),
        F.lit(None).cast("int").alias("question_number"),
        content.alias("span_text"),
        bbox.alias("bbox"),
        F.lit(False).alias("split_from_merged"),
        F.col("block.block_id").alias("source_block_id"),
        F.lit(1.0).alias("confidence"),
    )

    multi = tb.filter(F.col("can_split")).select(
        "conv_id",
        "turn_idx",
        "block_pos",
        content.alias("content"),
        bbox.alias("bb"),
        F.col("block.block_id").alias("block_id"),
        F.posexplode(F.arrays_zip("matches", "tops")).alias("m_pos", "mt"),
    )

    y1 = F.col("bb")[1]
    y2 = F.col("bb")[3]
    w = Window.partitionBy("conv_id", "turn_idx", "block_pos").orderBy("m_pos")
    raw_top = F.col("mt.tops")
    pos = F.col("mt.matches.position")
    first = F.col("m_pos") == 0

    start = F.when(first, F.lit(0)).otherwise(pos)
    end = F.coalesce(F.lead(pos).over(w), F.length("content"))
    piece = _strip(F.substring(F.col("content"), start + 1, end - start))
    top = F.when(first, y1).otherwise(raw_top)
    bottom = F.coalesce(F.lead(raw_top).over(w), y2)

    split_rows = multi.select(
        "conv_id",
        "turn_idx",
        "block_pos",
        F.col("m_pos").alias("span_ord"),
        F.col("mt.matches.number").alias("question_number"),
        piece.alias("span_text"),
        F.array(
            F.col("bb")[0].cast("int"),
            top.cast("int"),
            F.col("bb")[2].cast("int"),
            bottom.cast("int"),
        ).alias("bbox"),
        F.lit(True).alias("split_from_merged"),
        (F.col("block_id") * LIMITS.sub_id_factor + F.col("m_pos")).alias(
            "source_block_id"
        ),
        F.lit(1.0).alias("confidence"),
    )

    return whole.select(SPAN_COLS).unionByName(split_rows.select(SPAN_COLS))
