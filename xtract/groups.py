"""Group assembly — the v2 analyzer's semantic-aggregation stage with
the VL call (X4) replaced by its deterministic routing rule
(SURVEY.md §2.9): doc_title→doc_title, paragraph_title→header,
aside_text/number→aside, text (post-v2-split)→question with its
greedily-assigned images; leftovers repaired to 'unknown' singletons
(J7, …vl_ocr.py:822-851); per-group min/max bbox + ordered text concat
(A1, …vl_ocr.py:781-819).

Everything after the split/merge stages is native Spark: the J7 repair
is a left_anti join, A1 is a groupBy over posexploded block_ids with
an ordinal-sorted array_join — the collect preserves block_ids order,
not sorted id order (SURVEY.md §7.4 known-hard #7).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from . import merge as merge_mod
from . import sources, split

GROUP_COLS = [
    "conv_id",
    "turn_idx",
    "group_seq",
    "gtype",
    "block_ids",
    "merged_bbox",
    "merged_text",
]

_SINGLETON_TYPES = {
    "doc_title": "doc_title",
    "paragraph_title": "header",
    "aside_text": "aside",
    "number": "aside",
}

_BIG = 1 << 30


def analyze(transcripts: DataFrame) -> DataFrame:
    """transcripts → one row per group (GROUP_COLS), relational plan."""
    parsed = sources.parse_payloads(transcripts)
    blocks = sources.exploded_blocks(parsed)

    spans = split.split_spans_v2(blocks)
    images = merge_mod.image_blocks(blocks)
    merged = merge_mod.merge_greedy(spans, images)

    # recover ordering keys for the question groups
    span_keys = spans.select(
        F.col("conv_id").alias("s_conv"),
        F.col("turn_idx").alias("s_turn"),
        "block_pos",
        "span_ord",
        F.col("source_block_id").alias("sbid"),
    )
    merged = merged.join(
        span_keys,
        (merged["conv_id"] == span_keys["s_conv"])
        & (merged["turn_idx"] == span_keys["s_turn"])
        & (merged["source_block_id"] == span_keys["sbid"]),
    ).drop("s_conv", "s_turn", "sbid")

    question_groups = merged.select(
        "conv_id",
        "turn_idx",
        F.lit("question").alias("gtype"),
        F.concat(F.array("source_block_id"), F.col("image_ids")).alias("block_ids"),
        F.col("block_pos").alias("ord1"),
        F.col("span_ord").alias("ord2"),
    )

    nontext = blocks.filter(F.col("block.block_label") != "text").select(
        "conv_id",
        "turn_idx",
        F.col("block.block_label").alias("label"),
        F.col("block.block_id").alias("bid"),
        "block_pos",
    )
    singleton_groups = (
        nontext.filter(F.col("label").isin(list(_SINGLETON_TYPES)))
        .replace(_SINGLETON_TYPES, subset=["label"])
        .select(
            "conv_id",
            "turn_idx",
            F.col("label").alias("gtype"),
            F.array("bid").alias("block_ids"),
            F.col("block_pos").alias("ord1"),
            F.lit(0).alias("ord2"),
        )
    )

    assembled = question_groups.unionByName(singleton_groups)

    # J7: every refined id not claimed by a group → 'unknown' singleton
    refined_ids = spans.select(
        "conv_id", "turn_idx", F.col("source_block_id").alias("bid")
    ).unionByName(nontext.select("conv_id", "turn_idx", "bid"))
    claimed = assembled.select(
        "conv_id", "turn_idx", F.explode("block_ids").alias("bid")
    )
    unknown = (
        refined_ids.join(claimed, ["conv_id", "turn_idx", "bid"], "left_anti")
        .select(
            "conv_id",
            "turn_idx",
            F.lit("unknown").alias("gtype"),
            F.array("bid").alias("block_ids"),
            F.lit(_BIG).alias("ord1"),
            F.col("bid").alias("ord2"),
        )
    )
    groups = assembled.unionByName(unknown)

    # A1: explode block_ids (keeping their ordinal), join block info,
    # min/max bbox + ordinal-ordered non-empty text concat
    info = spans.select(
        "conv_id",
        "turn_idx",
        F.col("source_block_id").alias("bid"),
        F.col("bbox").alias("bb"),
        F.col("span_text").alias("txt"),
    ).unionByName(
        blocks.filter(F.col("block.block_label") != "text").select(
            "conv_id",
            "turn_idx",
            F.col("block.block_id").alias("bid"),
            F.col("block.block_bbox").alias("bb"),
            F.col("block.block_content").alias("txt"),
        )
    )

    # group_seq must be assigned BEFORE the explode — a window and a
    # generator in one select would rank the exploded rows instead
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ord1", "ord2")
    seqd = groups.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w) - 1).alias("group_seq"),
        "gtype",
        "block_ids",
    )
    keyed = seqd.select(
        "conv_id",
        "turn_idx",
        "group_seq",
        "gtype",
        "block_ids",
        F.posexplode("block_ids").alias("bid_ord", "bid"),
    )
    j = keyed.join(info, ["conv_id", "turn_idx", "bid"])
    agg = j.groupBy("conv_id", "turn_idx", "group_seq", "gtype", "block_ids").agg(
        F.array(
            F.min(F.col("bb")[0]).cast("int"),
            F.min(F.col("bb")[1]).cast("int"),
            F.max(F.col("bb")[2]).cast("int"),
            F.max(F.col("bb")[3]).cast("int"),
        ).alias("merged_bbox"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.length(F.coalesce("txt", F.lit(""))) > 0,
                            F.struct("bid_ord", "txt"),
                        )
                    )
                ),
                lambda s: s["txt"],
            ),
            " ",
        ).alias("merged_text"),
    )
    return agg.select(GROUP_COLS)
