"""End-to-end extraction pipeline with two execution strategies.

- ``mode='fused'`` (default, the 100-TB path): the whole per-turn
  extraction — payload parse, detect, split, merge, structure — runs
  as ONE Arrow-batched ``mapInPandas`` kernel. Per-turn extraction is
  embarrassingly parallel, so this plan has ZERO shuffles: scan →
  narrow map → sink. This is exactly the architecture the north star
  prescribes ("each turn's text payload is parsed via vectorized
  pandas/Arrow UDFs ... to emit extracted main-content spans per
  turn"); stable turn ordering is a property of the (conv_id,
  turn_idx) keys carried on every row, not of physical row order.

- ``mode='relational'`` (the operator-demonstration path): each
  reference operator is expressed as its Spark-native mapping
  (SURVEY.md §2 tables): from_json scan → posexplode → detection UDF →
  window lead-boundaries → theta join / cogrouped greedy → native
  structuring. Costs shuffles (split window, merge by turn key,
  final seq window) but exposes every operator to Catalyst
  individually. Tests assert both modes agree row-for-row.

Skew note: every keyed operation here partitions by (conv_id,
turn_idx) or finer — never by conv_id alone — so mega-conversations
(FIXTURES.md §1) cannot concentrate on one task. Per-conversation
rollups (conversation_stats) do aggregate on conv_id, via partial
aggregation (map-side combine), which is skew-safe for counters.
"""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import merge as merge_mod
from . import oracle, schema, sources, split, structure


def extract(
    transcripts: DataFrame,
    mode: str = "fused",
    merge: str = "greedy",
) -> DataFrame:
    """transcripts → one row per extracted question span (schema.SPANS)."""
    if mode == "fused":
        return _extract_fused(transcripts)
    if mode != "relational":
        raise ValueError(f"unknown mode: {mode}")

    parsed = sources.parse_payloads(transcripts)
    blocks = sources.exploded_blocks(parsed)
    spans = split.split_spans(blocks, mode="v1")
    images = merge_mod.image_blocks(blocks)
    if merge == "greedy":
        merged = merge_mod.merge_greedy(spans, images)
    elif merge == "rank1":
        merged = merge_mod.merge_rank1(spans, images)
    else:
        raise ValueError(f"unknown merge strategy: {merge}")
    return structure.structure(merged)


def _extract_fused(transcripts: DataFrame) -> DataFrame:
    """Single-kernel strategy. The kernel is the same per-turn logic the
    relational plan spells out operator-by-operator; tests cross-check
    the two strategies and the pure-Python oracle against each other."""

    field_names = [f.name for f in schema.SPANS.fields]

    def kernel(batches):
        for pdf in batches:
            # columnar accumulation: one list per output column (much
            # cheaper than list-of-dicts → DataFrame at Arrow scale)
            cols = {name: [] for name in field_names}
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                turn_idx = int(turn_idx)
                for seq, row in enumerate(oracle.extract_turn(text)):
                    cols["conv_id"].append(conv_id)
                    cols["turn_idx"].append(turn_idx)
                    cols["seq"].append(seq)
                    for k, v in row.items():
                        cols[k].append(v)
            if cols["conv_id"]:
                yield pd.DataFrame(cols, columns=field_names)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        kernel, schema=schema.SPANS
    )


def exam_info(transcripts: DataFrame) -> DataFrame:
    """Per-turn exam metadata (schema.EXAM_INFO)."""
    parsed = sources.parse_payloads(transcripts)
    return structure.exam_info(sources.exploded_blocks(parsed))


def conversation_stats(final_spans: DataFrame) -> DataFrame:
    """Per-conversation rollup — the one agg keyed by conv_id alone.
    Partial aggregation makes it skew-safe; a mega-conversation
    contributes pre-combined partial rows, not raw spans."""
    return final_spans.groupBy("conv_id").agg(
        F.count("*").alias("spans"),
        F.count_if(F.col("question_number").isNotNull()).alias("numbered"),
        F.count_if("has_image").alias("with_images"),
        F.sum("image_count").alias("images"),
        F.count_if("split_from_merged").alias("from_split"),
        F.countDistinct("turn_idx").alias("turns_with_spans"),
    )


def flatten_groups(groups: DataFrame) -> DataFrame:
    """Analyzer groups with array columns projected to sortable
    scalars (block_ids → csv, merged_bbox → 4 int columns) — the one
    serialization rule shared by the driver-contract row and the
    job.py --groups sink (driver canonicalization cannot hash python
    lists)."""
    return groups.select(
        "conv_id",
        "turn_idx",
        "group_seq",
        "gtype",
        F.array_join(F.col("block_ids").cast("array<string>"), ",").alias(
            "block_ids_csv"
        ),
        F.try_element_at("merged_bbox", F.lit(1)).alias("bx1"),
        F.try_element_at("merged_bbox", F.lit(2)).alias("by1"),
        F.try_element_at("merged_bbox", F.lit(3)).alias("bx2"),
        F.try_element_at("merged_bbox", F.lit(4)).alias("by2"),
        "merged_text",
    )


def analyze(transcripts: DataFrame, mode: str = "fused") -> DataFrame:
    """v2-analyzer groups output (groups.GROUP_COLS): fused single
    kernel, or the relational plan in groups.py."""
    if mode == "relational":
        from . import groups

        return groups.analyze(transcripts)

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("group_seq", T.IntegerType(), False),
            T.StructField("gtype", T.StringType(), False),
            T.StructField("block_ids", T.ArrayType(T.IntegerType()), False),
            T.StructField("merged_bbox", T.ArrayType(T.IntegerType()), False),
            T.StructField("merged_text", T.StringType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for g in oracle.analyze_turn(text):
                    rows.append(
                        {"conv_id": conv_id, "turn_idx": int(turn_idx), **g}
                    )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        kernel, schema=out_schema
    )
