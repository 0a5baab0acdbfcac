"""Structured Streaming surface (SURVEY.md §2.10 / north-star
"Structured Streaming for streams").

The fused extraction kernel is stateless per turn, so it lifts to
streaming unchanged: ``readStream`` → the same ``mapInPandas`` →
``writeStream``. Three entry points:

- ``stream_extract``   — continuous per-turn span extraction
- ``windowed_counts``  — event-time tumbling window + watermark agg
- ``running_totals``   — custom stateful operator
  (applyInPandasWithState): cumulative per-conversation span counts
  across micro-batches

Tests drive these with a file source and ``availableNow`` trigger and
compare against the batch pipeline.
"""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import pipeline, schema


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(schema.TRANSCRIPTS).parquet(path)


def stream_extract(transcripts: DataFrame) -> DataFrame:
    """Streaming DF of extracted spans — the batch kernel verbatim
    (mapInPandas is streaming-capable because it is stateless)."""
    return pipeline.extract(transcripts, mode="fused")


def windowed_counts(
    transcripts: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling counts per role with late-data watermark
    (the streaming analogue of structure.turn_counters)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(F.count("*").alias("turns"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "turns",
        )
    )


_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("through_turn", T.IntegerType(), False),
        T.StructField("cum_spans", T.LongType(), False),
        T.StructField("cum_questions", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("spans", T.LongType(), False),
        T.StructField("questions", T.LongType(), False),
    ]
)


def _totals_fn(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    spans, questions = state.get if state.exists else (0, 0)
    max_turn = -1
    from . import oracle

    for pdf in pdf_iter:
        for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
            rows = oracle.extract_turn(text)
            spans += len(rows)
            questions += sum(1 for r in rows if r["question_number"] is not None)
            max_turn = max(max_turn, int(turn_idx))
    state.update((spans, questions))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "through_turn": [max_turn],
            "cum_spans": [spans],
            "cum_questions": [questions],
        }
    )


def running_totals(transcripts: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-conversation running
    span/question totals, carried in GroupState across micro-batches
    (applyInPandasWithState; the streaming generalization of
    pipeline.conversation_stats)."""
    return (
        transcripts.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def read_pdf_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming PDF ingestion: watch a directory for new .pdf files
    and emit spans continuously — the fused parse+extract kernel is
    stateless, so it lifts to streaming unchanged (the arriving-crawl
    shape: extraction keeps up with the crawler instead of batching
    behind it)."""
    from . import pdf

    binary_file = T.StructType(
        [
            T.StructField("path", T.StringType(), True),
            T.StructField("modificationTime", T.TimestampType(), True),
            T.StructField("length", T.LongType(), True),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    raw = (
        spark.readStream.format("binaryFile")
        .schema(binary_file)
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.col("content").alias("payload"),
        )
    )
    return pdf.extract_pdf_turns(raw)


def run_to_parquet(
    stream_df: DataFrame, output_path: str, checkpoint: str
) -> None:
    """availableNow batch-drain of a streaming DF into parquet (tests
    and backfills); production would use a continuous trigger."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
