"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship per-turn extraction end-to-end on
transcripts deterministically derived from the sf0.001 tables.
``queries``/``oracle_sql`` expose every SQL-expressible operator
family from SURVEY.md §2 (plus the training-data-pipeline ops) for the
DuckDB cross-check; extraction-kernel queries that hinge on Python
``re`` semantics are registered without an oracle (rows-only check),
with their real correctness gate in tests/test_parity.py.
"""
from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def _derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts derived from the driver's documents
    table: one conversation per source, one turn per doc; even doc_ids
    carry synthetic exam payloads (seeded by doc_id), odd doc_ids carry
    the document's own prose (negative controls)."""
    import pandas as pd

    from xtract import schema

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )

    def to_turns(batches):
        from xtract import gen

        for pdf in batches:
            rows = []
            for doc_id, text, source in zip(pdf["doc_id"], pdf["text"], pdf["source"]):
                doc_id = int(doc_id)
                if doc_id % 2 == 0:
                    r = gen._rng(source, doc_id)
                    payload = gen._payload_b(r) if doc_id % 4 == 0 else gen._payload_a(r)
                else:
                    payload = text
                base = gen.turn_row(source, doc_id, 0)
                rows.append(
                    {
                        "conv_id": source,
                        "turn_idx": doc_id,
                        "role": base["role"],
                        "text": payload,
                        "tool": base["tool"],
                        "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=7 * doc_id),
                    }
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in schema.TRANSCRIPTS.fields]
                )

    return docs.mapInPandas(to_turns, schema=schema.TRANSCRIPTS)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full fused extraction over sf0.001-derived transcripts."""
    from xtract import pipeline

    return pipeline.extract(_derived_transcripts(spark, SF0001), mode="fused")


# ------------------------------------------------------------------ glue
def _extraction_queries() -> dict[str, Callable]:
    """Rows-only entries (Python-re kernel; no SQL oracle — the parity
    gate for these lives in tests/test_parity.py against the
    single-node oracle)."""
    from xtract import pipeline, structure

    def x_extract_spans(spark, sf_dir):
        return pipeline.extract(
            _derived_transcripts(spark, sf_dir), mode="fused"
        ).select(
            "conv_id",
            "turn_idx",
            "seq",
            "question_number",
            "qtype",
            "score",
            "span_text",
            "has_image",
            "image_count",
            "split_from_merged",
        )

    def x_extract_relational(spark, sf_dir):
        return pipeline.extract(
            _derived_transcripts(spark, sf_dir), mode="relational", merge="greedy"
        ).select(
            "conv_id", "turn_idx", "seq", "question_number", "qtype", "span_text"
        )

    def x_turn_counters(spark, sf_dir):
        spans = pipeline.extract(_derived_transcripts(spark, sf_dir), mode="fused")
        return structure.turn_counters(spans)

    def x_exam_info(spark, sf_dir):
        return pipeline.exam_info(_derived_transcripts(spark, sf_dir))

    def x_analyze_groups(spark, sf_dir):
        """v2-analyzer groups. Array columns (block_ids, merged_bbox)
        are projected to sortable scalars — the driver canonicalizer
        lexsorts cell values in pandas and cannot hash python lists."""
        g = pipeline.analyze(_derived_transcripts(spark, sf_dir), mode="fused")
        return g.select(
            "conv_id",
            "turn_idx",
            "group_seq",
            "gtype",
            F.array_join(F.transform("block_ids", lambda b: b.cast("string")), ",")
            .alias("block_ids_csv"),
            F.try_element_at("merged_bbox", F.lit(1)).alias("bx1"),
            F.try_element_at("merged_bbox", F.lit(2)).alias("by1"),
            F.try_element_at("merged_bbox", F.lit(3)).alias("bx2"),
            F.try_element_at("merged_bbox", F.lit(4)).alias("by2"),
            "merged_text",
        )

    def x_pdf_extract(spark, sf_dir):
        """PDF source arm: render seeded layout pages to real PDF
        bytes, parse the content streams back to layout payloads
        (xtract/pdf.py), and run the full extraction over them."""
        from xtract import pdf

        turns = pdf.pdf_to_transcripts(pdf.gen_pdf_turns(spark, 64, partitions=8))
        return pipeline.extract(turns, mode="fused").select(
            "conv_id", "turn_idx", "seq", "question_number", "qtype", "span_text"
        )

    def x_assemble(spark, sf_dir):
        """Cross-turn continuation merge over extracted spans (the
        multi-page question case the single-page reference cannot
        handle; xtract/assemble.py, parity in tests/test_assemble.py)."""
        from xtract import assemble

        spans = pipeline.extract(_derived_transcripts(spark, sf_dir), mode="fused")
        return assemble.merge_continuations(spans)

    def x_dup_spans(spark, sf_dir):
        """Near-duplicate question pairs over the engine's own
        extracted spans (winnowing fingerprints; fingerprint.dup_spans).
        Even doc_ids repeat payload seeds across sources, so real dup
        pairs exist in the derived corpus."""
        from xtract import fingerprint

        spans = pipeline.extract(_derived_transcripts(spark, sf_dir), mode="fused")
        # min_shared=8: the derived corpus reuses a small phrase
        # vocabulary, so loose thresholds explode pair counts
        return fingerprint.dup_spans(spans, min_shared=8)

    return {
        "x_extract_spans": x_extract_spans,
        "x_extract_relational": x_extract_relational,
        "x_turn_counters": x_turn_counters,
        "x_exam_info": x_exam_info,
        "x_analyze_groups": x_analyze_groups,
        "x_pdf_extract": x_pdf_extract,
        "x_assemble": x_assemble,
        "x_dup_spans": x_dup_spans,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xtract import queries as qmod

    out = dict(qmod.QUERIES)
    out.update(_extraction_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from xtract import queries as qmod

    return dict(qmod.ORACLE)
