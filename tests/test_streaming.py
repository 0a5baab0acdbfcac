"""Structured Streaming parity: the streaming plans produce the same
results as their batch twins over a file source drained with
availableNow."""
import pyspark.sql.functions as F
import pytest

from xtract import gen, pipeline, streaming

N = 6


@pytest.fixture(scope="module")
def tdir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "transcripts")
    gen.transcripts(spark, N).write.parquet(src)
    return base, src


def test_stream_extract_matches_batch(spark, tdir):
    base, src = tdir
    out = str(base / "spans_out")
    stream = streaming.stream_extract(streaming.read_transcript_stream(spark, src))
    assert stream.isStreaming
    streaming.run_to_parquet(stream, out, str(base / "ck1"))

    got = sorted(
        (r.conv_id, r.turn_idx, r.seq, r.question_number, r.span_text)
        for r in spark.read.parquet(out).collect()
    )
    exp = sorted(
        (r.conv_id, r.turn_idx, r.seq, r.question_number, r.span_text)
        for r in pipeline.extract(spark.read.parquet(src), mode="fused").collect()
    )
    assert got == exp


def test_windowed_counts_match_batch(spark, tdir):
    base, src = tdir
    out = str(base / "win_out")
    # zero watermark: every window closes by end-of-stream, so the
    # append-mode output equals the batch aggregation exactly
    stream = streaming.windowed_counts(
        streaming.read_transcript_stream(spark, src), watermark="0 seconds"
    )
    streaming.run_to_parquet(stream, out, str(base / "ck2"))

    got = sorted(
        (r.win_start, r.win_end, r.role, r.turns)
        for r in spark.read.parquet(out).collect()
    )
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .agg(F.count("*").alias("turns"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "turns",
        )
    )
    # append mode never flushes a window that could still receive
    # data: only windows closed by the final watermark (= max event
    # time with a 0s delay) are emitted
    max_ts = spark.read.parquet(src).agg(F.max("ts")).collect()[0][0]
    exp = sorted(
        (r.win_start, r.win_end, r.role, r.turns)
        for r in batch.collect()
        if r.win_end <= max_ts
    )
    assert got == exp and len(got) > 0


def test_running_totals_state(spark, tdir):
    base, src = tdir
    out = str(base / "tot_out")
    stream = streaming.running_totals(streaming.read_transcript_stream(spark, src))
    streaming.run_to_parquet(stream, out, str(base / "ck3"))

    got = {
        r.conv_id: (r.cum_spans, r.cum_questions)
        for r in spark.read.parquet(out).collect()
    }
    spans = pipeline.extract(spark.read.parquet(src), mode="fused")
    exp = {
        r.conv_id: (r.spans, r.numbered)
        for r in pipeline.conversation_stats(spans).collect()
    }
    assert got == exp


def test_pdf_stream_matches_batch(spark, tmp_path):
    """Streaming PDF ingestion (binaryFile file-watch → fused
    parse+extract) drains to the same spans the batch path produces."""
    import json

    from xtract import gen, pdf

    pdir = tmp_path / "pdfs"
    pdir.mkdir()
    for i in range(6):
        payload = json.loads(gen._payload_b(gen._rng("sc", i)))
        (pdir / f"p{i}.pdf").write_bytes(
            pdf.make_pdf(
                payload["blocks"],
                payload["page"]["width"],
                payload["page"]["height"],
                compress=(i % 2 == 0),
            )
        )
    out = str(tmp_path / "spans")
    stream = streaming.read_pdf_stream(spark, str(pdir))
    assert stream.isStreaming
    streaming.run_to_parquet(stream, out, str(tmp_path / "ck_pdf"))

    got = {
        (r.conv_id, r.seq, r.question_number, r.span_text)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.conv_id, r.seq, r.question_number, r.span_text)
        for r in pdf.read_pdfs(spark, str(pdir))
        .transform(lambda df: __import__("xtract.pipeline", fromlist=["extract"]).extract(df))
        .collect()
    }
    assert got == want and len(got) > 0
