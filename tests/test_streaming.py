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


def test_assemble_stream_matches_batch_sparse(spark, tmp_path):
    """Streaming continuation assembly: spans arrive in TWO
    micro-batches split at a turn boundary (maxFilesPerTrigger=1, file
    mtimes ordered); reconstructing final rows + latest open tails must
    equal the batch boundary-only assembly segment-for-segment —
    including chains cut BY the batch boundary itself."""
    import os
    import time as time_mod

    from xtract import assemble, gen

    spans = pipeline.extract(gen.transcripts(spark, 16, partitions=4), mode="fused")
    spans = spans.select(
        "conv_id", "turn_idx", "seq", "question_number", "span_text", "bbox"
    ).cache()
    mid = spans.agg(F.expr("percentile_approx(turn_idx, 0.5)")).collect()[0][0]

    src = str(tmp_path / "src")
    os.makedirs(src)
    spans.filter(F.col("turn_idx") <= mid).coalesce(1).write.parquet(src + "/b0")
    spans.filter(F.col("turn_idx") > mid).coalesce(1).write.parquet(src + "/b1")
    # one data file per directory → move into a flat dir with ordered mtimes
    import glob as globmod
    import shutil

    for i, d in enumerate(("b0", "b1")):
        (f,) = globmod.glob(f"{src}/{d}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (1000000 + i * 100, 1000000 + i * 100))
        shutil.rmtree(f"{src}/{d}")

    sschema = (
        "conv_id string, turn_idx int, seq int, question_number int, "
        "span_text string, bbox array<int>"
    )
    stream = (
        spark.readStream.schema(sschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    streaming.run_to_parquet(
        streaming.assemble_stream(stream), out, str(tmp_path / "ck")
    )

    emitted = spark.read.parquet(out).collect()
    finals = {}
    tails = {}
    for r in emitted:
        key = (r.conv_id, r.head_turn, r.head_seq)
        if r.final:
            finals[key] = r
        else:
            # head identity advances monotonically; keep the latest
            prev = tails.get(r.conv_id)
            if prev is None or (r.head_turn, r.head_seq, r.n_parts) >= (
                prev.head_turn,
                prev.head_seq,
                prev.n_parts,
            ):
                tails[r.conv_id] = r
    for conv, r in tails.items():
        key = (conv, r.head_turn, r.head_seq)
        if key not in finals:
            finals[key] = r

    got = sorted(
        (
            (k[0], r.head_turn, r.head_seq, r.turn_first, r.turn_last,
             r.question_number, r.qtype, r.score, r.span_text, r.n_parts)
            for k, r in finals.items()
        ),
        key=repr,
    )
    want = sorted(
        (
            (r.conv_id, r.head_turn, r.head_seq, r.turn_first, r.turn_last,
             r.question_number, r.qtype, r.score, r.span_text, r.n_parts)
            for r in assemble.merge_continuations_sparse(spans).collect()
        ),
        key=repr,
    )
    assert got == want and len(got) > 0
    spans.unpersist()


def test_assemble_stream_rejects_out_of_order_arrival(spark, tmp_path):
    """The documented arrival contract is ENFORCED: a producer that
    delivers a span at or before the last consumed (turn, phys, seq)
    position fails the query loudly (state carries the last consumed
    position) instead of silently emitting wrong segments."""
    import os

    import pandas as pd
    from pyspark.errors import StreamingQueryException

    def span_file(path, rows, mtime):
        pdf = pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "seq", "question_number", "span_text"],
        )
        spark.createDataFrame(
            pdf,
            "conv_id string, turn_idx int, seq int, question_number int, "
            "span_text string",
        ).coalesce(1).write.parquet(path + ".d")
        import glob as globmod
        import shutil

        (f,) = globmod.glob(path + ".d/part-*.parquet")
        shutil.move(f, path)
        shutil.rmtree(path + ".d")
        os.utime(path, (mtime, mtime))

    src = str(tmp_path / "src")
    os.makedirs(src)
    span_file(f"{src}/b0.parquet", [("c", 0, 0, 1, "1、甲题"), ("c", 2, 0, 2, "2、乙题")], 1000000)
    # batch 2 regresses to turn 1 — before the consumed turn-2 span
    span_file(f"{src}/b1.parquet", [("c", 1, 0, None, "迟到的续页")], 1000100)

    sschema = "conv_id string, turn_idx int, seq int, question_number int, span_text string"
    stream = (
        spark.readStream.schema(sschema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    with pytest.raises(StreamingQueryException, match="order violation"):
        streaming.run_to_parquet(
            streaming.assemble_stream(stream),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        )


def _write_span_batches(spark, tmp_path, spans_pdf, order_key, n_batches):
    """Write span rows as n_batches parquet files in order_key order
    with ascending mtimes (maxFilesPerTrigger=1 → one batch each)."""
    import os

    import numpy as np

    src = str(tmp_path / "src")
    os.makedirs(src)
    spans_pdf = spans_pdf.sort_values(order_key, kind="stable").reset_index(drop=True)
    chunks = np.array_split(spans_pdf.index.values, n_batches)
    sschema = (
        "conv_id string, turn_idx int, seq int, question_number int, "
        "span_text string"
    )
    import glob as globmod
    import shutil

    for i, idx in enumerate(c for c in chunks if len(c)):
        part = spans_pdf.loc[idx, ["conv_id", "turn_idx", "seq", "question_number", "span_text"]]
        d = f"{src}/b{i}.d"
        spark.createDataFrame(part, sschema).coalesce(1).write.parquet(d)
        (f,) = globmod.glob(d + "/part-*.parquet")
        dst = f"{src}/batch{i:03d}.parquet"
        shutil.move(f, dst)
        shutil.rmtree(d)
        os.utime(dst, (1000000 + i * 100, 1000000 + i * 100))
    return src, sschema


def test_assemble_stream_unordered_bounded_jitter_parity(spark, tmp_path):
    """Bounded-disorder assembly: spans arrive jittered by up to
    L-1 turns (deterministic per-span jitter), cut into 6 micro-batches;
    reconstruct_unordered(emitted) must equal the batch sparse assembly
    segment-for-segment."""
    from xtract import assemble

    L = 6
    spans = pipeline.extract(gen.transcripts(spark, 10, partitions=4), mode="fused")
    spans = spans.select(
        "conv_id", "turn_idx", "seq", "question_number", "span_text"
    ).cache()
    pdf = spans.toPandas()
    # deterministic jitter up to and INCLUDING L (the documented
    # inclusive bound) — crc32, NOT python hash(): the salted str hash
    # changes per interpreter, making failures unreproducible
    import zlib

    pdf["jit"] = [
        zlib.crc32(f"{c}:{t}:{s}".encode()) % (L + 1)
        for c, t, s in zip(pdf.conv_id, pdf.turn_idx, pdf.seq)
    ]
    pdf["akey"] = pdf.turn_idx + pdf.jit
    src, sschema = _write_span_batches(spark, tmp_path, pdf, ["akey"], 6)

    stream = (
        spark.readStream.schema(sschema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "out")
    streaming.run_to_parquet(
        streaming.assemble_stream_unordered(stream, lateness_turns=L),
        out,
        str(tmp_path / "ck"),
    )
    rec = streaming.reconstruct_unordered(spark.read.parquet(out))
    got = sorted(
        (
            (r.conv_id, r.head_turn, r.head_seq, r.turn_first, r.turn_last,
             r.question_number, r.qtype, r.score, r.span_text, r.n_parts)
            for r in rec.collect()
        ),
        key=repr,
    )
    want = sorted(
        (
            (r.conv_id, r.head_turn, r.head_seq, r.turn_first, r.turn_last,
             r.question_number, r.qtype, r.score, r.span_text, r.n_parts)
            for r in assemble.merge_continuations_sparse(spans).collect()
        ),
        key=repr,
    )
    assert got == want and len(got) > 0
    spans.unpersist()


def test_assemble_stream_unordered_rejects_beyond_bound(spark, tmp_path):
    """A span later than lateness_turns fails the query loudly."""
    import pandas as pd

    from pyspark.errors import StreamingQueryException

    rows = pd.DataFrame(
        [
            ("c", 0, 0, 1, "1、甲题"),
            # turn 9 advances the frontier to 6 -> turn 0 is consumed
            ("c", 9, 0, 2, "2、乙题"),
            # then another turn-0 span arrives: behind the consumed
            # frontier, unrecoverable at L=3
            ("c", 0, 1, None, "超出乱序界限的续页"),
        ],
        columns=["conv_id", "turn_idx", "seq", "question_number", "span_text"],
    )
    rows["akey"] = [0, 1, 2]  # arrival order as listed
    src, sschema = _write_span_batches(spark, tmp_path, rows, ["akey"], 3)
    stream = (
        spark.readStream.schema(sschema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    with pytest.raises(StreamingQueryException, match="disorder bound exceeded"):
        streaming.run_to_parquet(
            streaming.assemble_stream_unordered(stream, lateness_turns=3),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        )


def test_assemble_stream_resumes_from_checkpoint(spark, tmp_path):
    """North-rule resumability on the streaming path: drain batch 0
    with availableNow, STOP, add batch 1, restart with the SAME
    checkpoint dir — GroupState (the open tail, possibly mid-chain)
    recovers from the state store and the combined output still equals
    the batch sparse assembly."""
    from xtract import assemble, gen

    spans = pipeline.extract(gen.transcripts(spark, 8, partitions=4), mode="fused")
    spans = spans.select(
        "conv_id", "turn_idx", "seq", "question_number", "span_text", "bbox"
    ).cache()
    mid = spans.agg(F.expr("percentile_approx(turn_idx, 0.5)")).collect()[0][0]

    import glob as globmod
    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    sschema = (
        "conv_id string, turn_idx int, seq int, question_number int, "
        "span_text string, bbox array<int>"
    )

    def add_batch(df, i):
        d = f"{src}/b{i}.d"
        df.coalesce(1).write.parquet(d)
        (f,) = globmod.glob(d + "/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (1000000 + i * 100, 1000000 + i * 100))
        shutil.rmtree(d)

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    # run 1: only the first half exists
    add_batch(spans.filter(F.col("turn_idx") <= mid), 0)
    stream = spark.readStream.schema(sschema).parquet(src)
    streaming.run_to_parquet(streaming.assemble_stream(stream), out, ck)

    # run 2: second half arrives after a full stop/restart
    add_batch(spans.filter(F.col("turn_idx") > mid), 1)
    stream = spark.readStream.schema(sschema).parquet(src)
    streaming.run_to_parquet(streaming.assemble_stream(stream), out, ck)

    emitted = spark.read.parquet(out).collect()
    finals, tails = {}, {}
    for r in emitted:
        key = (r.conv_id, r.head_turn, r.head_seq)
        if r.final:
            finals[key] = r
        else:
            prev = tails.get(r.conv_id)
            if prev is None or (r.head_turn, r.head_seq, r.n_parts) >= (
                prev.head_turn, prev.head_seq, prev.n_parts,
            ):
                tails[r.conv_id] = r
    for conv, r in tails.items():
        key = (conv, r.head_turn, r.head_seq)
        if key not in finals:
            finals[key] = r

    got = sorted(
        (
            (k[0], r.head_turn, r.head_seq, r.turn_first, r.turn_last,
             r.question_number, r.span_text, r.n_parts)
            for k, r in finals.items()
        ),
        key=repr,
    )
    want = sorted(
        (
            (r.conv_id, r.head_turn, r.head_seq, r.turn_first, r.turn_last,
             r.question_number, r.span_text, r.n_parts)
            for r in assemble.merge_continuations_sparse(spans).collect()
        ),
        key=repr,
    )
    assert got == want and len(got) > 0
    spans.unpersist()


def test_dedup_transcripts_stream(spark, tmp_path):
    """Streaming exact dedup: the same turns re-delivered in a later
    micro-batch (a crawl retry) are dropped; output equals the batch
    dropDuplicates, and extraction over the deduped stream equals
    extraction over the deduped batch."""
    import glob as globmod
    import os
    import shutil

    from xtract import gen

    tr = gen.transcripts(spark, 5, partitions=2).cache()
    src = str(tmp_path / "src")
    os.makedirs(src)

    def add_batch(df, i):
        d = f"{src}/b{i}.d"
        df.coalesce(1).write.parquet(d)
        (f,) = globmod.glob(d + "/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (1000000 + i * 100, 1000000 + i * 100))
        shutil.rmtree(d)

    add_batch(tr, 0)
    add_batch(tr.filter(F.col("turn_idx") < 3), 1)  # retried deliveries

    stream = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    streaming.run_to_parquet(
        streaming.dedup_transcripts(stream), out, str(tmp_path / "ck")
    )
    got = sorted(
        (r.conv_id, r.turn_idx) for r in spark.read.parquet(out).collect()
    )
    want = sorted((r.conv_id, r.turn_idx) for r in tr.collect())
    assert got == want  # every turn exactly once despite re-delivery
    tr.unpersist()


def test_stream_join_views_purchases_cross_batch(spark, tmp_path):
    """Stream-stream interval join: views arrive in micro-batch 1,
    purchases in micro-batch 2 (maxFilesPerTrigger=1, two files) — the
    join must match purchases against VIEW STATE retained from the
    earlier batch, and equal the batch twin exactly."""
    import datetime as dt

    src = str(tmp_path / "events")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    cols = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    views = [
        (i, t0 + dt.timedelta(minutes=i), i % 3, "view", 0.0, "{}")
        for i in range(9)
    ]
    purchases = [
        (100 + i, t0 + dt.timedelta(minutes=30 + i), i % 3, "purchase", 1.0, "{}")
        for i in range(3)
    ]
    spark.createDataFrame(views, cols).coalesce(1).write.parquet(src)
    spark.createDataFrame(purchases, cols).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    batch = spark.read.parquet(src)
    stream = streaming.join_views_purchases(
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        horizon="2 hours",
    )
    assert stream.isStreaming
    out = str(tmp_path / "join_out")
    streaming.run_to_parquet(stream, out, str(tmp_path / "ck"))

    got = sorted(
        (r.purchase_id, r.user_id, r.view_id, r.gap_s)
        for r in spark.read.parquet(out).collect()
    )
    # withWatermark is a no-op on a batch DF, so the same plan is the
    # batch twin
    exp = sorted(
        (r.purchase_id, r.user_id, r.view_id, r.gap_s)
        for r in streaming.join_views_purchases(batch, horizon="2 hours").collect()
    )
    assert got == exp
    assert len(got) == 9  # 3 users x 3 retained views each


def test_session_counts_stream_matches_batch(spark, tmp_path):
    """Native session_window under readStream: sessions whose end
    (last event + gap) is passed by the final watermark are flushed
    and must equal the batch twin; still-open sessions stay in state
    (append-mode contract)."""
    import datetime as dt

    src = str(tmp_path / "events")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for u in range(3):
        # session A: two events 10 min apart (closes at +40 min)
        rows += [(u, t0), (u, t0 + dt.timedelta(minutes=10))]
        # session B: one event at +2h (closes at +2h30)
        rows.append((u, t0 + dt.timedelta(hours=2)))
    # sentinel event far in the future drives the final watermark past
    # every session above; its own session stays open (never emitted)
    rows.append((99, t0 + dt.timedelta(days=1)))
    spark.createDataFrame(
        rows, "user_id long, ts timestamp"
    ).coalesce(1).write.parquet(src)

    batch = spark.read.parquet(src)
    out = str(tmp_path / "sess_out")
    streaming.run_to_parquet(
        streaming.session_counts(
            spark.readStream.schema(batch.schema).parquet(src),
            gap="30 minutes",
        ),
        out,
        str(tmp_path / "ck"),
    )
    got = sorted(
        (r.user_id, r.s_start_us, r.s_end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    max_us = int(t0.timestamp() + 86400) * 1_000_000
    exp = sorted(
        (r.user_id, r.s_start_us, r.s_end_us, r.n_events)
        for r in streaming.session_counts(batch, gap="30 minutes").collect()
        if r.s_end_us <= max_us
    )
    assert got == exp
    assert len(got) == 6  # 3 users x 2 closed sessions


def test_windows_stream_matches_batch(spark, tmp_path):
    """Streaming greedy window segmentation: turns arrive in two
    micro-batches split mid-conversation; final rows + latest open
    tails must equal structure.conv_windows window-for-window —
    including windows cut by the batch boundary itself."""
    import glob as globmod
    import os
    import shutil

    from xtract import gen, schema, structure

    tr = gen.transcripts(spark, 12, partitions=2).cache()
    mid = tr.agg(F.expr("percentile_approx(turn_idx, 0.5)")).collect()[0][0]

    src = str(tmp_path / "src")
    os.makedirs(src)
    tr.filter(F.col("turn_idx") <= mid).coalesce(1).write.parquet(src + "/b0")
    tr.filter(F.col("turn_idx") > mid).coalesce(1).write.parquet(src + "/b1")
    for i, d in enumerate(("b0", "b1")):
        (f,) = globmod.glob(f"{src}/{d}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (1000000 + i * 100, 1000000 + i * 100))
        shutil.rmtree(f"{src}/{d}")

    stream = (
        spark.readStream.schema(schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    streaming.run_to_parquet(
        streaming.windows_stream(stream), out, str(tmp_path / "ck")
    )

    emitted = spark.read.parquet(out).collect()
    finals = {}
    tails = {}
    for r in emitted:
        if r.final:
            finals[(r.conv_id, r.window_id)] = r
        else:
            prev = tails.get(r.conv_id)
            # window_id advances monotonically; keep the latest tail
            if prev is None or (r.window_id, r.n_turns) >= (
                prev.window_id,
                prev.n_turns,
            ):
                tails[r.conv_id] = r
    for conv, r in tails.items():
        finals.setdefault((conv, r.window_id), r)

    got = sorted(
        (
            (k[0], k[1], r.start_turn, r.end_turn, r.n_turns,
             r.window_toks, r.oversize)
            for k, r in finals.items()
        ),
        key=repr,
    )
    want = sorted(
        (
            (r.conv_id, r.window_id, r.start_turn, r.end_turn, r.n_turns,
             r.window_toks, r.oversize)
            for r in structure.conv_windows(tr).collect()
        ),
        key=repr,
    )
    assert got == want and len(got) > 0
    # at least one conversation's window was cut by the batch boundary
    # and completed from state (a final row emitted in batch 1 whose
    # start_turn <= mid < end_turn)
    assert any(
        r.start_turn <= mid < r.end_turn for r in emitted if r.final
    ) or any(r.start_turn <= mid < r.end_turn for r in tails.values())
    tr.unpersist()


def test_stream_dedup_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark with a wide watermark equals
    batch dropDuplicates on a corpus with exact re-deliveries."""
    src = str(tmp_path / "redeliver")
    t = gen.transcripts(spark, 4)
    t.unionByName(t.filter(F.col("turn_idx") % 3 == 0)).write.parquet(src)
    out = str(tmp_path / "out")
    streaming.run_to_parquet(
        streaming.dedup_transcripts(
            streaming.read_transcript_stream(spark, src), watermark="3650 days"
        ),
        out,
        str(tmp_path / "ck"),
    )
    got = sorted(
        (r.conv_id, r.turn_idx) for r in spark.read.parquet(out).collect()
    )
    exp = sorted(
        (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(src)
        .dropDuplicates(["conv_id", "turn_idx"])
        .collect()
    )
    assert got == exp
    # the re-deliveries were actually dropped (input had more rows)
    assert spark.read.parquet(src).count() > len(got)


def test_stream_dedup_state_eviction(spark, tmp_path):
    """The bounded-state trade made explicit: once the event-time
    watermark passes a key's stored timestamp, its dedup state is
    EVICTED, and a re-delivery arriving later than the watermark gap
    is emitted AGAIN. Three checkpointed availableNow drains over one
    growing file source; a same-batch duplicate inside the watermark
    window is still dropped."""
    import datetime as dt

    import pandas as pd

    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def row(idx, hours):
        return {
            "conv_id": "c",
            "turn_idx": idx,
            "role": "user",
            "text": f"turn {idx}",
            "tool": None,
            "ts": t0 + dt.timedelta(hours=hours),
        }

    def drain(rows, part):
        spark.createDataFrame(pd.DataFrame(rows)).selectExpr(
            "conv_id", "cast(turn_idx as int) turn_idx", "role",
            "text", "cast(tool as string) tool", "ts",
        ).write.mode("append").parquet(src)
        streaming.run_to_parquet(
            streaming.dedup_transcripts(
                spark.readStream.schema(schema).parquet(src),
                watermark="1 hour",
            ),
            out,
            ck,
        )

    # batch 1: key (c,1) at 10:00 -> emitted; watermark ends at 09:00
    drain([row(1, 0)], 1)
    # batch 2: key (c,99) at 14:00 twice (same batch, inside the
    # window -> deduped to one row); watermark ends at 13:00, which
    # passes (c,1)'s stored ts 10:00 -> its state is evicted
    drain([row(99, 4), row(99, 4)], 2)
    # batch 3: (c,1) re-delivered at 15:00 -> state gone -> emitted
    # AGAIN
    drain([row(1, 5)], 3)

    emitted = [
        (r.turn_idx, r.ts)
        for r in spark.read.parquet(out).collect()
    ]
    by_key = {}
    for idx, ts in emitted:
        by_key.setdefault(idx, []).append(ts)
    assert len(by_key[99]) == 1  # in-window duplicate dropped
    assert len(by_key[1]) == 2  # post-eviction re-delivery re-emitted


def test_upsert_windowed_counts_incremental(spark, tmp_path):
    """The foreachBatch upsert sink maintains a table that equals the
    batch aggregate after EVERY drain: unchanged groups survive a
    later batch's dynamic overwrite (partition key == group key), and
    changed groups are replaced, never duplicated."""
    import datetime as dt

    import pandas as pd

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def rows(specs):
        return [
            {
                "conv_id": "c",
                "turn_idx": i,
                "role": role,
                "text": "t",
                "tool": None,
                "ts": t0 + dt.timedelta(minutes=minutes),
            }
            for i, (role, minutes) in enumerate(specs)
        ]

    def deliver(specs):
        spark.createDataFrame(pd.DataFrame(rows(specs))).selectExpr(
            "conv_id", "cast(turn_idx as int) turn_idx", "role",
            "text", "cast(tool as string) tool", "ts",
        ).write.mode("append").parquet(src)
        streaming.upsert_windowed_counts(
            spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src),
            out,
            ck,
        )

    def table():
        # partition-value inference types win_part as int on read-back
        return sorted(
            (str(r.win_part), r.role, r.n_turns)
            for r in spark.read.parquet(out).collect()
        )

    def expected():
        # floor to epoch-hour multiples — F.window(ts, '1 hour')
        # aligns to the epoch, NOT to local-tz hour boundaries, so
        # date_trunc('hour') would diverge on a half-hour-offset host
        return sorted(
            (r.wp, r.role, r.n)
            for r in spark.read.parquet(src)
            .groupBy(
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
                .cast("string").alias("wp"),
                "role",
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )

    def epoch_str(hour, minute=0):
        # same epoch-hour floor: naive .timestamp() converts via the
        # host tz; only the floored value matches the window start on
        # hosts whose UTC offset is not a whole hour
        e = int(dt.datetime(2026, 1, 1, hour, minute, 0).timestamp())
        return str(e // 3600 * 3600)

    # drain 1: hour-10 user turns + hour-11 assistant turn
    deliver([("user", 0), ("user", 30), ("assistant", 70)])
    assert table() == expected()
    # drain 2: updates hour-10/user (count 2 -> 3) and adds
    # hour-11/user; hour-11/assistant is untouched by this batch and
    # must survive the dynamic overwrite
    deliver([("user", 40), ("user", 80)])
    assert table() == expected()
    assert (epoch_str(11), "assistant", 1) in table()
    assert (epoch_str(10), "user", 3) in table()


def test_upsert_fine_window_siblings_survive(spark, tmp_path):
    """Regression (r4 ADVICE, streaming.py win_part granularity): with
    a window FINER than 1 hour, an update batch touching one 15-minute
    window must not delete sibling windows from the same hour — the
    partition key is the epoch-seconds window start, exact at any
    granularity (the old yyyyMMddHH prefix collapsed all four quarter
    windows of an hour into one overwritten partition)."""
    import datetime as dt

    import pandas as pd

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def deliver(minute_list):
        pdf = pd.DataFrame(
            [
                {
                    "conv_id": "c",
                    "turn_idx": i,
                    "role": "user",
                    "text": "t",
                    "tool": None,
                    "ts": t0 + dt.timedelta(minutes=m),
                }
                for i, m in enumerate(minute_list)
            ]
        )
        spark.createDataFrame(pdf).selectExpr(
            "conv_id", "cast(turn_idx as int) turn_idx", "role",
            "text", "cast(tool as string) tool", "ts",
        ).write.mode("append").parquet(src)
        streaming.upsert_windowed_counts(
            spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src),
            out,
            ck,
            window="15 minutes",
        )

    # drain 1 populates all four quarter-windows of hour 10
    deliver([0, 16, 31, 46])
    # drain 2 updates ONLY the 10:00 quarter; 10:15/10:30/10:45 are
    # absent from the update batch and must survive
    deliver([5])
    got = sorted(
        (int(r.win_part), r.n_turns)
        for r in spark.read.parquet(out).collect()
    )
    base = int(t0.timestamp())
    assert got == [
        (base, 2),
        (base + 15 * 60, 1),
        (base + 30 * 60, 1),
        (base + 45 * 60, 1),
    ]
