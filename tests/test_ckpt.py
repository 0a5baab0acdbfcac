"""Checkpoint/lineage semantics: full run, idempotent no-op rerun, and
resume after simulated partial failure reproduce identical output."""
import shutil

import pyspark.sql.functions as F
import pytest

from xtract import ckpt, gen

N_BUCKETS = 8


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "ckpt")


def _spans(spark, out):
    return sorted(
        (r.conv_id, r.turn_idx, r.seq, r.span_text)
        for r in spark.read.parquet(out).collect()
    )


def test_checkpoint_full_then_noop(spark, dirs):
    out, ck = dirs
    tr = gen.transcripts(spark, 10).cache()
    r1 = ckpt.run_with_checkpoint(spark, tr, out, ck, n_buckets=N_BUCKETS)
    assert r1 == {"partitions_done": N_BUCKETS, "partitions_skipped": 0}
    first = _spans(spark, out)
    assert len(first) > 0

    lin = spark.read.parquet(ck)
    assert lin.count() == N_BUCKETS
    assert lin.filter(F.col("status") == "done").count() == N_BUCKETS
    assert lin.agg(F.sum("rows_in")).collect()[0][0] == tr.count()

    # rerun: everything already committed → no work, no output change
    r2 = ckpt.run_with_checkpoint(spark, tr, out, ck, n_buckets=N_BUCKETS)
    assert r2 == {"partitions_done": 0, "partitions_skipped": N_BUCKETS}
    assert _spans(spark, out) == first


def test_checkpoint_resume_recomputes_only_missing(spark, dirs):
    out, ck = dirs
    tr = gen.transcripts(spark, 10).cache()
    ckpt.run_with_checkpoint(spark, tr, out, ck, n_buckets=N_BUCKETS)
    full = _spans(spark, out)

    # simulate a mid-run crash: drop lineage for 3 buckets and corrupt
    # their output partitions
    lin = spark.read.parquet(ck)
    keep = lin.filter(~F.col("partition_key").isin(["1", "2", "5"]))
    kept_rows = keep.collect()
    shutil.rmtree(ck)
    spark.createDataFrame(kept_rows, lin.schema).write.parquet(ck)
    for b in (1, 2, 5):
        shutil.rmtree(f"{out}/pk={b}", ignore_errors=True)

    r = ckpt.run_with_checkpoint(spark, tr, out, ck, n_buckets=N_BUCKETS)
    assert r == {"partitions_done": 3, "partitions_skipped": N_BUCKETS - 3}
    assert _spans(spark, out) == full

    # lineage checksum per bucket is stable across the resume
    lin2 = spark.read.parquet(ck)
    sums = {
        r.partition_key: r.checksum
        for r in lin2.filter(F.col("rows_out") > 0).collect()
    }
    orig = {r.partition_key: r.checksum for r in kept_rows if r.rows_out > 0}
    for k, v in orig.items():
        assert sums[k] == v
