"""Flag-combination guards on the job surface: usage errors must fire
BEFORE any SparkSession is built or any sink writes (the r4 ADVICE
quarantine-ordering fix), and --checkpoint must reject BOTH managed
table ref forms — table: (Iceberg) and btable: (Spark bucketed) —
because the resume path writes parquet with dynamic partition
overwrite and would otherwise treat the ref as a literal directory
name, then crash at the final count_ref readback after doing all the
work (review finding)."""
import os

import pytest

import job


def _expect_usage_error(argv):
    with pytest.raises(SystemExit) as exc:
        job.main(argv)
    assert exc.value.code == 2  # argparse usage error


def test_checkpoint_rejects_table_ref(tmp_path):
    _expect_usage_error(
        ["--input", "gen:10", "--output", "table:local.db.spans",
         "--checkpoint", str(tmp_path / "ck")]
    )


def test_checkpoint_rejects_btable_ref(tmp_path):
    _expect_usage_error(
        ["--input", "gen:10", "--output", "btable:spans",
         "--checkpoint", str(tmp_path / "ck")]
    )


def test_usage_error_leaves_no_quarantine_side_effect(tmp_path):
    """jsonl input + --quarantine + an invalid flag combo: the usage
    error must abort before the quarantine sink writes anything."""
    src = tmp_path / "d.jsonl"
    src.write_text('{"bad json\n')
    quar = tmp_path / "quarantine"
    _expect_usage_error(
        ["--input", f"jsonl:{src}", "--output", "btable:spans",
         "--checkpoint", str(tmp_path / "ck"),
         "--quarantine", str(quar)]
    )
    assert not os.path.exists(quar)


def test_compact_rejects_btable_ref():
    _expect_usage_error(
        ["--input", "gen:10", "--output", "btable:spans",
         "--compact-target-mb", "64"]
    )
