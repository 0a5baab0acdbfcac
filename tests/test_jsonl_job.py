"""Production-surface JSONL ingestion: `job.py --input jsonl:` parses
transcript deliveries with PERMISSIVE quarantine, extracts from the
good rows, reports the quarantined count on the job's JSON line, and
writes the raw malformed lines to the --quarantine sink. Run via
subprocess because job.main owns (and stops) its SparkSession."""
import json
import os
import subprocess
import sys

import duckdb

from xtract import gen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_jsonl_input_arm(tmp_path):
    # fixture: 3 conversations serialized to JSONL, every 7th line torn
    lines = []
    for conv_ord in range(3):
        conv_id = f"conv{conv_ord:08d}"
        for turn_idx in range(gen.n_turns_for(conv_ord)):
            r = gen.turn_row(conv_id, turn_idx, conv_ord)
            r["ts"] = r["ts"].strftime("%Y-%m-%dT%H:%M:%S.000Z")
            lines.append(json.dumps(r))
    torn = [
        ln[:-5] if i % 7 == 3 else ln for i, ln in enumerate(lines)
    ]
    n_torn_json = sum(1 for i in range(len(lines)) if i % 7 == 3)
    # blank and whitespace-only separator lines must be quarantined
    # too (from_json returns a NULL struct for them, not a populated
    # _corrupt — review finding); inserted, so they don't reduce the
    # good-turn count
    torn.insert(2, "")
    torn.append("   ")
    n_torn = n_torn_json + 2
    src = tmp_path / "delivery.jsonl"
    src.write_text("\n".join(torn) + "\n")

    out = str(tmp_path / "spans")
    quar = str(tmp_path / "quarantine")
    export = str(tmp_path / "export")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "job.py"),
            "--input", f"jsonl:{src}",
            "--output", out,
            "--quarantine", quar,
            "--export-jsonl", export,
            "--partitions", "8",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["quarantined"] == n_torn
    assert line["turns"] == len(lines) - n_torn_json
    assert line["spans"] > 0

    # quarantine sink holds exactly the torn raw lines
    qrows = duckdb.sql(f"select raw from '{quar}/*.parquet'").fetchall()
    assert len(qrows) == n_torn
    # torn lines lost their closing brace; blank/ws lines strip empty
    assert all(not r[0].strip().endswith("}") for r in qrows)
    assert sum(1 for r in qrows if not r[0].strip()) == 2

    # extraction over the good rows produced a well-formed span table
    n_spans = duckdb.sql(
        f"select count(*), count(distinct conv_id) from '{out}/*.parquet'"
    ).fetchone()
    assert n_spans[0] == line["spans"]
    assert n_spans[1] >= 1

    # the JSONL export round-trips: same span count, fields parse back
    exp = duckdb.sql(
        "select count(*), count(distinct conv_id), sum(seq) "
        f"from read_json('{export}/part-*', format='newline_delimited')"
    ).fetchone()
    par = duckdb.sql(
        f"select count(*), count(distinct conv_id), sum(seq) from '{out}/*.parquet'"
    ).fetchone()
    assert exp == par
