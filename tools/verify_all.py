"""One-command round-end validation: every gate the driver and judge
look at, in sequence, with a single summary line at the end.

Usage: python tools/verify_all.py [--quick]

Gates:
1. pytest (full suite; --quick runs -x and stops early)
2. driver contract: all queries vs DuckDB oracles at sf0.01
3. physical-plan audit (tools/explain_audit.py)
4. spark-submit production smoke (gen:40 end-to-end + DuckDB readback)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], timeout: int) -> tuple[bool, float, str]:
    t0 = time.monotonic()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        ok, tail = False, ["TIMEOUT"]
    return ok, time.monotonic() - t0, " | ".join(tail)


def main() -> int:
    quick = "--quick" in sys.argv
    results: dict[str, dict] = {}

    gates = [
        (
            "pytest",
            [sys.executable, "-m", "pytest", "tests/", "-q"]
            + (["-x"] if quick else []),
            1800,
        ),
        (
            "contract",
            [sys.executable, "tools/check_contract.py", "/root/testdata/sf0.01"],
            2700,
        ),
        ("plan_audit", [sys.executable, "tools/explain_audit.py"], 900),
    ]
    for name, cmd, to in gates:
        ok, sec, tail = run(name, cmd, to)
        results[name] = {"ok": ok, "sec": round(sec, 1), "tail": tail}
        print(f"{'PASS' if ok else 'FAIL'} {name} ({sec:.0f}s)")
        if not ok:
            print("   ", tail)

    # production surface: spark-submit + independent DuckDB readback
    out = "/tmp/verify_all_spans"
    subprocess.run(["rm", "-rf", out], check=False)
    zip_cmd = ["zip", "-qr", "/tmp/verify_all_xtract.zip", "xtract"]
    subprocess.run(zip_cmd, cwd=REPO, check=True)
    win = "/tmp/verify_all_windows"
    lm = "/tmp/verify_all_lossmask"
    exp = "/tmp/verify_all_export"
    subprocess.run(["rm", "-rf", win, lm, exp], check=False)
    ok, sec, tail = run(
        "spark_submit",
        [
            "spark-submit", "--master", "local[8]",
            "--py-files", "/tmp/verify_all_xtract.zip",
            "job.py", "--input", "gen:40", "--output", out,
            # exercise the training-sink surface too — a dispatch or
            # sink regression must fail THIS gate, not just unit tests
            "--windows", win, "--loss-mask", lm, "--export-jsonl", exp,
        ],
        600,
    )
    if ok:
        import duckdb

        n, convs = duckdb.sql(
            f"select count(*), count(distinct conv_id) from '{out}/*.parquet'"
        ).fetchone()
        n_win_turns = duckdb.sql(
            f"select sum(n_turns) from '{win}/*.parquet'"
        ).fetchone()[0]
        n_lm, bad_tile = duckdb.sql(
            f"""select count(*),
                       (select count(*) from (
                          select conv_id from '{lm}/*.parquet'
                          group by conv_id
                          having max(end_tok) <> sum(end_tok - start_tok)))
                from '{lm}/*.parquet'"""
        ).fetchone()
        n_exp = duckdb.sql(
            f"select count(*) from read_json('{exp}/part-*',"
            " format='newline_delimited')"
        ).fetchone()[0]
        ok = (
            n > 0
            and convs == 40
            and n_win_turns == n_lm  # windows tile exactly the turns
            and bad_tile == 0  # loss-mask spans tile per conversation
            and n_exp == n  # jsonl export round-trips the span count
        )
        tail = (
            f"spans={n} convs={convs} win_turns={n_win_turns} "
            f"lm_rows={n_lm} export={n_exp}"
        )
    results["spark_submit"] = {"ok": ok, "sec": round(sec, 1), "tail": tail}
    print(f"{'PASS' if ok else 'FAIL'} spark_submit ({sec:.0f}s) {tail}")

    all_ok = all(r["ok"] for r in results.values())
    print(json.dumps({"pass": all_ok, "gates": results}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
