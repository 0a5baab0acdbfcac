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
    ok, sec, tail = run(
        "spark_submit",
        [
            "spark-submit", "--master", "local[8]",
            "--py-files", "/tmp/verify_all_xtract.zip",
            "job.py", "--input", "gen:40", "--output", out,
        ],
        600,
    )
    if ok:
        import duckdb

        n, convs = duckdb.sql(
            f"select count(*), count(distinct conv_id) from '{out}/*.parquet'"
        ).fetchone()
        ok = n > 0 and convs == 40
        tail = f"spans={n} convs={convs}"
    results["spark_submit"] = {"ok": ok, "sec": round(sec, 1), "tail": tail}
    print(f"{'PASS' if ok else 'FAIL'} spark_submit ({sec:.0f}s) {tail}")

    all_ok = all(r["ok"] for r in results.values())
    print(json.dumps({"pass": all_ok, "gates": results}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
