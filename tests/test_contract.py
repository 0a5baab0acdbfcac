"""Driver-contract smoke: entry() produces rows with a stable schema;
queries()/oracle_sql() are well-formed; a cheap sample of the
oracle-paired queries is cross-checked against DuckDB in-process.
(The full sweep lives in tools/check_contract.py.)"""
import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
SAMPLE = ["g6_iou", "w5_topk_per_group", "tok_count", "r7_score_extract"]


def test_registry_shape():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(sqls) <= set(qs)
    # every oracle-less query is an extraction-kernel one, by design
    assert all(k.startswith("x_") for k in set(qs) - set(sqls))


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.limit(50).collect()
    assert len(rows) > 0
    assert {"conv_id", "turn_idx", "seq", "span_text", "qtype"} <= set(df.columns)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_duckdb(spark, name):
    from tools.check_contract import TABLES, norm_rows

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    df = entrymod.queries()[name](spark, SF)
    rel = con.sql(entrymod.oracle_sql()[name])
    a = norm_rows(df.columns, [tuple(r) for r in df.collect()])
    b = norm_rows(list(rel.columns), rel.fetchall())
    assert sorted(df.columns) == sorted(rel.columns)
    assert a == b
