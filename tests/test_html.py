"""HTML main-content extraction: DOM parse kernel + native jusText-style
classification recover exactly the planted article paragraphs."""
import pyspark.sql.functions as F
import pytest

from xtract import gen, html

N = 40


@pytest.fixture(scope="module")
def pages(spark):
    df = gen.html_transcripts(spark, N).cache()
    df.count()
    yield df
    df.unpersist()


def test_dom_parse_features():
    doc = (
        "<html><body><nav><a href='/'>Home</a> <a href='/b'>Blog</a></nav>"
        "<article><p>The analysis of the data was done in a careful and "
        "systematic way by the whole team over a long period.</p>"
        "<p>Short note.</p></article>"
        "<footer><a href='#'>Terms</a></footer></body></html>"
    )
    blocks = html.parse_blocks_py(doc)
    by_text = {b["text"][:12]: b for b in blocks}
    nav = by_text["Home Blog"[:12]]
    # inter-anchor whitespace isn't link text, so slightly below 1.0
    assert nav["in_chrome"] and nav["link_chars"] / nav["n_chars"] > 0.8
    p1 = [b for b in blocks if b["tag"] == "p"][0]
    assert not p1["in_chrome"] and p1["link_chars"] == 0
    assert p1["stop_hits"] > 5
    foot = blocks[-1]
    assert foot["in_chrome"]


def test_extract_recovers_planted_paragraphs(spark, pages):
    got = {
        r.conv_id: r.main_text
        for r in html.extract_main_content(pages).collect()
    }
    for i in range(N):
        r = gen._rng(f"html{i}", 0)
        _, paras = gen.html_page(r)
        assert got[f"page{i:06d}"] == "\n".join(paras), i


def test_classification_boilerplate_rates(spark, pages):
    stats = html.extract_main_content(pages).agg(
        F.sum("blocks_good").alias("g"),
        F.sum("blocks_total").alias("t"),
        F.sum("chars_good").alias("cg"),
        F.sum("chars_total").alias("ct"),
    ).collect()[0]
    # boilerplate removed but the bulk of characters retained
    assert stats.g < stats.t
    assert stats.cg / stats.ct > 0.6


def test_malformed_html(spark):
    import pandas as pd

    from xtract import schema

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "conv_id": "x",
                    "turn_idx": 0,
                    "role": "tool",
                    "text": "<p>unclosed <div><<< & rubbish",
                    "tool": None,
                    "ts": pd.Timestamp("2026-01-01"),
                }
            ]
        ),
        schema=schema.TRANSCRIPTS,
    )
    rows = html.dom_blocks(df).collect()
    assert isinstance(rows, list)  # parser tolerates garbage, no crash


def test_read_html_directory_chains_into_extraction(spark, tmp_path):
    """html:<dir> source: boilerplate-stripped page text flows into the
    extraction pipeline as a raw-text payload — a scraped exam page
    yields question spans, chrome yields none."""
    from xtract import html as hmod
    from xtract import pipeline

    exam_body = (
        "<p>1、求下列方程的解，并写出完整的求解过程与验算步骤。（5分）</p>"
        "<p>2、计算下面三角形的面积，结果保留两位小数并注明单位。（3分）</p>"
    )
    page = (
        "<html><body><header><nav><a href='/a'>Home</a><a href='/b'>About</a>"
        "</nav></header><article>" + exam_body + "</article>"
        "<footer><a href='#'>Terms</a></footer></body></html>"
    )
    (tmp_path / "exam.html").write_text(page, encoding="utf-8")
    (tmp_path / "chrome.html").write_text(
        "<html><body><nav><a href='/x'>only nav</a></nav></body></html>",
        encoding="utf-8",
    )

    tr = hmod.read_html(spark, str(tmp_path))
    rows = {r.conv_id: r.text for r in tr.collect()}
    assert set(rows) == {"exam.html", "chrome.html"}
    assert "1、求下列方程的解" in rows["exam.html"]
    assert "Home" not in rows["exam.html"]  # nav stripped

    spans = pipeline.extract(tr, mode="fused")
    nums = sorted(
        r.question_number
        for r in spans.collect()
        if r.conv_id == "exam.html" and r.question_number is not None
    )
    assert nums == [1, 2]
    assert all(r.conv_id != "chrome.html" or r.question_number is None
               for r in spans.collect())
