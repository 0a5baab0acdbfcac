"""HTML main-content extraction (north rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

Two-stage Spark design:

1. **DOM parse** (Arrow ``mapInPandas`` kernel, stdlib
   ``html.parser`` — byte-stream tokenization is inherently
   sequential per document): one row per DOM block element with raw
   features (tag, text, char counts, link chars, ancestor flags).
2. **Boilerplate classification** (native Spark SQL): jusText-style
   context-free rules — link density, stopword density, length gates,
   structural-tag vetoes — as a when-chain over the feature columns,
   so Catalyst sees and can reorder/prune them.

The per-block feature extraction is deterministic, so the same
classification is expressible in DuckDB for the driver cross-check
(queries: html_block_classify).
"""
from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

BLOCK_TAGS = {
    "p",
    "div",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
    "li",
    "td",
    "th",
    "blockquote",
    "pre",
    "article",
    "section",
}
SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "title"}
CHROME_TAGS = {"nav", "header", "footer", "aside"}

# jusText-style thresholds (deterministic, pinned here)
MAX_LINK_DENSITY = 0.4
MIN_LEN_SHORT = 20
GOOD_STOPWORD_DENSITY = 0.25
GOOD_MIN_LEN = 80
LONG_GOOD_LEN = 200

GOOD_CJK_DENSITY = 0.5  # CJK text carries no Latin stopwords; density
# of ideographs substitutes for the stopword signal (jusText ships
# per-language stopword lists; this is the deterministic CJK analogue)

_STOPWORDS = re.compile(
    r"\b(the|a|an|of|and|or|to|in|is|are|was|were|it|that|this|for|on|with|as|at|by|be)\b"
)
_TOKEN = re.compile(r"[A-Za-z0-9]+|[一-鿿]")
_CJK = re.compile(r"[一-鿿]")
_WS = re.compile(r"\s+")


class _Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._stack: list[str] = []
        self._chrome_depth = 0
        self._skip_depth = 0
        self._cur_text: list[str] = []
        self._cur_link_chars = 0
        self._link_depth = 0
        self._cur_tag = "body"
        self._order = 0

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._cur_text)).strip()
        if text:
            self.blocks.append(
                {
                    "block_ord": self._order,
                    "tag": self._cur_tag,
                    "text": text,
                    "link_chars": self._cur_link_chars,
                    "in_chrome": self._chrome_depth > 0,
                }
            )
            self._order += 1
        self._cur_text = []
        self._cur_link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self._cur_tag = tag
        if tag == "br":
            self._cur_text.append(" ")

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
            self._cur_tag = "body"
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome_depth = max(0, self._chrome_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._cur_text.append(data)
        if self._link_depth:
            self._cur_link_chars += len(_WS.sub(" ", data).strip())

    def close(self):  # noqa: D102
        super().close()
        self._flush()


def parse_blocks_py(html_text: str) -> list[dict]:
    """One document → DOM block features (pure function, shared by the
    kernel and tests)."""
    c = _Collector()
    try:
        c.feed(html_text or "")
        c.close()
    except Exception:  # malformed beyond the parser's tolerance
        return []
    out = []
    for b in c.blocks:
        text = b["text"]
        n_chars = len(text)
        tokens = _TOKEN.findall(text.lower())
        stop_hits = len(_STOPWORDS.findall(text.lower()))
        out.append(
            {
                "block_ord": b["block_ord"],
                "tag": b["tag"],
                "text": text,
                "n_chars": n_chars,
                "n_tokens": len(tokens),
                "link_chars": min(b["link_chars"], n_chars),
                "stop_hits": stop_hits,
                "cjk_chars": len(_CJK.findall(text)),
                "in_chrome": b["in_chrome"],
            }
        )
    return out


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("block_ord", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("link_chars", T.IntegerType(), False),
        T.StructField("stop_hits", T.IntegerType(), False),
        T.StructField("cjk_chars", T.IntegerType(), False),
        T.StructField("in_chrome", T.BooleanType(), False),
    ]
)


def dom_blocks(transcripts: DataFrame) -> DataFrame:
    """Stage 1: turn HTML payloads → one row per DOM block with raw
    features. Narrow (mapInPandas), zero shuffles."""
    names = [f.name for f in BLOCKS_SCHEMA.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in names}
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for b in parse_blocks_py(text):
                    cols["conv_id"].append(conv_id)
                    cols["turn_idx"].append(int(turn_idx))
                    for k, v in b.items():
                        cols[k].append(v)
            if cols["conv_id"]:
                yield pd.DataFrame(cols, columns=names)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        kernel, schema=BLOCKS_SCHEMA
    )


def classify(blocks: DataFrame) -> DataFrame:
    """Stage 2: jusText-style context-free classification as native
    SQL (the when-chain order is the rule priority)."""
    link_density = F.col("link_chars") / F.greatest(F.col("n_chars"), F.lit(1))
    stop_density = F.col("stop_hits") / F.greatest(F.col("n_tokens"), F.lit(1))
    cjk_density = F.col("cjk_chars") / F.greatest(F.col("n_chars"), F.lit(1))
    label = (
        F.when(F.col("in_chrome"), "boilerplate")  # DOM-structural veto
        .when(link_density > MAX_LINK_DENSITY, "boilerplate")
        .when(F.col("n_chars") < MIN_LEN_SHORT, "boilerplate")
        .when(cjk_density >= GOOD_CJK_DENSITY, "good")
        .when(
            (stop_density >= GOOD_STOPWORD_DENSITY)
            & (F.col("n_chars") >= GOOD_MIN_LEN),
            "good",
        )
        .when(F.col("n_chars") >= LONG_GOOD_LEN, "good")
        .otherwise("boilerplate")
    )
    return blocks.select(
        "*",
        F.round(link_density, 6).alias("link_density"),
        F.round(stop_density, 6).alias("stop_density"),
        label.alias("label"),
    )


def read_html(spark, path: str) -> DataFrame:
    """Directory/glob of .html files → transcripts-shaped rows whose
    ``text`` is the boilerplate-stripped main content (conv_id = file
    name, turn_idx = 0). Chains into pipeline.extract: a scraped exam
    page goes HTML → clean text → question spans (payload kind (a),
    raw merged text)."""
    raw = (
        spark.read.text(path + "/*.html", wholetext=True)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.col("value").alias("text"),
        )
    )
    main = extract_main_content(raw)
    return main.select(
        "conv_id",
        "turn_idx",
        F.lit("tool").alias("role"),
        F.col("main_text").alias("text"),
        F.lit("html").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def extract_main_content(transcripts: DataFrame) -> DataFrame:
    """End-to-end: per turn, the ordered concatenation of good blocks
    (the extracted main content) plus retention stats. One shuffle
    (the per-turn agg)."""
    good = classify(dom_blocks(transcripts))
    return good.groupBy("conv_id", "turn_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("label") == "good",
                            F.struct("block_ord", "text"),
                        )
                    )
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("main_text"),
        F.count("*").cast("long").alias("blocks_total"),
        F.count_if(F.col("label") == "good").cast("long").alias("blocks_good"),
        F.sum(F.when(F.col("label") == "good", F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("chars_good"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
