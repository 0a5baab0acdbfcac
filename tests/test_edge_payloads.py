"""Adversarial payloads: malformed bboxes, empty arrays, orphan lines,
null fields — the oracle and both Spark plans must agree (and not
crash) on all of them."""
import json

import pandas as pd
import pytest

from xtract import oracle, pipeline, schema

CASES = {
    "empty_blocks": {"page": {"width": 100, "height": 100}, "blocks": [], "lines": []},
    "bad_bbox_sizes": {
        "blocks": [
            {"block_label": "text", "block_content": "1. 内容足够长的一题\n2. 另一题也足够长",
             "block_bbox": [1, 2], "block_id": 1, "block_order": 1, "group_id": 1},
            {"block_label": "image", "block_content": "", "block_bbox": [5],
             "block_id": 2, "block_order": 2, "group_id": 2},
            {"block_label": "text", "block_content": "3. 正常块的内容也是足够长的",
             "block_bbox": [0, 0, 500, 100], "block_id": 3, "block_order": 3, "group_id": 3},
        ],
        "lines": [],
    },
    "null_contents": {
        "blocks": [
            {"block_label": "text", "block_content": None, "block_bbox": [0, 0, 10, 10],
             "block_id": 1, "block_order": 1, "group_id": 1},
            {"block_label": None, "block_content": "x", "block_bbox": [0, 0, 10, 10],
             "block_id": 2, "block_order": 2, "group_id": 2},
        ],
        "lines": [],
    },
    "orphan_lines": {
        "blocks": [
            {"block_label": "text",
             "block_content": "1. 第一题内容足够长了\n2. 第二题内容足够长了",
             "block_bbox": [0, 0, 800, 400], "block_id": 1, "block_order": 1, "group_id": 1},
        ],
        "lines": [
            {"block_id": 99, "text": "1. 不属于任何块", "score": 0.9,
             "poly": [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [0.0, 5.0]]},
        ],
    },
    "zero_score_lines": {
        # v1 line lookup requires score strictly > 0 — zero-score lines
        # never match, so positions drop and the block vanishes
        "blocks": [
            {"block_label": "text",
             "block_content": "1. 第一题内容足够长了\n2. 第二题内容足够长了",
             "block_bbox": [0, 0, 800, 400], "block_id": 1, "block_order": 1, "group_id": 1},
        ],
        "lines": [
            {"block_id": 1, "text": "1. 第一题内容足够长了", "score": 0.0,
             "poly": [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [0.0, 5.0]]},
            {"block_id": 1, "text": "2. 第二题内容足够长了", "score": 0.0,
             "poly": [[0.0, 50.0], [10.0, 50.0], [10.0, 55.0], [0.0, 55.0]]},
        ],
    },
    "negative_coords": {
        "blocks": [
            {"block_label": "text", "block_content": "5、负坐标块的内容足够长",
             "block_bbox": [-10, -20, 300, 80], "block_id": 1, "block_order": 1, "group_id": 1},
            {"block_label": "image", "block_content": "", "block_bbox": [-5, 90, 200, 300],
             "block_id": 2, "block_order": 2, "group_id": 2},
        ],
        "lines": [],
    },
}


def _df(spark, texts):
    rows = [
        {
            "conv_id": name,
            "turn_idx": 0,
            "role": "tool",
            "text": text,
            "tool": None,
            "ts": pd.Timestamp("2026-01-01"),
        }
        for name, text in texts.items()
    ]
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema.TRANSCRIPTS)


@pytest.fixture(scope="module")
def payloads():
    return {k: json.dumps(v, ensure_ascii=False) for k, v in CASES.items()}


def test_oracle_handles_all(payloads):
    for name, text in payloads.items():
        rows = oracle.extract_turn(text)  # must not raise
        for r in rows:
            assert r["image_count"] == len(r["image_ids"])


def test_modes_agree_on_edge_payloads(spark, payloads):
    df = _df(spark, payloads)
    exp = {}
    for name, text in payloads.items():
        exp[name] = [
            (i, r["question_number"], r["span_text"], tuple(r["bbox"]), tuple(r["image_ids"]))
            for i, r in enumerate(oracle.extract_turn(text))
        ]
    for mode in ("fused", "relational"):
        got = {}
        for r in pipeline.extract(df, mode=mode).collect():
            got.setdefault(r.conv_id, []).append(
                (r.seq, r.question_number, r.span_text, tuple(r.bbox or ()), tuple(r.image_ids or ()))
            )
        for v in got.values():
            v.sort()
        for name in payloads:
            assert got.get(name, []) == exp[name], (mode, name)


def test_specific_edge_semantics(payloads):
    # empty blocks → zero spans
    assert oracle.extract_turn(payloads["empty_blocks"]) == []
    # 2-element bbox: P2 guard keeps the block whole, unnumbered
    rows = oracle.extract_turn(payloads["bad_bbox_sizes"])
    by_src = {r["source_block_id"]: r for r in rows}
    assert by_src[1]["question_number"] is None
    assert by_src[3]["question_number"] == 3
    # zero-score lines: strict > 0 lookup fails → block vanishes (v1)
    assert oracle.extract_turn(payloads["zero_score_lines"]) == []
    # orphan lines resolve to no block → estimate path still splits
    rows = oracle.extract_turn(payloads["orphan_lines"])
    assert [r["question_number"] for r in rows] == [1, 2]


def test_megabyte_turn_bounded_batches(spark):
    """A 1 MB single-turn payload flows through the fused kernel
    without pathology: the Arrow byte cap (64 MB, session.py) bounds
    per-batch memory regardless of row width, and extraction semantics
    are unaffected by payload size (content drawn from a real payload
    with one question's content inflated)."""
    import json

    import pandas as pd

    from xtract import gen, pipeline, schema

    payload = json.loads(gen._payload_b(gen._rng("mega", 1)))
    big = "长文本" * 120_000  # ~1 MB of content on one block
    for b in payload["blocks"]:
        if b["block_label"] == "text":
            b["block_content"] = b["block_content"] + big
            break
    text = json.dumps(payload, ensure_ascii=False)
    assert len(text.encode()) > 1_000_000

    rows = [
        {
            "conv_id": "mega",
            "turn_idx": i,
            "role": "tool",
            "text": text,
            "tool": "layout",
            "ts": None,
        }
        for i in range(8)
    ]
    tr = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in schema.TRANSCRIPTS.fields]),
        schema=schema.TRANSCRIPTS,
    )
    spans = pipeline.extract(tr, mode="fused")
    got = spans.groupBy("turn_idx").count().collect()
    assert len(got) == 8 and all(r["count"] >= 1 for r in got)
    # the inflated block's span carries the appended text (~360k
    # chars ≈ 1 MB utf-8)
    sample = spans.filter("turn_idx = 0").select("span_text").collect()
    assert any(len(r.span_text or "") > 300_000 for r in sample)
