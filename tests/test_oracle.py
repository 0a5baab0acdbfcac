"""Unit tests of the oracle semantics against hand-derived expectations
from the reference (edge corpus: docs/OCR结果二次拆分方案设计.md:406-440,
tests/test_splitter.py:46)."""
from xtract import oracle
from xtract.config import LIMITS


# ------------------------------------------------------------- detection
def test_detect_basic_newline_separated():
    text = "1. 第一题内容足够长了吧\n2. 第二题内容也足够长\n3. 第三题内容依然很长"
    got = oracle.detect(text, "v1")
    assert [m["number"] for m in got] == [1, 2, 3]
    assert [m["position"] for m in got] == [0, text.index("2. "), text.index("3. ")]


def test_detect_all_five_formats():
    for head in ["4.", "4、", "(4)", "[4]", "【4】", "第4题"]:
        text = f"{head}这道题的内容超过五个字符"
        got = oracle.detect(text, "v1")
        assert [m["number"] for m in got] == [4], head


def test_detect_rejects_midline_v1():
    # anchored MULTILINE: "4." mid-line is invisible to v1
    text = "3.找一个点D，使四边形ABCD是一个等腰梯形。(2分)4.在这个等腰梯形中画一条线段。"
    got = oracle.detect(text, "v1")
    assert [m["number"] for m in got] == [3]
    # loose mode sees both
    loose = oracle.detect(text, "v2-loose")
    assert [m["number"] for m in loose] == [3, 4]
    # v2 strict rejects the mid-line 4 (not line-start-ish)
    strict = oracle.detect(text, "v2-strict")
    assert [m["number"] for m in strict] == [3]


def test_detect_false_positive_traps():
    # decimal: "1.5m/s" — "1." IS at a line start here, but only 1 match
    # → no split; mid-text decimals don't match v1 anchoring
    text = "小明的速度为 1.5m/s，求距离。\n2. 另一道题内容足够长"
    got = oracle.detect(text, "v1")
    assert [m["number"] for m in got] == [2]


def test_detect_option_labels_not_matched():
    # A./B. option labels don't match (\d+) patterns
    text = "A. 选项甲 B. 选项乙 C. 选项丙 D. 选项丁"
    assert oracle.detect(text, "v1") == []


def test_detect_reference_list_trap():
    text = "参考资料：1.《物理学》 2.《化学基础》"
    # neither 1. nor 2. is at line start → v1 finds nothing
    assert oracle.detect(text, "v1") == []


def test_detect_following_content_gate():
    # fewer than 5 non-space chars after the marker → rejected
    # (question_splitter.py:155-159). Note the 100-char window spans
    # newlines, so only markers near the END of the block can fail it.
    got = oracle.detect("1. 这里内容足够长了\n2. 短", "v1")
    assert [m["number"] for m in got] == [1]
    # a marker ≤5 chars after the previous one is eaten by the
    # positional dedup even across a newline (question_splitter.py:124-127)
    got = oracle.detect("1. 短\n2. 这里内容足够长了", "v1")
    assert [m["number"] for m in got] == [1]
    got = oracle.detect("1. 多一点\n2. 这里内容足够长了", "v1")
    assert [m["number"] for m in got] == [1, 2]


def test_detect_positional_dedup():
    # "(1)" also matches "1." pattern? No — but "1、" plus "【1】" at
    # nearby positions: dedup keeps first within 5 chars
    # (question_splitter.py:118-127)
    text = "1.(1)同一位置的双重匹配内容足够长"
    got = oracle.detect(text, "v1")
    # "1." at 0 matched; "(1)" at position 2 is within gap 5 → deduped
    assert [m["position"] for m in got] == [0]


def test_detect_near_start_tolerance():
    # no newline before, position < 10 counts as line start
    # (question_splitter.py:176-177)
    text = "卷一 1、这道题的内容足够长了"
    got = oracle.detect(text, "v2-strict")
    assert [m["number"] for m in got] == [1]


# ----------------------------------------------------------------- split
def _block(content, bbox=(100, 200, 900, 800), bid=7):
    return {
        "block_label": "text",
        "block_content": content,
        "block_bbox": list(bbox),
        "block_id": bid,
        "block_order": bid,
        "group_id": bid,
    }


def test_split_no_numbers_passthrough():
    b = _block("没有题号的普通文本段落而已")
    out = oracle.split_block_v1(b, [])
    assert len(out) == 1
    assert "question_number" not in out[0]


def test_split_single_number_tagged():
    b = _block("5、这是唯一的一道题目内容")
    out = oracle.split_block_v1(b, [])
    assert len(out) == 1 and out[0]["question_number"] == 5


def test_split_estimate_path_geometry():
    c = "1. 第一题的内容在此处展开\n2. 第二题的内容在此处展开\n3. 第三题的内容在此处展开"
    b = _block(c, bbox=(0, 0, 1000, 300))
    out = oracle.split_block_v1(b, [])
    assert len(out) == 3
    assert [o["question_number"] for o in out] == [1, 2, 3]
    # linear estimate: y = y1 + int(H * pos/len)  (question_splitter.py:277-308)
    p2 = c.index("2. ")
    y2 = 0 + int(300 * (p2 / len(c)))
    assert out[0]["block_bbox"][1] == 0
    assert out[1]["block_bbox"][1] == y2
    # content slices from match position to next match position, stripped
    assert out[0]["block_content"] == c[: p2].strip()
    # min-height clamp (config.py:47)
    for o in out:
        assert o["block_bbox"][3] - o["block_bbox"][1] >= LIMITS.min_question_height
    assert all(o["split_from_merged"] for o in out)
    assert all(o["original_block_id"] == 7 for o in out)


def test_split_with_lines_uses_best_scoring_line():
    c = "1. 甲题内容足够长久\n2. 乙题内容足够长久"
    lines = [
        {"block_id": 7, "text": "1. 甲题内容足够长久", "score": 0.95,
         "poly": [[5.0, 10.0], [600.0, 10.0], [600.0, 50.0], [5.0, 50.0]]},
        {"block_id": 7, "text": "2. 乙题内容足够长久", "score": 0.99,
         "poly": [[5.0, 60.0], [600.0, 60.0], [600.0, 100.0], [5.0, 100.0]]},
    ]
    b = _block(c, bbox=(100, 200, 900, 800))
    out = oracle.split_block_v1(b, lines)
    assert len(out) == 2
    # poly→bbox rebase: y = base_y1 + min(poly ys) (question_splitter.py:310-336)
    assert out[0]["block_bbox"][1] == 210
    assert out[1]["block_bbox"][1] == 260
    assert out[0]["block_bbox"][3] == 260  # next top
    assert out[1]["block_bbox"][3] == 800  # block bottom
    assert out[0]["confidence"] == 0.95


def test_split_unlocated_number_dropped():
    # v1: a number absent from every OCR line vanishes silently
    c = "1. 甲题内容足够长久\n2. 乙题内容足够长久"
    lines = [
        {"block_id": 7, "text": "1. 甲题内容足够长久", "score": 0.95,
         "poly": [[5.0, 10.0], [600.0, 10.0], [600.0, 50.0], [5.0, 50.0]]},
    ]
    out = oracle.split_block_v1(_block(c), lines)
    assert [o["question_number"] for o in out] == [1]
    # content runs to end of block (no next located position)
    assert out[0]["block_content"] == c.strip()


def test_split_v2_first_subblock_from_zero():
    # v2:140-153 — first sub-block slices from char 0, top = parent y1,
    # ids = parent*100+i
    c = "前导说明文字啊\n1. 甲题内容足够长久\n2. 乙题内容足够长久"
    lines = [
        {"block_id": 7, "text": "1. 甲题内容足够长久", "score": 0.9,
         "poly": [[5.0, 50.0], [600.0, 50.0], [600.0, 90.0], [5.0, 90.0]]},
        {"block_id": 7, "text": "2. 乙题内容足够长久", "score": 0.9,
         "poly": [[5.0, 100.0], [600.0, 100.0], [600.0, 140.0], [5.0, 140.0]]},
    ]
    b = _block(c, bbox=(100, 200, 900, 800))
    out = oracle.split_block_v2(b, lines)
    assert len(out) == 2
    assert out[0]["block_content"].startswith("前导说明文字啊")
    assert out[0]["block_bbox"][1] == 200  # parent y1
    assert out[0]["block_id"] == 700 and out[1]["block_id"] == 701


def test_split_v2_aborts_without_lines():
    c = "1. 甲题内容足够长久\n2. 乙题内容足够长久"
    out = oracle.split_block_v2(_block(c), [])
    assert len(out) == 1 and "question_number" not in out[0]


# ------------------------------------------------------------- structure
def test_qtype_priority_chain():
    assert oracle.classify_qtype("选出正确答案 A. 甲 B. 乙") == "选择题"
    assert oracle.classify_qtype("在（ ）里填上答案") == "填空题"
    assert oracle.classify_qtype("判断下列说法的对错") == "判断题"
    assert oracle.classify_qtype("计算下列各式") == "计算题"
    assert oracle.classify_qtype("请证明该结论") == "解答题"
    assert oracle.classify_qtype("短文本") == "其他"
    # blank beats judge (（ ） appears in both; blank is checked first)
    assert oracle.classify_qtype("判断：（ ）") == "填空题"
    # length >100 → answer even without keywords
    assert oracle.classify_qtype("很长" * 60) == "解答题"


def test_score_priority():
    assert oracle.extract_score("本题（5分）请作答") == 5
    assert oracle.extract_score("本题共计3分请作答") == 3
    assert oracle.extract_score("每题2分") == 2  # "(\d+)分" wins first
    assert oracle.extract_score("没有分数标记") == 0


def test_exam_info():
    blocks = [
        {"block_label": "doc_title", "block_content": "六年级上册数学拔尖测试卷人教版"},
        {"block_label": "text", "block_content": "时间：60分钟 满分：100分"},
        {"block_label": "text", "block_content": "时间：90分钟 满分：120分"},
    ]
    info = oracle.exam_info(blocks)
    assert info["subject"] == "数学"
    assert info["grade"] == "六年级"
    # break fires after the first block that completes both fields
    assert info["time_limit"] == "60分钟"
    assert info["total_score"] == "100"


def test_merge_greedy_exclusive():
    texts = [
        {"block_label": "text", "block_content": "1. 甲", "block_bbox": [100, 100, 900, 300],
         "block_id": 1, "question_number": 1},
        {"block_label": "text", "block_content": "2. 乙", "block_bbox": [100, 400, 900, 600],
         "block_id": 2, "question_number": 2},
    ]
    # image sits 20px below text2 (high confidence for text2), and 320px
    # below text1 (out of range)
    imgs = [{"block_label": "image", "block_content": "", "block_bbox": [300, 620, 700, 900],
             "block_id": 9}]
    merged = oracle.merge_turn(texts, imgs)
    assert merged[0]["image_ids"] == []
    assert merged[1]["image_ids"] == [9]
    assert merged[1]["bbox"] == [100, 400, 900, 900]


def test_merge_first_text_wins():
    # image equidistant-ish: first text in order claims it
    texts = [
        {"block_label": "text", "block_content": "1. 甲", "block_bbox": [100, 100, 900, 300],
         "block_id": 1, "question_number": 1},
        {"block_label": "text", "block_content": "2. 乙", "block_bbox": [100, 100, 900, 320],
         "block_id": 2, "question_number": 2},
    ]
    imgs = [{"block_label": "image", "block_content": "", "block_bbox": [300, 330, 700, 500],
             "block_id": 9}]
    merged = oracle.merge_turn(texts, imgs)
    assert merged[0]["image_ids"] == [9]
    assert merged[1]["image_ids"] == []


def test_reference_doc_false_positive_corpus():
    """The four risk cases from docs/OCR结果二次拆分方案设计.md:406-440 —
    in-sentence numbering, option labels, reference lists must not
    split; the composite sub-question case splits only when formatted
    on separate lines."""
    # 案例 1: digits inside one question's prose (no newline before)
    t1 = "如图所示，1.电路中电压为 5V，2.电流为 2A"
    assert len(oracle.detect(t1, "v1")) <= 1
    assert oracle.detect_v2(t1) is None
    # 案例 2: option labels A./B./C.
    t2 = "A. 选项1  B. 选项2  C. 选项3"
    assert oracle.detect(t2, "v1") == []
    assert oracle.detect_v2(t2) is None
    # 案例 3: reference list (mid-line numbers)
    t3 = "参考资料：1. 《物理学》 2. 《化学基础》"
    assert oracle.detect(t3, "v1") == []
    assert oracle.detect_v2(t3) is None
    # 案例 4: composite question — same line stays whole...
    t4 = "阅读材料：某段很长的材料 问题：(1) 第一问内容 (2) 第二问内容 (3) 第三问内容"
    assert oracle.detect_v2(t4) is None
    # ...but newline-separated sub-questions do split
    t5 = "阅读材料：某段很长的材料\n(1) 第一问内容足够长\n(2) 第二问内容足够长"
    got = oracle.detect_v2(t5)
    assert got and [m["number"] for m in got] == [1, 2]


def test_arbitration_cross_implementation_parity():
    """oracle.detect_v2 and detect._arbitrate are independent
    restatements of the strict/loose arbitration; they must choose
    identically on a seeded corpus spanning both fire and no-fire
    shapes."""
    import random

    from xtract import detect as dmod

    rng = random.Random(99)
    fragments = [
        "3.找一个点D，使四边形ABCD是等腰梯形，画出它。(2分)",
        "4.在图中画一条线段，将其分成两个图形。(2分)",
        "如图所示，1.电路中电压为 5V，2.电流为 2A",
        "参考资料：1. 《物理学》 2. 《化学基础》",
        "5、解方程并验算结果的正确性。（3分）",
        "速度为1.5m/s，求通过的路程是多少米。",
        "第2题图所示的三角形中，",
        "五、解决问题。(共13分)",
        "\n",
        "（ ）",
    ]
    for _ in range(300):
        text = "".join(rng.choice(fragments) for _ in range(rng.randint(1, 5)))
        want = oracle.detect_v2(text)
        got = dmod._arbitrate(text)
        want_nums = [m["number"] for m in want] if want else None
        got_nums = [t[0] for t in got] if len(got) > 1 else None
        assert want_nums == got_nums, repr(text)
        if want:
            assert [m["position"] for m in want] == [t[1] for t in got], repr(text)
