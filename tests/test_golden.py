"""Golden replay against the reference's own saved outputs
(output/exam_analysis_vl_v2/*_v2_{paddle_raw,split}.json — the
input→output chain of the v2 OCR-precise splitter, SURVEY.md §5.2).

These files are read-only evidence produced by the real reference run
(with live OCR + VL); our deterministic rebuild reproduces every split
in the corpus, including the one the reference settled by VL call:
the consecutive-extension arbitration (oracle._prefer_loose) makes
the same choice the VL made on page 2 block 5, deterministically.
The remaining external-model note: OCR line geometry is absent from
our fixtures, so v2 aborts geometry-dependent splits (v2:134-136) —
which is also what the reference did when OCR missed.
"""
import json

import pytest

from xtract import oracle

GOLD = "/root/reference/output/exam_analysis_vl_v2"
PAGES = ["2", "3", "7", "8", "mifeng_doubao_1"]

# the single strict/loose-divergent split in the corpus (page 2 block
# 5: "…(2分)4.在这个…" — mid-line 4. invisible to strict); the
# reference's VL arbitration sided with loose, and so does our
# deterministic consecutive-extension rule — asserted below
KNOWN_VL_SPLITS = {("2", 5)}


def _load(page):
    raw = json.load(open(f"{GOLD}/{page}_v2_paddle_raw.json"))
    sp = json.load(open(f"{GOLD}/{page}_v2_split.json"))
    return raw["blocks"], sp["blocks"]


@pytest.mark.parametrize("page", PAGES)
def test_golden_split_replay(page):
    raw, split = _load(page)
    raw_by_id = {b["id"]: b for b in raw}
    groups: dict[int, list] = {}
    for b in split:
        if b.get("split_from_merged"):
            groups.setdefault(b["id"] // 100, []).append(b)

    for parent, subs in groups.items():
        subs.sort(key=lambda b: b["id"])
        text = raw_by_id[parent]["text"]
        strict = oracle.detect(text, "v2-strict")
        loose = oracle.detect(text, "v2-loose")

        if (page, parent) in KNOWN_VL_SPLITS:
            # the arbitration is genuinely exercised here…
            assert len(strict) != len(loose)
        else:
            # …and everywhere else the deterministic path is decisive
            assert len(strict) == len(loose), (page, parent)

        # full replay through the arbitrated detection — including the
        # VL-settled case, which the consecutive-extension rule now
        # reproduces without any model call
        chosen = oracle.detect_v2(text)
        assert chosen is not None, (page, parent)
        assert [m["number"] for m in chosen] == [
            s["question_number"] for s in subs
        ], (page, parent)
        # v2 slicing: sub 0 from char 0, later from match position
        # (v2:140-150); ids parent*100+i (v2:151-153)
        for i, (m, s) in enumerate(zip(chosen, subs)):
            start = 0 if i == 0 else m["position"]
            end = chosen[i + 1]["position"] if i + 1 < len(chosen) else len(text)
            assert text[start:end].strip() == s["text"], (page, parent, i)
            assert s["id"] == parent * 100 + i


@pytest.mark.parametrize("page", PAGES)
def test_golden_split_geometry_invariants(page):
    """Sub-block geometry in the goldens obeys the v2 boundary rules we
    implement: x-range inherited, first top = parent top, last bottom =
    parent bottom, boundaries contiguous (v2:226-245)."""
    raw, split = _load(page)
    raw_by_id = {b["id"]: b for b in raw}
    groups: dict[int, list] = {}
    for b in split:
        if b.get("split_from_merged"):
            groups.setdefault(b["id"] // 100, []).append(b)
    for parent, subs in groups.items():
        subs.sort(key=lambda b: b["id"])
        pb = raw_by_id[parent]["bbox"]
        assert subs[0]["bbox"][1] == pb[1]
        assert subs[-1]["bbox"][3] == pb[3]
        for s in subs:
            assert s["bbox"][0] == pb[0] and s["bbox"][2] == pb[2]
        for a, b2 in zip(subs, subs[1:]):
            assert a["bbox"][3] == b2["bbox"][1]


@pytest.mark.parametrize("page", PAGES)
def test_golden_unsplit_blocks_stay_whole(page):
    """Every text block the reference did NOT split must come out whole
    from our v2 splitter too. Without fixture OCR lines the splitter's
    abort rule (v2:134-136) guarantees it; this pins that the pipeline
    cannot over-split the real-page corpus."""
    raw, split = _load(page)
    split_parents = {b["id"] // 100 for b in split if b.get("split_from_merged")}
    for b in raw:
        if b["label"] != "text" or b["id"] in split_parents:
            continue
        blk = {
            "block_label": "text",
            "block_content": b["text"],
            "block_bbox": b["bbox"],
            "block_id": b["id"],
        }
        out = oracle.split_block_v2(blk, [])
        assert len(out) == 1 and not out[0].get("split_from_merged"), (
            page,
            b["id"],
        )


def test_golden_block_passthrough_counts():
    """Non-split blocks pass through the split stage byte-identical
    (id, text, bbox, label)."""
    for page in PAGES:
        raw, split = _load(page)
        raw_by_id = {b["id"]: b for b in raw}
        for b in split:
            if b.get("split_from_merged"):
                continue
            src = raw_by_id[b["id"]]
            assert b["text"] == src["text"]
            assert b["bbox"] == src["bbox"]
            assert b["label"] == src["label"]


def test_golden_group_overlap_floor():
    """The X4 VL semantic aggregation is replaced by deterministic
    routing (north rule) — byte parity is impossible because the VL's
    own grouping is inconsistent across pages (page 3 sweeps whole
    columns into one group, page 8 pairs question+answer blocks,
    page 2 re-merges blocks the splitter just split). This test pins
    the measured structural overlap so regressions in the router are
    caught: exact block-id-set matches per page against the VL's
    question groups, computed from the same split-stage blocks."""
    want = {"2": 4, "3": 0, "7": 7, "8": 5, "mifeng_doubao_1": 14}
    for page, floor in want.items():
        r = json.load(open(f"{GOLD}/{page}_v2_result.json"))
        sp = json.load(open(f"{GOLD}/{page}_v2_split.json"))
        blocks = [
            {"block_label": b["label"], "block_content": b["text"],
             "block_bbox": b["bbox"], "block_id": b["id"],
             "block_order": b["id"], "group_id": b["id"],
             "question_number": b.get("question_number"),
             "split_from_merged": b.get("split_from_merged", False)}
            for b in sp["blocks"]
        ]
        payload = json.dumps(
            {"page": r.get("image_size", {}), "blocks": blocks, "lines": []},
            ensure_ascii=False,
        )
        ours = oracle.analyze_turn(payload)
        gold_q = {tuple(sorted(g["block_ids"]))
                  for g in r["question_groups"] if g["type"] == "question"}
        our_q = {tuple(sorted(g.get("block_ids", [])))
                 for g in ours if g.get("gtype") == "question"}
        assert len(gold_q & our_q) >= floor, (page, len(gold_q & our_q))


GOLD_V1 = "/root/reference/output/exam_analysis_vl"
PAGES_V1 = ["1", "mifeng_1"]


@pytest.mark.parametrize("page", PAGES_V1)
def test_golden_v1_postprocessor_replay(page):
    """v1 analyzer chain (…vl_ocr.py): given the VL's group membership
    (the semantic step), the post-processor's deterministic math must
    replay exactly — merged_bbox = min/max over member blocks (G5,
    …vl_ocr.py:781-819) and merged_text = block texts joined with a
    space in block_ids order, skipping empties (A1). Also SO1: every
    block id appears in exactly one group (validate_groups anti-join
    repair, :822-851)."""
    raw = json.load(open(f"{GOLD_V1}/{page}_vl_paddle_raw.json"))
    res = json.load(open(f"{GOLD_V1}/{page}_vl_result.json"))
    by_id = {b["id"]: b for b in raw["blocks"]}

    seen: list[int] = []
    for g in res["question_groups"]:
        members = [by_id[i] for i in g["block_ids"] if i in by_id]
        assert len(members) == len(g["block_ids"]), g["block_ids"]
        seen.extend(g["block_ids"])
        # G5 merged bbox: min/max corners over member bboxes
        want_bbox = [
            min(b["bbox"][0] for b in members),
            min(b["bbox"][1] for b in members),
            max(b["bbox"][2] for b in members),
            max(b["bbox"][3] for b in members),
        ]
        assert g["merged_bbox"] == want_bbox, g["block_ids"]
        # A1 ordered concat: texts in block_ids order, empties skipped
        want_text = " ".join(
            b["text"] for b in members if (b["text"] or "").strip()
        )
        assert g["merged_text"] == want_text, g["block_ids"]
    # SO1: partition property — every raw block in exactly one group
    assert sorted(seen) == sorted(b["id"] for b in raw["blocks"])
