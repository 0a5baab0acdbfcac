"""Structuring stage (SURVEY.md §2.3 R6-R8, §2.6 A2-A4, §2.7 W4).

Everything here is native Spark SQL — when/rlike chains,
regexp_extract, windows — so it stays inside whole-stage codegen.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .config import (
    LIMITS,
    QTYPE_ANSWER,
    QTYPE_BLANK,
    QTYPE_CALC,
    QTYPE_CHOICE,
    QTYPE_JUDGE,
    QTYPE_OTHER,
    SCORE_PATTERNS,
)


def qtype_col(content) -> F.Column:
    """Question-type classifier, first-match-wins chain
    (extractor.py:253-280). Order is load-bearing."""
    c = F.coalesce(content, F.lit(""))
    return (
        F.when(c.rlike(r"[A-D][\.、]"), QTYPE_CHOICE)
        .when(c.rlike(r"[（(]\s*[）)]|_{2,}"), QTYPE_BLANK)
        .when(
            c.rlike(r"判断|对错|正确|错误|√|×|[（(]\s*[）)]")
            & (F.length(c) < LIMITS.judge_max_len),
            QTYPE_JUDGE,
        )
        .when(c.rlike(r"计算|求值|求出|算出"), QTYPE_CALC)
        .when(
            c.rlike(r"解答|证明|说明|分析|简述")
            | (F.length(c) > LIMITS.answer_min_len),
            QTYPE_ANSWER,
        )
        .otherwise(QTYPE_OTHER)
    )


def score_col(content) -> F.Column:
    """Score extraction: first pattern (priority order) with any match
    wins, default 0 (extractor.py:282-303)."""
    c = F.coalesce(content, F.lit(""))
    first_hits = [
        F.nullif(F.regexp_extract(c, p, 1), F.lit("")) for p in SCORE_PATTERNS
    ]
    return F.coalesce(*[h.cast("int") for h in first_hits], F.lit(0))


def structure(merged: DataFrame) -> DataFrame:
    """merged span rows (merge.MERGED_SCHEMA) → final output, with the
    sentinel-999 ordering (extractor.py:211-214: ``or 999``, so 0 and
    NULL both sort as 999) and a per-turn ``seq`` for exact list
    comparisons."""
    if "seq" in merged.columns:
        # the greedy kernel already assigned the per-turn sentinel
        # order — the whole structuring stage stays narrow
        seq_col = F.col("seq")
    else:
        sentinel = F.when(
            F.col("question_number").isNull() | (F.col("question_number") == 0),
            LIMITS.missing_number_sentinel,
        ).otherwise(F.col("question_number"))
        w = Window.partitionBy("conv_id", "turn_idx").orderBy(
            sentinel, "text_order"
        )
        seq_col = F.row_number().over(w) - 1
    return merged.select(
        "conv_id",
        "turn_idx",
        seq_col.cast("int").alias("seq"),
        "question_number",
        qtype_col(F.col("span_text")).alias("qtype"),
        score_col(F.col("span_text")).alias("score"),
        "span_text",
        "bbox",
        "has_image",
        "image_ids",
        "image_count",
        "split_from_merged",
        "source_block_id",
    )


def exam_info(blocks: DataFrame) -> DataFrame:
    """Per-turn exam metadata (extractor.py:138-193).

    Title: the LAST doc_title block wins (the reference loop
    overwrites). Time/total-score: text blocks scanned in order, each
    match overwrites, loop breaks at the first block where both are
    set — restated as: cutoff k = max(first time-match idx, first
    score-match idx); value = last match at idx ≤ k.
    """
    b = blocks.select(
        "conv_id",
        "turn_idx",
        "block_pos",
        F.col("block.block_label").alias("label"),
        F.coalesce(F.col("block.block_content"), F.lit("")).alias("content"),
    )
    return exam_info_flat(b)


def exam_info_flat(b: DataFrame) -> DataFrame:
    """exam_info over the flat block projection (conv_id, turn_idx,
    block_pos, label, content) — the shape the materialized-oracle
    queries persist to parquet."""
    titles = (
        b.filter(F.col("label") == "doc_title")
        .groupBy("conv_id", "turn_idx")
        .agg(F.max_by("content", "block_pos").alias("title"))
    )
    titles = titles.select(
        "conv_id",
        "turn_idx",
        "title",
        F.when(F.col("title").contains("数学"), "数学")
        .when(F.col("title").contains("语文"), "语文")
        .when(F.col("title").contains("英语"), "英语")
        .otherwise("")
        .alias("subject"),
        F.regexp_extract("title", r"[一二三四五六七八九]年级", 0).alias("grade"),
    )

    texts = b.filter(F.col("label") == "text").select(
        "conv_id",
        "turn_idx",
        "block_pos",
        F.nullif(
            F.regexp_extract("content", r"时间[：:]\s*(\d+)\s*分钟", 1), F.lit("")
        ).alias("tm"),
        F.nullif(
            F.regexp_extract("content", r"满分[：:]\s*([\d+]+)\s*分", 1), F.lit("")
        ).alias("sc"),
    )
    agg = texts.groupBy("conv_id", "turn_idx").agg(
        F.min(F.when(F.col("tm").isNotNull(), F.col("block_pos"))).alias("ft"),
        F.min(F.when(F.col("sc").isNotNull(), F.col("block_pos"))).alias("fs"),
        F.collect_list(
            F.when(F.col("tm").isNotNull(), F.struct("block_pos", "tm"))
        ).alias("tms"),
        F.collect_list(
            F.when(F.col("sc").isNotNull(), F.struct("block_pos", "sc"))
        ).alias("scs"),
    )
    # the loop breaks only once BOTH are set (extractor.py:190-191);
    # greatest() skips nulls in Spark, so gate on both-non-null
    cutoff = F.when(
        F.col("ft").isNotNull() & F.col("fs").isNotNull(),
        F.greatest("ft", "fs"),
    ).otherwise(F.lit(2**31 - 1))
    last_at_or_before = lambda arr, field: F.try_element_at(  # noqa: E731
        F.transform(
            F.array_sort(F.filter(arr, lambda s: s["block_pos"] <= cutoff)),
            lambda s: s[field],
        ),
        F.lit(-1),
    )
    tm_sc = agg.select(
        "conv_id",
        "turn_idx",
        F.coalesce(
            F.concat(last_at_or_before(F.col("tms"), "tm"), F.lit("分钟")),
            F.lit(""),
        ).alias("time_limit"),
        F.coalesce(last_at_or_before(F.col("scs"), "sc"), F.lit("")).alias(
            "total_score"
        ),
    )

    keys = b.select("conv_id", "turn_idx").distinct()
    return (
        keys.join(titles, ["conv_id", "turn_idx"], "left")
        .join(tm_sc, ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            F.coalesce("title", F.lit("")).alias("title"),
            F.coalesce("subject", F.lit("")).alias("subject"),
            F.coalesce("grade", F.lit("")).alias("grade"),
            F.coalesce("time_limit", F.lit("")).alias("time_limit"),
            F.coalesce("total_score", F.lit("")).alias("total_score"),
        )
    )


def turn_counters(final_spans: DataFrame) -> DataFrame:
    """A2 metadata counters per turn (extractor.py:117-121): partial
    (map-side) aggregation applies — one shuffle of pre-aggregated
    rows."""
    return final_spans.groupBy("conv_id", "turn_idx").agg(
        F.count("*").cast("long").alias("total_questions"),
        F.count_if("has_image").cast("long").alias("with_images"),
        F.sum("image_count").cast("long").alias("total_images"),
        F.count_if("split_from_merged").cast("long").alias("split_count"),
    )


def qtype_histogram(final_spans: DataFrame) -> DataFrame:
    """A3 (main_extraction.py:197-204)."""
    return final_spans.groupBy("qtype").count().orderBy("qtype")


def multi_image_questions(final_spans: DataFrame) -> DataFrame:
    """A4 (main_extraction.py:207-215)."""
    return final_spans.filter(F.col("image_count") > 1)


def turn_audit(turns: DataFrame) -> DataFrame:
    """Turn-sequence integrity audit over a transcript table
    (conv_id, turn_idx, role, text, ts): per-conversation counters
    for duplicate turn_idx, largest index gap, consecutive same-role
    runs, empty turns, and timestamp regressions. One window pass
    over (conv_id ORDER BY turn_idx) feeding a conv_id agg that
    reuses the window's partitioning — a single shuffle, on the same
    key every downstream extraction stage uses. Precondition check
    for the stable-turn-ordering guarantee the span/merge stages
    (assemble.py, split.py) assume."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    f = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "ts",
        F.lag("turn_idx").over(w).alias("pidx"),
        F.lag("role").over(w).alias("prole"),
        F.lag("ts").over(w).alias("pts"),
    )
    return f.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        (F.count("*") - F.countDistinct("turn_idx")).cast("long").alias("n_dup_idx"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("pidx").isNotNull()
                    & (F.col("turn_idx") - F.col("pidx") - 1 > 0),
                    F.col("turn_idx") - F.col("pidx") - 1,
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("max_gap"),
        F.sum(
            F.when(
                F.col("prole").isNotNull() & (F.col("role") == F.col("prole")), 1
            ).otherwise(0)
        ).cast("long").alias("n_role_repeat"),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length(F.trim("text")) == 0), 1
            ).otherwise(0)
        ).cast("long").alias("n_empty"),
        F.sum(
            F.when(
                F.col("pts").isNotNull() & (F.col("ts") < F.col("pts")), 1
            ).otherwise(0)
        ).cast("long").alias("n_ts_regress"),
    )


# ---------------------------------------------------------------------
# Transcript-level analytics over (conv_id, turn_idx, role, text, tool,
# ts) — the input-hint table. Each op keys on conv_id, the same
# partitioning every extraction stage shuffles on, so at 10^12 turns
# they ride the pipeline's existing exchange instead of adding one.
# ---------------------------------------------------------------------

CONTEXT_BUDGET = 1024  # tokens per conversation context window
CONV_PERMS = 8  # minhash components per conversation signature
CONV_BANDS = 4  # LSH bands (2 components per band)


def role_transitions(turns: DataFrame) -> DataFrame:
    """Dialogue-act transition matrix: for every adjacent turn pair
    within a conversation, count (prev_role -> role) transitions and
    the conversations exhibiting each. One lag() over the
    (conv_id ORDER BY turn_idx) window feeding a 9-row agg — a single
    conv_id shuffle; the transition agg is map-side combinable over
    at most |roles|^2 keys."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    f = turns.select(
        "conv_id", "role", F.lag("role").over(w).alias("prev_role")
    ).filter(F.col("prev_role").isNotNull())
    return f.groupBy("prev_role", "role").agg(
        F.count("*").cast("long").alias("n_transitions"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
    )


def context_budget(turns: DataFrame, budget: int = CONTEXT_BUDGET) -> DataFrame:
    """Context-window accounting: running token sum per conversation
    in turn order, reporting where each conversation first exceeds
    ``budget`` tokens (the truncation point a training-data packer
    needs) and how many turns fit. Tokens are the same [a-z0-9]+
    extraction tok_count uses, so both engines count identically.
    The running sum uses an explicit ROWS frame over the
    (conv_id ORDER BY turn_idx) window and the conv agg reuses that
    partitioning — one shuffle total."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    f = turns.select("conv_id", "turn_idx", toks.alias("toks")).withColumn(
        "cum", F.sum("toks").over(w)
    )
    return f.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("toks").cast("long").alias("total_toks"),
        F.min(F.when(F.col("cum") > budget, F.col("turn_idx")))
        .cast("long")
        .alias("overflow_turn"),
        F.count(F.when(F.col("cum") <= budget, 1))
        .cast("long")
        .alias("turns_within"),
    )


def conv_signatures(turns: DataFrame) -> DataFrame:
    """Conversation-level minhash signature WITHOUT concatenating
    turn text: component p is min over the conversation's turns of
    md5(p || '|' || turn_text). min() is associative and commutative,
    so every component combines map-side and the only shuffle is the
    conv_id groupBy — at 10^12 turns the signature table is |convs|
    rows and no executor ever holds a whole conversation's text.
    md5 hex is lowercase in both engines, so lexicographic min agrees
    bit-exactly cross-engine."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{p}|"), F.col("text")))).alias(f"s{p}")
        for p in range(CONV_PERMS)
    ]
    return turns.groupBy("conv_id").agg(*aggs)


def conv_dedup_pairs(sigs: DataFrame, min_bands: int = 2) -> DataFrame:
    """LSH banding over conversation signatures: 4 bands of 2
    components; conversations sharing >= ``min_bands`` band keys are
    near-duplicate candidates. Band keys are md5 of the concatenated
    components, the join is a band+key equi-join over the tiny
    conv-level table (never the turns), and the pair agg counts
    agreeing bands."""
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(F.col(f"s{2 * b}"), F.col(f"s{2 * b + 1}"))).alias(
                "bkey"
            ),
        )
        for b in range(CONV_BANDS)
    ]
    m = sigs.select("conv_id", F.explode(F.array(*bands)).alias("x")).select(
        "conv_id", F.col("x.band").alias("band"), F.col("x.bkey").alias("bkey")
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .groupBy(
            F.col("a.conv_id").alias("conv_a"),
            F.col("b.conv_id").alias("conv_b"),
        )
        .agg(F.count("*").cast("long").alias("n_bands"))
        .filter(F.col("n_bands") >= min_bands)
    )


def conv_windows(turns: DataFrame, budget: int = CONTEXT_BUDGET) -> DataFrame:
    """GREEDY capacitated segmentation: split each conversation into
    training windows of consecutive turns whose token sums stay
    within ``budget`` — the sliding-context construction an SFT
    pipeline feeds to fixed-context models. The greedy reset (a new
    window starts exactly when adding the next turn would overflow)
    is order-dependent state that no closed-form window function
    expresses, so it runs as a SECONDARY-SORT fold: repartition by
    conv_id, sortWithinPartitions by (conv_id, turn_idx), then one
    mapInPandas pass whose 6-int state survives Arrow-batch
    boundaries within the partition — ONE conv_id shuffle, one
    sequential Python loop per task, no per-group invocation
    overhead (a groupBy().applyInPandas formulation of the same fold
    measured ~10x slower at 5k conversations purely on per-group
    pandas setup). A turn larger than the budget alone occupies its
    own window and is flagged oversize. Tokens are the shared
    [a-z0-9]+ count, so the DuckDB oracle can replay the exact
    recursion with a recursive CTE."""
    import pandas as pd

    out_schema = (
        "conv_id string, window_id long, start_turn long, end_turn long,"
        " n_turns long, window_toks long, oversize boolean"
    )
    cols = [
        "conv_id", "window_id", "start_turn", "end_turn",
        "n_turns", "window_toks", "oversize",
    ]

    def segment(batches):
        # fold state: survives batch boundaries inside one partition
        conv, win, cur, start, last, n = None, 1, 0, None, 0, 0
        out = []

        def flush():
            if conv is not None and n > 0:
                out.append((conv, win, start, last, n, cur, cur > budget))

        for pdf in batches:
            for c, t_idx, toks in zip(
                pdf["conv_id"].to_numpy(),
                pdf["turn_idx"].to_numpy(),
                pdf["toks"].to_numpy(),
            ):
                t_idx, toks = int(t_idx), int(toks)
                if c != conv:
                    flush()
                    conv, win, cur, start, n = c, 1, 0, None, 0
                elif cur + toks > budget:
                    flush()
                    win, cur, start, n = win + 1, 0, None, 0
                if n == 0:
                    start = t_idx
                cur += toks
                n += 1
                last = t_idx
            if out:
                yield pd.DataFrame(out, columns=cols)
                out = []
        flush()
        if out:
            yield pd.DataFrame(out, columns=cols)

    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    return (
        turns.select("conv_id", "turn_idx", toks.alias("toks"))
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .mapInPandas(segment, schema=out_schema)
    )


def loss_mask(turns: DataFrame) -> DataFrame:
    """SFT loss-mask span table: for every turn, the [start_tok,
    end_tok) token-offset interval it occupies in its conversation's
    packed token stream and whether the trainer masks it (loss is
    computed only on assistant turns; user/tool turns are context).
    This is the per-turn annotation a supervised fine-tuning collator
    consumes after conversations are flattened to one token sequence.
    Offsets come from ONE running-sum window over
    (conv_id ORDER BY turn_idx) with an explicit ROWS frame ending at
    the previous row — a single conv_id shuffle, no join; at 10^12
    turns the output is exactly |turns| fixed-width rows and the
    window state per group is one long. Tokens are the shared
    [a-z0-9]+ count (tok_count / context_budget discipline), so both
    engines count identically."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    f = turns.select("conv_id", "turn_idx", "role", toks.alias("toks"))
    start = F.coalesce(F.sum("toks").over(w), F.lit(0))
    return f.select(
        "conv_id",
        "turn_idx",
        "role",
        start.cast("long").alias("start_tok"),
        (start + F.col("toks")).cast("long").alias("end_tok"),
        # coalesce: a NULL role (possible on real deliveries, e.g. the
        # jsonl: arm) must mask deterministically, not yield a null
        # boolean that downstream pandas folds would read as False
        (F.coalesce(F.col("role"), F.lit("")) != F.lit("assistant")).alias(
            "masked"
        ),
    )


def turn_templates(turns: DataFrame, min_occ: int = 2) -> DataFrame:
    """Template / canned-reply detection: normalize each turn's text
    (lowercase, digit runs collapsed to '#', whitespace collapsed,
    first 80 chars) and count occurrences + distinct conversations
    per (role, template) class — the per-turn analogue of document
    dedup that catches boilerplate assistant replies repeated across
    conversations (the SlimPajama/RefinedWeb motivation for
    response-level dedup in chat corpora). The normalization is pure
    string expressions (whole-stage codegen); the agg keys on a
    32-byte md5 so no template text transits the shuffle, and it is
    map-side combinable — at 10^12 turns the reduce side sees at most
    |distinct templates| rows per partition."""
    # explicit whitespace class: Java \s includes U+000B, RE2 \s does
    # not — an explicit class keeps both engines' normalization
    # byte-identical (DuckDB oracle uses the same class)
    norm = F.substring(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#"),
                "[ \t\n\f\r]+",
                " ",
            )
        ),
        1,
        80,
    )
    f = turns.select("conv_id", "role", F.md5(norm).alias("tkey"))
    return (
        f.groupBy("role", "tkey")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
        .filter(F.col("n_turns") >= min_occ)
    )


def window_assignments(turns: DataFrame, budget: int = CONTEXT_BUDGET) -> DataFrame:
    """Per-TURN training-window assignment: the same greedy
    capacitated fold conv_windows runs, but emitting one row per turn
    (conv_id, turn_idx, window_id, toks, masked) instead of one row
    per window — the join-free way to compose window segmentation
    with per-turn annotations. A (windows BETWEEN-join turns)
    formulation would pair every window with every turn of its
    conversation before filtering, which goes quadratic on
    mega-conversations; assigning the window id inside the linear
    fold keeps the composition skew-safe at any conversation size.
    Same secondary-sort shape as conv_windows: ONE conv_id exchange,
    in-partition sort, one sequential pass with constant state."""
    import pandas as pd

    out_schema = (
        "conv_id string, turn_idx long, window_id long, toks long,"
        " masked boolean"
    )
    cols = ["conv_id", "turn_idx", "window_id", "toks", "masked"]

    def assign(batches):
        conv, win, cur = None, 1, 0
        out = []
        for pdf in batches:
            for c, t_idx, toks, masked in zip(
                pdf["conv_id"].to_numpy(),
                pdf["turn_idx"].to_numpy(),
                pdf["toks"].to_numpy(),
                pdf["masked"].to_numpy(),
            ):
                t_idx, toks = int(t_idx), int(toks)
                if c != conv:
                    conv, win, cur = c, 1, 0
                elif cur + toks > budget:
                    # no cur>0 guard: conv_windows (and the recursive
                    # -CTE oracle) open a new window whenever adding
                    # the turn would overflow, even off a zero-token
                    # turn after an oversized one — the folds must
                    # agree input-for-input
                    win, cur = win + 1, 0
                cur += toks
                out.append((conv, t_idx, win, toks, bool(masked)))
            if out:
                yield pd.DataFrame(out, columns=cols)
                out = []

    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0))
    return (
        turns.select(
            "conv_id",
            "turn_idx",
            toks.alias("toks"),
            # same NULL-role coalesce as loss_mask: bool(None) is
            # False in the fold, which would silently treat a
            # null-role turn as loss-carrying
            (F.coalesce(F.col("role"), F.lit("")) != F.lit("assistant")).alias(
                "masked"
            ),
        )
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .mapInPandas(assign, schema=out_schema)
    )


def window_supervision(turns: DataFrame, budget: int = CONTEXT_BUDGET) -> DataFrame:
    """Supervision density per training window: for every greedy
    context window, how many of its tokens actually carry loss
    (assistant turns) — the metric that finds worthless all-context
    windows before they burn training compute. Linear fold (per-turn
    window assignment) + one (conv_id, window_id) hash agg. Two
    exchanges total: the fold's conv_id repartition (MapInPandas
    output partitioning is opaque to Catalyst, so the agg cannot
    formally reuse it) and the agg exchange — but the second moves
    only the 5-field fixed-width assignment rows (never text) and is
    map-side combined to |windows| rows first. loss_ppm in integer
    parts-per-million so the cross-engine contract is exact
    (zero-token windows report null ppm in both engines)."""
    a = window_assignments(turns, budget)
    loss = F.sum(F.when(~F.col("masked"), F.col("toks")).otherwise(F.lit(0)))
    return a.groupBy("conv_id", "window_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("toks").cast("long").alias("window_toks"),
        loss.cast("long").alias("loss_toks"),
        F.expr(
            "case when sum(toks) > 0 then"
            " sum(case when not masked then toks else 0 end) * 1000000"
            " div sum(toks) end"
        )
        .cast("long")
        .alias("loss_ppm"),
    )
