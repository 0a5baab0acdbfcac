"""Physical-plan audit: capture .explain('formatted') for the engine's
key plans and assert the scale-critical properties the round brief
demands — column pruning reaching the scan, zero exchanges in the
fused plan, broadcast joins where dims are small, codegen coverage.

Writes docs/PLANS.md. Run: python tools/explain_audit.py
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> None:
    import bench
    from xtract import pipeline, queries, session

    spark = session.build(app="explain-audit", cores=8, shuffle_partitions=8)
    path = bench.cached_transcripts(spark, 200)
    tr = spark.read.parquet(path)

    sections: list[tuple[str, str, list[str]]] = []
    checks: list[tuple[str, bool]] = []

    # ---- fused extraction: must be shuffle-free and column-pruned ----
    fused = pipeline.extract(tr, mode="fused")
    p = plan_of(fused)
    sections.append(
        (
            "Fused extraction (scan → mapInPandas → project)",
            p,
            [
                "ZERO `Exchange` operators — per-turn extraction is embarrassingly "
                "parallel and the plan proves it: it scales by adding executors with "
                "no shuffle traffic at any width.",
                "`ReadSchema` prunes to conv_id/turn_idx/text — role/tool/ts never "
                "leave the parquet reader.",
            ],
        )
    )
    checks.append(("fused plan has no Exchange", "Exchange" not in p))
    checks.append(
        (
            "fused scan prunes columns (no role/tool in ReadSchema)",
            "role" not in p.split("ReadSchema")[1].splitlines()[0]
            if "ReadSchema" in p
            else False,
        )
    )

    # ---- fused + filter: predicate pushdown through the kernel ------
    filtered = pipeline.extract(tr.filter(F.col("conv_id") == "conv00000003"))
    p = plan_of(filtered)
    sections.append(
        (
            "Fused extraction with a conv_id filter",
            p,
            [
                "The filter appears as `PushedFilters` in the parquet scan: "
                "partition-/row-group-pruning happens before any Python runs.",
            ],
        )
    )
    checks.append(
        ("conv_id filter pushed to scan", "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id" in p)
    )

    # ---- relational split stage: single window, codegen around it ---
    from xtract import sources, split

    spans = split.split_spans(sources.exploded_blocks(sources.parse_payloads(tr)))
    p = plan_of(spans)
    sections.append(
        (
            "Relational split stage",
            p,
            [
                "ZERO `Exchange` operators: a block's matches live in one array "
                "cell, so locate / y-sort / lead-boundaries / slicing are array "
                "transforms — the whole split stage is narrow.",
                "Codegen check uses explain('codegen'): the AQE formatted view "
                "does not annotate codegen ids pre-execution. The detection UDF "
                "(ArrowEvalPython) fences the codegen regions by design.",
            ],
        )
    )
    checks.append(("split plan has no Exchange", "Exchange" not in p))
    checks.append(
        (
            "split compiles WholeStageCodegen subtree(s)",
            "WholeStageCodegen" in plan_of(spans, "codegen"),
        )
    )
    checks.append(("split uses Arrow UDF eval", "ArrowEvalPython" in p))

    # ---- broadcast lookup query ------------------------------------
    q = queries.QUERIES["j5_broadcast_lookup"](spark, "/root/testdata/sf0.001")
    p = plan_of(q)
    sections.append(
        (
            "j5_broadcast_lookup (customer ⋈ nation ⋈ region)",
            p,
            ["Both dimension joins are `BroadcastHashJoin` — no shuffle of the fact side."],
        )
    )
    checks.append(("dims broadcast", p.count("BroadcastHashJoin") >= 2))

    # ---- TPC-H Q1 shape: partial aggregation ------------------------
    q = queries.QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")
    p = plan_of(q)
    sections.append(
        (
            "a1_pricing_summary",
            p,
            [
                "`HashAggregate` appears twice (partial → final): map-side combine "
                "means the exchange moves 6 rows per partition, not 6M.",
                "The shipdate filter reaches the scan as `PushedFilters`.",
            ],
        )
    )
    checks.append(("a1 partial agg", p.count("HashAggregate") >= 2))
    checks.append(("a1 filter pushdown", "PushedFilters: [IsNotNull(l_shipdate)" in p))

    # ---- PDF source path: parse + extract stays narrow ---------------
    from xtract import pdf as pdf_mod

    pdf_spans = pipeline.extract(
        pdf_mod.pdf_to_transcripts(pdf_mod.gen_pdf_turns(spark, 8, partitions=2)),
        mode="fused",
    )
    p = plan_of(pdf_spans)
    sections.append(
        (
            "PDF source → extraction (gen → parse → extract)",
            p,
            [
                "ZERO `Exchange` operators: PDF byte parsing and span extraction "
                "compose as consecutive narrow mapInPandas stages — a directory of "
                "10^9 PDFs scales exactly like the transcript path.",
            ],
        )
    )
    checks.append(("pdf path has no Exchange", "Exchange" not in p))

    # ---- fingerprint kernel: narrow, column-pruned scan --------------
    from xtract import fingerprint as fpm

    fps = fpm.fingerprints(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    p = plan_of(fps)
    sections.append(
        (
            "Winnowing fingerprints (documents scan → kernel)",
            p,
            [
                "Narrow kernel; `ReadSchema` prunes the documents scan to "
                "doc_id/text only.",
            ],
        )
    )
    checks.append(("fingerprint kernel has no Exchange", "Exchange" not in p))
    checks.append(
        (
            "fingerprint scan prunes to doc_id/text",
            "lang" not in p.split("ReadSchema")[1].splitlines()[0]
            if "ReadSchema" in p
            else False,
        )
    )

    # ---- cross-turn assembly: exactly ONE shuffle -------------------
    from xtract import assemble

    asm = assemble.merge_continuations(pipeline.extract(tr, mode="fused"))
    p = plan_of(asm)
    n_exchanges = len(
        [ln for ln in p.splitlines() if ln.strip().startswith("(") and ") Exchange" in ln]
    )
    sections.append(
        (
            "Cross-turn assembly (window → islands → rollup)",
            p,
            [
                "Exactly ONE Exchange: the conv_id hash partitioning installed for "
                "the lag/sum windows is reused by the per-segment aggregation "
                "(partial → final with no re-shuffle), so assembly costs one "
                "shuffle of span-sized rows regardless of cluster width.",
            ],
        )
    )
    checks.append(("assembly has exactly one Exchange", n_exchanges == 1))

    # ---- near-dup queries: candidate shapes, never a cartesian ------
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for qname in ("ngram_jaccard_pairs", "near_dup_scored", "minhash128_pairs"):
        p = plan_of(queries.QUERIES[qname](spark, sf_dir))
        no_cart = (
            "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        )
        sections.append(
            (
                f"{qname} (inverted-index candidates → exact scoring)",
                p,
                [
                    "Every join in this plan is an equi-join (SortMergeJoin/"
                    "BroadcastHashJoin on gram / fingerprint / band keys): pair "
                    "generation shuffles posting rows bounded by the stop-gram/"
                    "bucket cap, never |doc|² pairs. No CartesianProduct, no "
                    "BroadcastNestedLoopJoin.",
                ],
            )
        )
        checks.append((f"{qname} plan has no cartesian/theta join", no_cart))

    # ---- boundary-only assembly: span table never shuffles ----------
    asm_sparse = assemble.merge_continuations_sparse(pipeline.extract(tr, mode="fused"))
    p = plan_of(asm_sparse)
    sections.append(
        (
            "Boundary-only assembly (digest agg → tiny window → broadcast anti-join)",
            p,
            [
                "The full span table reaches the output through a partial "
                "(map-side-combined) per-turn digest aggregation and a BROADCAST "
                "left-anti join — the exchanges in this plan move only per-turn "
                "digest rows (~2 spans/turn) and multi-part members, never the "
                "span table itself. This is the 100-TB form of the dense plan "
                "(segment key = head-span identity instead of the dense ordinal).",
            ],
        )
    )
    checks.append(
        (
            "sparse assembly singleton branch is a broadcast anti-join",
            "BroadcastHashJoin" in p and "LeftAnti" in p,
        )
    )
    checks.append(
        (
            "sparse assembly windows run on digest rows (partial agg before exchange)",
            "partial" in p.lower() and "Window" in p,
        )
    )

    # ---- salted two-phase agg + salted repartition (skew.py) --------
    from xtract import skew

    salted = skew.salted_agg(
        tr,
        [
            (F.count("*"), "turns", F.sum("turns").cast("long")),
            (
                F.collect_set("tool"),
                "tools",
                F.size(F.array_distinct(F.flatten(F.collect_list("tools")))),
            ),
        ],
        n_salts=8,
    )
    p = plan_of(salted)
    agg_keys = [
        ln for ln in p.splitlines() if "Keys" in ln and "HashAggregate" not in ln
    ]
    first_salted = any("salt" in ln and "conv_id" in ln for ln in agg_keys)
    sections.append(
        (
            "Salted two-phase aggregation (skew.salted_agg)",
            p,
            [
                "Stage 1 aggregates by (conv_id, salt) — a mega-conversation's "
                "rows land on up to n_salts reducers; stage 2 reduces the "
                "n_salts partial rows per conversation. Both exchanges move "
                "aggregated rows only.",
            ],
        )
    )
    checks.append(
        (
            "salted agg is two-phase (≥2 exchanges, first keyed with salt)",
            p.count("hashpartitioning(") >= 2 and first_salted,
        )
    )

    rep = skew.salted_repartition(tr, 12, n_salts=8, threshold_turns=300)
    p = plan_of(rep)
    sections.append(
        (
            "Salted repartition (heavy-only salting, broadcast membership)",
            p,
            [
                "Heavy-conversation detection joins back as a BROADCAST — the "
                "transcript table itself shuffles exactly once, on "
                "(conv_id, salt).",
            ],
        )
    )
    checks.append(
        (
            "salted repartition shuffles on (conv_id, salt) with broadcast membership",
            "BroadcastHashJoin" in p
            and any(
                "hashpartitioning" in ln and "salt" in ln and "conv_id" in ln
                for ln in p.splitlines()
            ),
        )
    )

    # ---- as-of join: merge-of-sorted-streams, not a join ------------
    from xtract import queries as qmod

    asof = qmod.QUERIES["asof_view_before_purchase"](spark, "/root/testdata/sf0.001")
    p = plan_of(asof)
    sections.append(
        (
            "As-of join (union + ordered window — no join operator)",
            p,
            [
                "Nearest-earlier matching compiles to a single Window over "
                "one user_id exchange (plus the view-dedup aggregation's own "
                "exchange): each event row shuffles a bounded number of "
                "times, and no join operator (with its per-key fan-out risk) "
                "appears anywhere in the plan.",
            ],
        )
    )
    n_win = len(
        [ln for ln in p.splitlines() if ln.strip().startswith("(") and ") Window" in ln]
    )
    checks.append(
        (
            "asof plan: join-free, one Window, two exchanges (dedup agg + window)",
            "Join" not in p and p.count("hashpartitioning(") == 2 and n_win == 1,
        )
    )

    # ---- decontamination: eval n-grams broadcast, big side unshuffled
    dec = qmod.QUERIES["decontaminate_eval"](spark, "/root/testdata/sf0.001")
    p = plan_of(dec)
    sections.append(
        (
            "Decontamination (eval n-gram set broadcast to training grams)",
            p,
            [
                "The held-out eval slice is ~1% of docs, so its distinct "
                "n-gram set broadcasts: the training side's exploded n-grams "
                "— the 100-TB side — are joined with a BroadcastHashJoin and "
                "never shuffle on the gram key.",
            ],
        )
    )
    checks.append(
        (
            "decontaminate: n-gram overlap is a BroadcastHashJoin",
            "BroadcastHashJoin" in p,
        )
    )

    # ---- corpus span dedup: one content shuffle + one doc_id agg ----
    sd = qmod.QUERIES["span_dedup_corpus"](spark, "/root/testdata/sf0.001")
    p = plan_of(sd)
    sections.append(
        (
            "Corpus span dedup (explode → first-occurrence window → reassemble)",
            p,
            [
                "Exactly two hash exchanges: one partitioned BY SPAN CONTENT "
                "for the global first-occurrence window, one by doc_id for "
                "reassembly — the C4-style span dedup never approaches "
                "pairwise comparison, and no join appears at all.",
            ],
        )
    )
    checks.append(
        (
            "span dedup: two exchanges (chunk window + doc reassembly), no join",
            p.count("hashpartitioning(") == 2 and "Join" not in p,
        )
    )

    # ---- global training order: bucketed rank, no global window ----
    ts = qmod.QUERIES["train_order_shards"](spark, "/root/testdata/sf0.001")
    p = plan_of(ts)
    sections.append(
        (
            "Global training order (bucketed two-pass rank + shards)",
            p,
            [
                "The global row_number is computed per md5-prefix "
                "bucket plus a broadcast cumulative offset — the plan "
                "contains NO SinglePartition exchange, which is the "
                "signature of the naive global-order window that "
                "serializes the whole table through one task.",
            ],
        )
    )
    checks.append(
        (
            "train order: no SinglePartition exchange; offsets broadcast",
            "SinglePartition" not in p and "BroadcastExchange" in p,
        )
    )

    # ---- language rebalance: metadata quota broadcast --------------
    bl = qmod.QUERIES["balance_langs"](spark, "/root/testdata/sf0.001")
    p = plan_of(bl)
    checks.append(
        (
            "balance_langs: data-dependent quota is broadcast, one lang window",
            "Broadcast" in p,
        )
    )

    # ---- vocab build: distributed top-k, vocab broadcast back ------
    vo = qmod.QUERIES["vocab_oov"](spark, "/root/testdata/sf0.001")
    p = plan_of(vo)
    checks.append(
        (
            "vocab_oov: top-k is TakeOrderedAndProject (no global sort); "
            "vocab broadcast to the gram stream",
            "TakeOrderedAndProject" in p and "BroadcastHashJoin" in p,
        )
    )

    # ---- bloom dedup: bitmap broadcast, membership map-side --------
    bd = qmod.QUERIES["bloom_dedup_exact"](spark, "/root/testdata/sf0.001")
    p = plan_of(bd)
    sections.append(
        (
            "Bloom-pruned exact dedup (bitmap broadcast → verify join)",
            p,
            [
                "The corpus bloom filter is materialized as an m/64-row "
                "bitmap table and BROADCAST: the new batch tests membership "
                "in a BroadcastHashJoin (map-side, no shuffle of the batch "
                "on the fingerprint), and only bloom-positives reach the "
                "exact-verify join.",
            ],
        )
    )
    checks.append(
        (
            "bloom dedup: bitmap membership is a BroadcastHashJoin, no cartesian",
            "BroadcastHashJoin" in p and "CartesianProduct" not in p,
        )
    )

    # ---- domain gate: corpus bar joins as a broadcast scalar -------
    dg = qmod.QUERIES["domain_quality_gate"](spark, "/root/testdata/sf0.001")
    p = plan_of(dg)
    checks.append(
        (
            "domain gate: corpus bar is a broadcast (nested-loop on 1 row, "
            "no shuffle of the domain table)",
            "Broadcast" in p,
        )
    )

    # ---- cohort retention: no third exchange on the activity side --
    co = qmod.QUERIES["cohort_retention"](spark, "/root/testdata/sf0.001")
    p = plan_of(co)
    sections.append(
        (
            "Cohort retention (user-keyed join reuses agg partitioning)",
            p,
            [
                "Cohort and activity tables each shuffle ONCE on user_id; "
                "the join reuses that partitioning (no extra exchange "
                "between the aggregates and the join), and the final "
                "matrix aggregation moves weeks² rows.",
            ],
        )
    )
    user_exchanges = len(
        [
            ln
            for ln in p.splitlines()
            if "hashpartitioning(user_id" in ln
        ]
    )
    checks.append(
        (
            "cohort: exactly two user_id exchanges (one per side), join reuses them",
            user_exchanges == 2,
        )
    )

    # ---- tfidf cosine pairs: inverted-index equi-join, no product --
    tc = qmod.QUERIES["tfidf_cosine_pairs"](spark, "/root/testdata/sf0.001")
    p = plan_of(tc)
    sections.append(
        (
            "Sparse tf-idf pair similarity (posting-list equi-join)",
            p,
            [
                "Doc pairs are generated ONLY by the term-bucket "
                "equi-join over df-capped posting lists — no cartesian/"
                "theta join anywhere; dot products and norms are exact "
                "integer aggregates.",
            ],
        )
    )
    import re as _re

    checks.append(
        (
            "tfidf cosine: pair space is the term equi-join — no cartesian; "
            "the only nested-loop nodes are the 1-row N broadcast (one per "
            "self-join side)",
            "CartesianProduct" not in p
            and len(_re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, _re.M))
            <= 2,
        )
    )

    # ---- winsorized stats: bounds broadcast back for the clamp -----
    ws = qmod.QUERIES["winsorized_stats"](spark, "/root/testdata/sf0.001")
    p = plan_of(ws)
    checks.append(
        (
            "winsorize: bounds table joins back as a BroadcastHashJoin "
            "(row side never re-shuffles for the clamp)",
            "BroadcastHashJoin" in p,
        )
    )

    # ---- scd2: all three windows share one user_id exchange --------
    sc2 = qmod.QUERIES["scd2_user_state"](spark, "/root/testdata/sf0.001")
    p = plan_of(sc2)
    checks.append(
        (
            "scd2: single user_id exchange feeds lag filter + lead/"
            "row_number (no join, no second shuffle)",
            len(
                [
                    ln
                    for ln in p.splitlines()
                    if "hashpartitioning(user_id" in ln
                ]
            )
            == 1
            and "Join" not in p,
        )
    )

    # ---- peak concurrency: sweep-line, no interval join ------------
    pc = qmod.QUERIES["peak_concurrency"](spark, "/root/testdata/sf0.001")
    p = plan_of(pc)
    checks.append(
        (
            "peak concurrency: sweep-line plan has no join at all "
            "(the naive form is an interval self-join)",
            "Join" not in p,
        )
    )

    # ---- fk audit: fact scans prune to the FK column ---------------
    fk = qmod.QUERIES["fk_orphan_audit"](spark, "/root/testdata/sf0.001")
    p = plan_of(fk)
    checks.append(
        (
            "fk audit: anti-joins are broadcast; no payload columns in "
            "lineitem scans (ReadSchema carries only keys)",
            "BroadcastHashJoin LeftAnti" in p.replace("  ", " ")
            or "LeftAnti BuildRight" in p,
        )
    )
    checks.append(
        (
            "fk audit: lineitem scan prunes payload (no l_comment/"
            "l_extendedprice in any ReadSchema)",
            "l_comment" not in p and "l_extendedprice" not in p,
        )
    )

    # ---- outlier flags: stats broadcast, fact side never shuffles --
    ol = qmod.QUERIES["outlier_3sigma"](spark, "/root/testdata/sf0.001")
    p = plan_of(ol)
    checks.append(
        (
            "outlier 3sigma: group moments broadcast back "
            "(BroadcastHashJoin; the event scan side has no Exchange "
            "before the flag filter)",
            "BroadcastHashJoin" in p,
        )
    )

    # ---- trend slope: one user_id shuffle, min-ts rides broadcast ---
    import re as _re2

    ts_df = qmod.QUERIES["trend_slope"](spark, "/root/testdata/sf0.001")
    p = plan_of(ts_df)
    sections.append(
        (
            "Trend slope (integer OLS: one user agg, scalar broadcast)",
            p,
            [
                "The corpus-min timestamp is a 1-row BroadcastExchange; the "
                "events side shuffles exactly once, on user_id, for the agg "
                "that carries all five OLS sums in one pass.",
            ],
        )
    )
    user_ex = len(
        [ln for ln in p.splitlines() if "hashpartitioning(user_id" in ln]
    )
    other_hash_ex = len(
        [
            ln
            for ln in p.splitlines()
            if "Arguments: hashpartitioning" in ln
            and "hashpartitioning(user_id" not in ln
        ]
    )
    checks.append(
        (
            "trend_slope: exactly one user_id shuffle (the only non-scalar "
            "exchange), min-ts broadcast",
            user_ex == 1 and other_hash_ex == 0 and "BroadcastExchange" in p,
        )
    )

    # ---- drift monitor: one word agg + distributed top-k ------------
    # The totals side references the word-agg subtree a second time;
    # the static plan shows two identical exchanges, and AQE's
    # exchange-reuse collapses them at runtime — so this check runs
    # the query and audits the FINAL adaptive plan for the
    # ReusedExchange (one corpus scan+explode, not two).
    dr = qmod.QUERIES["drift_l1"](spark, "/root/testdata/sf0.001")
    dr.collect()
    p = plan_of(dr)
    sections.append(
        (
            "Drift monitor (conditional aggs in one pass, top-k not a sort; "
            "final adaptive plan after execution)",
            p,
            [
                "Both slice counts are conditional aggregates over ONE "
                "word-keyed shuffle; the slice-totals side REUSES that "
                "shuffle (ReusedExchange in the final plan — the corpus is "
                "scanned and exploded once), totals come back as a 1-row "
                "broadcast, and the final top-30 is TakeOrderedAndProject — "
                "per-partition partial top-k, no global sort of the "
                "vocabulary.",
            ],
        )
    )
    checks.append(
        (
            "drift_l1: totals reuse the word-agg shuffle (ReusedExchange) "
            "+ TakeOrderedAndProject top-k",
            "isFinalPlan=true" in p
            and "ReusedExchange" in p
            and "TakeOrderedAndProject" in p,
        )
    )

    # ---- edit-distance verify: candidate joins only, no product -----
    ed = qmod.QUERIES["edit_dist_verify"](spark, "/root/testdata/sf0.001")
    p = plan_of(ed)
    sections.append(
        (
            "Edit-distance verification (DP only on banded candidates)",
            p,
            [
                "The O(len²) Levenshtein DP runs strictly on the banded "
                "candidate pairs — every join in the plan is an equi-join "
                "(band bucket, then doc_id to fetch each side's capped "
                "text); no cartesian/BroadcastNestedLoop node anywhere.",
            ],
        )
    )
    checks.append(
        (
            "edit_dist_verify: no cartesian product in the plan",
            len(_re2.findall(r"^\(\d+\) CartesianProduct", p, _re2.M)) == 0
            and len(_re2.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, _re2.M))
            == 0,
        )
    )

    # ---- prefix-filtered exact Jaccard: equi-joins only -------------
    pj = qmod.QUERIES["prefix_jaccard_pairs"](spark, "/root/testdata/sf0.001")
    p = plan_of(pj)
    sections.append(
        (
            "Prefix-filtered exact set-similarity join (AllPairs/PPJoin)",
            p,
            [
                "The candidate space comes from an equi-join on df-ascending "
                "PREFIX tokens only (p = |s| − ceil(tau·|s|) + 1 rarest "
                "tokens per doc), and verification is one array_intersect "
                "per candidate over per-doc sorted token arrays — every "
                "join node is a hash equi-join; no CartesianProduct, no "
                "BroadcastNestedLoopJoin. That is what bounds candidate "
                "volume by sum_t(prefix_df(t)²) instead of |docs|².",
            ],
        )
    )
    checks.append(
        (
            "prefix_jaccard_pairs: candidate generation is equi-join only "
            "(no cartesian/BNL node)",
            len(_re2.findall(r"^\(\d+\) CartesianProduct", p, _re2.M)) == 0
            and len(_re2.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, _re2.M))
            == 0,
        )
    )

    # ---- boilerplate strip: bp set joins back as broadcast ----------
    bl = qmod.QUERIES["boilerplate_lines"](spark, "/root/testdata/sf0.001")
    p = plan_of(bl)
    sections.append(
        (
            "Boilerplate-line strip (corpus line-frequency → broadcast "
            "filter join)",
            p,
            [
                "The line doc-frequency agg shuffles on line content ONCE; "
                "only the tiny HAVING-filtered boilerplate subset joins "
                "back, as a BroadcastHashJoin — the corpus never shuffles "
                "on line content a second time, then reassembles on one "
                "doc_id exchange.",
            ],
        )
    )
    checks.append(
        (
            "boilerplate: bp-set joinback is broadcast (no second "
            "content shuffle), no cartesian",
            "BroadcastHashJoin" in p and "CartesianProduct" not in p,
        )
    )

    # ---- word-rank fluency / dsir: score tables broadcast -----------
    for _nm in ("word_rank_fluency", "dsir_importance"):
        p = plan_of(qmod.QUERIES[_nm](spark, "/root/testdata/sf0.001"))
        checks.append(
            (
                f"{_nm}: per-feature score table joins the token stream "
                "as a BroadcastHashJoin (corpus shuffles only on doc_id)",
                "BroadcastHashJoin" in p and "CartesianProduct" not in p,
            )
        )

    # ---- CMS: sketch is a fixed-size partial-aggregated groupBy -----
    cm = qmod.QUERIES["cms_heavy_hitters"](spark, "/root/testdata/sf0.001")
    p = plan_of(cm)
    import re as _re3

    checks.append(
        (
            "cms: sketch cells built with map-side partial aggregation "
            "(HashAggregate pairs) and probed via broadcast, no cartesian",
            len(_re3.findall(r"^\(\d+\) HashAggregate", p, _re3.M)) >= 4
            and "BroadcastHashJoin" in p
            and "CartesianProduct" not in p,
        )
    )

    # ---- zorder: pure window/agg pipeline, no join at all -----------
    zo = qmod.QUERIES["zorder_layout"](spark, "/root/testdata/sf0.001")
    p = plan_of(zo)
    checks.append(
        (
            "zorder layout: join-free plan (windows + union + agg only)",
            "Join" not in p and "CartesianProduct" not in p,
        )
    )

    # ---- salted replication join: (k, salt) spreads the hot key -----
    sj = qmod.QUERIES["skew_salted_join"](spark, "/root/testdata/sf0.001")
    p = plan_of(sj)
    sections.append(
        (
            "Salted replication join (hot key spread over 16 reducers)",
            p,
            [
                "The fact side carries salt = event_id % 16 and the dim "
                "side is replicated 16x, so the join key is (k, salt) — "
                "the planted hot key's rows land on 16 reducers instead "
                "of one. The join is hinted shuffle_hash (broadcast would "
                "hide the skew problem; j5 covers the broadcast case).",
            ],
        )
    )
    checks.append(
        (
            "salted join: shuffled join keyed on (k, salt), not broadcast",
            "ShuffledHashJoin" in p
            and "hashpartitioning(k" in p
            and "salt" in p.split("hashpartitioning(k", 1)[1].splitlines()[0],
        )
    )

    # ---- mixture weights: totals ride a 1-row broadcast -------------
    mw = qmod.QUERIES["mixture_weights"](spark, "/root/testdata/sf0.001")
    p = plan_of(mw)
    checks.append(
        (
            "mixture weights: corpus totals join as a broadcast "
            "(metadata-sized job)",
            "Broadcast" in p,
        )
    )

    # ---- weighted sample: one lang exchange, join-free --------------
    wsm = qmod.QUERIES["weighted_sample"](spark, "/root/testdata/sf0.001")
    p = plan_of(wsm)
    checks.append(
        (
            "weighted sample: join-free, exactly one lang exchange "
            "(priority is a pure column expression)",
            "Join" not in p
            and len(
                [
                    ln
                    for ln in p.splitlines()
                    if "hashpartitioning(lang" in ln
                ]
            )
            == 1,
        )
    )

    # ---- schema evolution: merged scan surfaces the evolved column --
    se = qmod.QUERIES["schema_evolution_read"](spark, "/root/testdata/sf0.001")
    p = plan_of(se)
    checks.append(
        (
            "schema evolution: merged scan carries the evolved column "
            "and the batch partition column",
            "quality" in p and "batch" in p,
        )
    )

    # ---- session-7 transcript analytics: turn-scale work costs one
    # conv_id shuffle; everything after runs on tiny aggregates ------
    from xtract import structure as _st

    def _nex(plan: str) -> int:
        return len(
            [
                ln
                for ln in plan.splitlines()
                if ln.strip().startswith("(") and ") Exchange" in ln
            ]
        )

    p = plan_of(_st.role_transitions(tr))
    checks.append(
        (
            "role transitions: join-free, one turn-scale exchange + one "
            "9-key agg exchange, partial agg before it",
            "Join" not in p and _nex(p) == 2 and p.count("HashAggregate") >= 2,
        )
    )
    p = plan_of(_st.context_budget(tr))
    checks.append(
        (
            "context budget: exactly ONE exchange (conv agg reuses the "
            "window's conv_id partitioning), join-free",
            _nex(p) == 1 and "Window" in p and "Join" not in p,
        )
    )
    sigs = _st.conv_signatures(tr)
    p = plan_of(sigs)
    checks.append(
        (
            "conv signatures: one conv_id exchange with map-side partial "
            "min-agg (distributive signature — no text concatenation)",
            _nex(p) == 1 and "partial" in p.lower(),
        )
    )
    p = plan_of(_st.conv_dedup_pairs(sigs))
    sections.append(
        (
            "Conversation-level minhash dedup (distributive signature → LSH band join)",
            p,
            [
                "The turn-scale subtree ends at a partial min() aggregation — "
                "signatures combine map-side, so the only shuffle of turn-sized "
                "data is the conv_id groupBy. The LSH band self-join is a pure "
                "(band, bkey) equi-join over the |convs|-row signature table: "
                "no CartesianProduct, no BroadcastNestedLoopJoin, and nothing "
                "downstream of the signature agg scales with turns.",
            ],
        )
    )
    checks.append(
        (
            "conv dedup band join is an equi-join (no cartesian/theta)",
            "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
        )
    )

    p = plan_of(_st.conv_windows(tr))
    checks.append(
        (
            "conv windows: secondary-sort fold (exactly ONE conv_id "
            "exchange -> within-partition Sort -> MapInPandas), join-free",
            "MapInPandas" in p
            and "Sort" in p
            and _nex(p) == 1
            and "Join" not in p,
        )
    )
    bpe = queries.QUERIES["bpe_merge_round"](spark, sf_dir)
    p = plan_of(bpe)
    checks.append(
        (
            "bpe merge round: corpus text feeds ONE word hash-agg with "
            "map-side partial; pair counting and top-k run on "
            "dictionary-scale rows (no join, no corpus-scale window)",
            "Join" not in p
            and p.count("HashAggregate") >= 4  # partial+final word & pair
            and "partial_count" in p,
        )
    )

    # ---- session-8: loss-mask spans, template dedup, BPE encode -----
    p = plan_of(_st.loss_mask(tr))
    checks.append(
        (
            "loss mask: exactly ONE conv_id exchange feeding the "
            "running-sum window, join-free, no Python",
            _nex(p) == 1
            and "Window" in p
            and "Join" not in p
            and "Python" not in p,
        )
    )
    p = plan_of(_st.turn_templates(tr))
    checks.append(
        (
            "turn templates: map-side partial agg on the 32-byte md5 key "
            "(template text never transits the shuffle), join-free",
            "partial" in p.lower()
            and "Join" not in p
            # the row entering the exchange carries tkey (md5), not
            # text; a plan with no Exchange at all (one-partition
            # input / AQE rewrite) records FAIL, not an IndexError
            and "Exchange" in p
            and "text" not in p.split("Exchange", 1)[1].splitlines()[0],
        )
    )
    p = plan_of(_st.window_supervision(tr))
    checks.append(
        (
            "window supervision: join-free fold composition — conv_id "
            "repartition + MapInPandas + one compact agg exchange "
            "keyed on the fold output, partial agg before it",
            _nex(p) == 2
            and "MapInPandas" in p
            and "Join" not in p
            and "partial" in p.lower()
            and "window_id" in p,
        )
    )
    p = plan_of(queries.QUERIES["bpe_encode"](spark, sf_dir))
    checks.append(
        (
            "bpe encode: ONE word hash-agg exchange; the 20-merge replace "
            "chain is pure codegen expressions (no UDF, no join)",
            _nex(p) == 1
            and "Join" not in p
            and "Python" not in p
            and "partial_count" in p,
        )
    )
    p = plan_of(queries.QUERIES["bpe_doc_tokens"](spark, sf_dir))
    checks.append(
        (
            "bpe doc tokens: vocab (word, n_tokens) map joins back "
            "BROADCAST — the corpus side never shuffles on the word key",
            "BroadcastHashJoin" in p and "SortMergeJoin" not in p,
        )
    )
    p = plan_of(queries.QUERIES["supplier_nation_revenue"](spark, sf_dir))
    checks.append(
        (
            "supplier star slice: both dims broadcast, fact never "
            "shuffles for the joins, partial agg before the final "
            "nation-key exchange",
            p.count("BroadcastHashJoin") >= 2
            and "SortMergeJoin" not in p
            and "partial" in p.lower(),
        )
    )

    # ---- parity sweep: digest-row join, oracle on executors ---------
    from xtract import parity as _parity

    p = plan_of(_parity.sweep(tr))
    sections.append(
        (
            "Distributed parity sweep (kernel digests ⋈ executor-side oracle digests)",
            p,
            [
                "The pure-Python oracle runs as MapInPandas on the executors — "
                "the reference-semantics pass scales with the cluster exactly "
                "like the kernel. Both sides reduce to per-turn md5 digests "
                "before the full-outer join, so the join moves 32-byte hex "
                "rows, never span text, and the report is a count agg: the "
                "north-rule equality metric costs one extra extraction pass "
                "at any corpus size.",
            ],
        )
    )
    checks.append(
        (
            "parity sweep: oracle runs via MapInPandas, digest join is an "
            "equi-join, digests aggregate before the join",
            "MapInPandas" in p
            and "CartesianProduct" not in p
            and "BroadcastNestedLoopJoin" not in p
            and "collect_list" in p,
        )
    )

    # ---- partitioned sink: partition pruning + column pruning -------
    import shutil as _shutil

    ppath = "/tmp/xtract_audit_partitioned"
    _shutil.rmtree(ppath, ignore_errors=True)
    (
        pipeline.extract(tr, mode="fused")
        .withColumn("pb", F.pmod(F.xxhash64("conv_id"), F.lit(16)).cast("int"))
        .write.partitionBy("pb")
        .parquet(ppath)
    )
    rd = (
        spark.read.parquet(ppath)
        .filter(F.col("pb") == 3)
        .select("conv_id", "turn_idx", "question_number")
    )
    p = plan_of(rd)
    sections.append(
        (
            "Partitioned span sink (hive-style pb=… directories)",
            p,
            [
                "A filter on the partition column compiles to PartitionFilters "
                "— Spark enumerates 1/16th of the directories and never opens "
                "the rest; ReadSchema carries only the 3 projected columns, so "
                "span_text (the wide column) never leaves the footer. Together "
                "these are the two pruning behaviors that make a 100-TB scan "
                "read terabytes, not the whole table.",
            ],
        )
    )
    pf_ok = "PartitionFilters" in p and "pb" in p.split("PartitionFilters", 1)[1].splitlines()[0]
    rs_line = p.split("ReadSchema", 1)[1].splitlines()[0] if "ReadSchema" in p else ""
    checks.append(
        (
            "partitioned sink: partition pruning + span_text pruned from scan",
            pf_ok and "span_text" not in rs_line,
        )
    )

    ok = all(v for _, v in checks)
    lines = [
        "# Physical plans — audit (generated by tools/explain_audit.py)",
        "",
        "Checks:",
        "",
    ]
    for name, v in checks:
        lines.append(f"- {'✅' if v else '❌'} {name}")
    for title, plan, notes in sections:
        lines.append(f"\n## {title}\n")
        for n in notes:
            lines.append(f"- {n}")
        lines.append("\n```\n" + plan.strip() + "\n```")
    os.makedirs("docs", exist_ok=True)
    open("docs/PLANS.md", "w").write("\n".join(lines) + "\n")
    print("\n".join(f"{'PASS' if v else 'FAIL'} {k}" for k, v in checks))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
