"""Skew handling: mega-conversations (gen mega_every) flow through
extraction and salted aggregation with identical results to the
unsalted formulation."""
import pyspark.sql.functions as F
import pytest

from xtract import gen, pipeline, skew


@pytest.fixture(scope="module")
def mega(spark):
    # conv 0 and 3 become ~100x mega-conversations
    df = gen.transcripts(spark, 6, mega_every=3).cache()
    df.count()
    yield df
    df.unpersist()


def test_mega_conversations_exist(mega):
    counts = {r.conv_id: r.c for r in mega.groupBy("conv_id").agg(F.count("*").alias("c")).collect()}
    big = [c for c in counts.values() if c >= 300]
    small = [c for c in counts.values() if c < 50]
    assert big and small


def test_extraction_unaffected_by_skew(spark, mega):
    """Fused extraction over skewed input matches the oracle (sampled
    turns) — the plan has no conv_id-keyed operation to skew."""
    from xtract import oracle

    spans = pipeline.extract(mega, mode="fused")
    got = {
        (r.conv_id, r.turn_idx, r.seq): r.span_text
        for r in spans.filter(F.col("turn_idx") < 5).collect()
    }
    for conv_ord in range(6):
        conv_id = f"conv{conv_ord:08d}"
        for t in range(min(5, gen.n_turns_for(conv_ord, 3))):
            text = gen.turn_row(conv_id, t, conv_ord)["text"]
            for seq, row in enumerate(oracle.extract_turn(text)):
                assert got[(conv_id, t, seq)] == row["span_text"]


def test_salted_agg_matches_direct(spark, mega):
    direct = {
        (r.conv_id): (r.turns, r.tools)
        for r in mega.groupBy("conv_id")
        .agg(
            F.count("*").alias("turns"),
            F.size(F.array_distinct(F.collect_list("tool"))).alias("tools"),
        )
        .collect()
    }
    salted = {
        (r.conv_id): (r.turns, r.tools)
        for r in skew.salted_agg(
            mega,
            [
                (F.count("*"), "turns", F.sum("turns").cast("long")),
                (
                    F.collect_set("tool"),
                    "tools",
                    F.size(F.array_distinct(F.flatten(F.collect_list("tools")))),
                ),
            ],
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_repartition_spreads_heavy(spark, mega):
    rep = skew.salted_repartition(mega, 12, n_salts=8, threshold_turns=300)
    # heavy convs get >1 distinct salt; light convs exactly 1
    salts = {
        r.conv_id: r.s
        for r in rep.groupBy("conv_id")
        .agg(F.countDistinct("salt").alias("s"))
        .collect()
    }
    counts = {
        r.conv_id: r.c
        for r in mega.groupBy("conv_id").agg(F.count("*").alias("c")).collect()
    }
    for conv, s in salts.items():
        if counts[conv] >= 300:
            assert s > 1, conv
        else:
            assert s == 1, conv
    # row preservation
    assert rep.count() == mega.count()
