"""Distributed connected components: large-star / small-star.

The alternating star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14 — public algorithm) converges in
O(log n) rounds regardless of component diameter, unlike min-label
propagation whose round count is the component DIAMETER (a chain of
10^6 near-dup pages needs 10^6 propagation rounds but ~20 star
rounds). Each round is two shuffle-by-node aggregations — the shape
that survives a 100× scale-up.

Round hygiene for iterative Spark jobs (the part naive loops get
wrong at scale):

- every round's edge set is ``localCheckpoint(eager=True)``-ed, so
  plan lineage stays one scan deep instead of growing by two
  joins/round (lineage growth eventually stalls the driver's
  optimizer and breaks task serialization);
- the PREVIOUS round's checkpointed RDD is explicitly unpersisted as
  soon as the next round is materialized, so executor storage holds at
  most two generations at any time (asserted in tests/test_cc.py via
  ``getPersistentRDDs``);
- convergence is detected with one tiny agg per round (count +
  order-insensitive hash-sum) on the already-materialized result — no
  re-execution of the round's plan.

Semantics: input is an undirected edge list (any orientation, dups
fine); output maps every non-isolated node to its component minimum.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _sym(edges: DataFrame) -> DataFrame:
    """Both orientations of every edge, self-loops dropped."""
    e = edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) symmetric → connect every LARGER neighbor of u to
    m(u) = min(N(u) ∪ {u}). One groupBy(u) + one equi-join back."""
    sym = _sym(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    # no distinct here: small-star's orient+distinct dedups the round's
    # output anyway, and duplicate edges don't change any min — one
    # fewer shuffle per round
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge (larger → smaller); connect every smaller
    neighbor AND the center to the minimum smaller neighbor."""
    ori = (
        edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = ori.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        ori.join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )
    center = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return nbr.union(center).where(F.col("a") != F.col("b")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # modular hash-sum: order-insensitive, ANSI-overflow-safe
        # (count * 1e9 stays far under 2^63)
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1_000_000_007))), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _persistent_ids(sc) -> set[int]:
    jmap = sc._jsc.getPersistentRDDs()  # noqa: SLF001 — storage audit
    ids: set[int] = set()
    it = jmap.keySet().iterator()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _unpersist_ids(sc, ids: set[int]) -> None:
    jmap = sc._jsc.getPersistentRDDs()  # noqa: SLF001
    it = jmap.entrySet().iterator()
    while it.hasNext():
        e = it.next()
        if e.getKey() in ids:
            e.getValue().unpersist()


def connected_components(
    edges: DataFrame, max_rounds: int = 50, steps_per_checkpoint: int = 1
) -> tuple[DataFrame, int]:
    """Undirected edge list (a, b) → ((node, rep), rounds) where rep is
    the component minimum. Isolated nodes (no edges) don't appear —
    callers treat absence as a singleton.

    ``steps_per_checkpoint`` fuses that many star rounds into each
    materialization (checkpoint + checksum paid once per group;
    convergence detection is unaffected — a converged star forest is a
    fixpoint of the large/small-star pair, so the checksum still
    stabilizes exactly at convergence). MEASURED at sf0.1/local[32]
    (171k edges, 4 rounds to converge): spc=1 → 7.0 s, spc=2 → 8.8 s,
    spc=3 → 40 s. Fusing is a net LOSS: the deeper unmaterialized plan
    (4-6 joins + distincts) defeats AQE's per-stage statistics and the
    detection granularity overshoots by up to spc-1 extra star rounds,
    which costs more than the ~2 s/round scheduling barrier it saves.
    Default stays 1; the knob remains for genuinely scheduler-bound
    deployments (thousands of tiny rounds on a busy cluster)."""
    if steps_per_checkpoint < 1:
        raise ValueError("steps_per_checkpoint must be >= 1")
    sc = edges.sparkSession.sparkContext
    before0 = _persistent_ids(sc)
    cur = (
        _sym(edges)
        .select(F.col("u").alias("a"), F.col("v").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # generation 0 participates in the rotation like every other
    # generation — otherwise the (largest) symmetric edge set stays
    # pinned in executor storage for the life of the application
    prev_added: set[int] = _persistent_ids(sc) - before0
    prev_sig = _checksum(cur)
    rounds = 0
    converged = False
    while rounds < max_rounds:
        before = _persistent_ids(sc)
        nxt = cur
        steps = min(steps_per_checkpoint, max_rounds - rounds)
        for _ in range(steps):
            nxt = _small_star(_large_star(nxt))
        nxt = nxt.localCheckpoint(eager=True)
        rounds += steps
        added = _persistent_ids(sc) - before
        sig = _checksum(nxt)
        # release generation n-1 now that n+1 is materialized
        _unpersist_ids(sc, prev_added)
        prev_added = added
        cur = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(f"star CC did not converge in {max_rounds} rounds")

    # fixpoint edge set is a forest of stars: (member → root). The
    # root itself carries no outgoing edge, so add it back from the
    # child side.
    labels = cur.select(F.col("a").alias("node"), F.col("b").alias("rep"))
    roots = labels.select(F.col("rep").alias("node"), F.col("rep")).distinct()
    out = labels.union(roots).distinct().localCheckpoint(eager=True)
    # release the final EDGE generation too — only the (much smaller)
    # per-node label set stays persisted for the caller's lazy reads,
    # honoring the bounded-storage contract across repeated calls
    _unpersist_ids(sc, prev_added)
    return out, rounds


def components_summary(edges: DataFrame) -> DataFrame:
    """(rep, members) for every non-singleton component."""
    labels, _ = connected_components(edges)
    return (
        labels.groupBy("rep")
        .agg(F.count("*").cast("long").alias("members"))
        .where(F.col("members") > 1)
    )
