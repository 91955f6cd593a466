"""Graph analytics over edge-list DataFrames (beyond-reference).

Connected components already live in dedup (min-label propagation for
near-dup clusters); this module adds weighted PageRank — the classic
iterative-relational algorithm (Page et al. 1999, public) and the
standard quality/centrality signal when training corpora carry a link
structure (web crawls, citation sets, user-journey transition graphs).

Scale shape per iteration: one equi-join of the rank table onto the
edge list (both partitioned by src — the shuffle is reused across
iterations) + one hash agg by dst, exactly the distributed PageRank
formulation every large-scale engine uses. Work is O(|E|) per
iteration; nothing is ever collected except the 1-value dangling-mass
scalar (same lineage-truncation rationale as clustering.kmeans_fit's
k×dim collect). Each iteration's rank table is persisted so the plan
does not deepen exponentially; a production loop at 100 TB would swap
persist for checkpoint every ~10 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank with proper dangling-mass redistribution:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)·p(u,v) + dangling/N)

    where p(u,v) is the out-weight share of edge u→v and ``dangling``
    is the rank mass sitting on nodes with no out-edges. Fixed
    ``iterations`` (deterministic, external-oracle-replayable) rather
    than convergence-tested. Returns (node, rank rounded to 6).
    """
    agg_w = (
        F.sum(weight_col) if weight_col else F.count("*")
    )
    e = edges.groupBy(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).agg(agg_w.cast("double").alias("_w"))
    outw = e.groupBy("src").agg(F.sum("_w").alias("_ow"))
    probs = e.join(outw, "src").select(
        "src", "dst", (F.col("_w") / F.col("_ow")).alias("p")
    )
    probs = probs.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    has_out = probs.select("src").distinct()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        dang = (
            ranks.join(has_out, ranks["node"] == has_out["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        contrib = (
            ranks.join(probs, ranks["node"] == probs["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dang / n))
                ).alias("rank"),
            )
            .persist()
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def transition_edges(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple[str, ...] = ("tus", "event_id"),
) -> DataFrame:
    """Per-key consecutive-state transitions as a weighted edge list
    (src, dst, w) — the user-journey Markov graph. One lead() window
    per key + one hash agg; deterministic under the (time, id)
    tiebreak."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        events.withColumn("_nxt", F.lead(state_col).over(w))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(
            F.col(state_col).alias("src"), F.col("_nxt").alias("dst")
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
