"""Market-basket association-rule mining (support / confidence / lift).

Classic co-purchase analytics re-expressed as equi-joins: baskets
explode to distinct (basket, item) pairs once, pair supports come from
a self-join ON THE BASKET KEY (fan-out per basket is items²/2, bounded
by basket width — never quadratic in basket count), and the lift
denominator rides along as a broadcast 1-row total instead of a
driver-side count action, so the whole rule set is one lazy plan.
(Beyond-reference capability; no counterpart in the reference
pipeline.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.005,
) -> DataFrame:
    """A-priori-style one-hop rules ``ant → cons`` over an (already
    exploded) basket/item relation.

    ``min_support`` is a fraction of baskets; pairs below it are cut
    AFTER the pair aggregate (the aggregate itself is map-side
    combined, so the cut costs nothing extra).  Each surviving
    unordered pair emits both rule directions.  Item supports join
    back via broadcast (the item dimension is vocabulary-sized), and
    the basket total crossJoins as one row.

    Returns ``ant, cons, supp, confidence, lift`` — supp is the pair
    basket count; confidence = supp/supp(ant); lift = confidence /
    P(cons).
    """
    # items feeds FOUR consumers (total, item supports, both self-join
    # sides); materialize it once instead of re-running the
    # scan+distinct per consumer.  localCheckpoint (not persist): the
    # checkpointed blocks are released when the DataFrame is GC'd, so
    # repeated calls in a long-lived session don't accumulate cached
    # relations the caller never gets a handle to unpersist.
    items = baskets.select(
        F.col(basket_col).alias("_bid"), F.col(item_col).alias("_item")
    ).distinct().localCheckpoint(eager=True)
    total = items.agg(F.countDistinct("_bid").alias("_n_b"))
    supp_item = items.groupBy("_item").agg(F.count("*").alias("_s"))
    a = items.select("_bid", F.col("_item").alias("_ia"))
    b = items.select("_bid", F.col("_item").alias("_ib"))
    pair = (
        a.join(b, "_bid")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count("*").alias("_sab"))
    )
    directed = pair.select(
        F.col("_ia").alias("ant"), F.col("_ib").alias("cons"), "_sab"
    ).unionByName(
        pair.select(
            F.col("_ib").alias("ant"), F.col("_ia").alias("cons"), "_sab"
        )
    )
    enriched = (
        directed.join(
            F.broadcast(supp_item.select(F.col("_item").alias("ant"),
                                         F.col("_s").alias("_s_ant"))),
            "ant",
        )
        .join(
            F.broadcast(supp_item.select(F.col("_item").alias("cons"),
                                         F.col("_s").alias("_s_cons"))),
            "cons",
        )
        .crossJoin(F.broadcast(total))
    )
    return (
        enriched.filter(
            F.col("_sab") >= F.col("_n_b").cast("double") * F.lit(min_support)
        )
        .select(
            "ant",
            "cons",
            F.col("_sab").cast("long").alias("supp"),
            F.round(F.col("_sab") / F.col("_s_ant"), 6).alias("confidence"),
            F.round(
                (F.col("_sab").cast("double") * F.col("_n_b"))
                / (F.col("_s_ant").cast("double") * F.col("_s_cons")),
                6,
            ).alias("lift"),
        )
    )
