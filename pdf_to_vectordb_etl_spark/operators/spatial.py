"""Geospatial neighbor joins (beyond-reference).

Spark has no native spatial join; the standard scalable shape (used by
every geo extension, public knowledge) is grid binning: hash each
point to a lat/lon cell sized ≥ the search radius, equi-join each
point's cell against its 3×3 cell neighborhood, then verify exact
great-circle distance on the candidates. Cost is bounded by cell
occupancy (never all-pairs), the join key is a pair of small ints,
and AQE handles dense-city cell skew like any hot-key equi-join.

All expressions are codegen trig (`radians/sin/cos/asin/sqrt` exist in
Spark and DuckDB alike); distances round to 6 dp before any threshold
comparison so sub-ulp libm differences between engines cannot flip a
boundary pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine; spherical earth,
    R = 6371 km — the standard approximation, ≤ 0.5% vs ellipsoid)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def neighbor_pairs(
    points: DataFrame,
    radius_km: float,
    cell_deg: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All point pairs within ``radius_km`` (id_a < id_b, dist_km).

    ``cell_deg`` must be ≥ the radius in degrees at the highest
    |latitude| present (lon degrees shrink by cos(lat)); the guard is
    the caller's because the frame may be lazy. One side of the join
    explodes to its 3×3 cell neighborhood (9 small-int rows — the
    bounded fan-out), the other keeps its single cell; candidates
    verify with exact haversine rounded to 6 dp."""
    if radius_km <= 0 or cell_deg <= 0:
        raise ValueError("radius_km and cell_deg must be positive")
    cx = F.floor(F.col(lat_col) / cell_deg).cast("long")
    cy = F.floor(F.col(lon_col) / cell_deg).cast("long")
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    nbr_cells = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("cx") + dx).alias("nx"),
                    (F.col("cy") + dy).alias("ny"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        nbr_cells.alias("_c"),
    ).select("id_a", "lat_a", "lon_a", "_c.nx", "_c.ny")
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("nx"),
        F.col("cy").alias("ny"),
    )
    dist = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        6,
    )
    return (
        a.join(b, ["nx", "ny"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select("id_a", "id_b", "dist_km")
    )


def density_clusters(
    points: DataFrame,
    radius_km: float,
    cell_deg: float,
    min_neighbors: int = 2,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Density-based spatial clustering — the DBSCAN decomposition
    (Ester et al. 1996, public) with the order-dependence removed:
    CORE points have ≥ ``min_neighbors`` others within ``radius_km``;
    clusters are connected components of the core–core neighbor graph
    (cluster id = minimum core member, via star contraction — O(log²)
    rounds); BORDER points attach to the smallest cluster id among
    their core neighbors (classic DBSCAN assigns them to whichever
    cluster scans first — engine-nondeterministic; the min rule is
    deterministic and externally replayable); everything else is
    NOISE with a NULL cluster.

    Cost = one binned neighbor join (never all-pairs) + one degree
    agg + CC on the (much smaller) core subgraph. Returns
    (id, role ∈ core|border|noise, cluster_id nullable)."""
    from .graph import connected_components_star

    pairs = neighbor_pairs(
        points, radius_km, cell_deg, id_col, lat_col, lon_col
    ).persist()
    deg = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("_deg"))
    )
    core = deg.filter(F.col("_deg") >= min_neighbors).select("id").persist()
    cc_edges = (
        pairs.join(core.select(F.col("id").alias("id_a")), "id_a", "left_semi")
        .join(core.select(F.col("id").alias("id_b")), "id_b", "left_semi")
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    labels = connected_components_star(cc_edges)
    # isolated cores (no core neighbor) form singleton clusters
    lone_core = core.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("cluster_id")
    )
    core_lbl = labels.unionByName(lone_core).persist()
    half = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr")
    ).unionByName(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr"))
    )
    border = (
        half.join(core.select(F.col("id").alias("nbr")), "nbr", "left_semi")
        .join(core, "id", "left_anti")
        .join(
            core_lbl.select(
                F.col("id").alias("nbr"), F.col("cluster_id")
            ),
            "nbr",
        )
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    all_ids = points.select(F.col(id_col).alias("id"))
    out = (
        all_ids.join(
            core_lbl.withColumn("role", F.lit("core")), "id", "left"
        )
        .join(
            border.select(
                "id", F.col("cluster_id").alias("_bc")
            ).withColumn("_brole", F.lit("border")),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce(F.col("role"), F.col("_brole"), F.lit("noise")).alias(
                "role"
            ),
            F.coalesce(F.col("cluster_id"), F.col("_bc")).alias("cluster_id"),
        )
    )
    out = out.persist()
    out.count()  # settle before freeing the inputs it reads
    for df_ in (pairs, core, core_lbl, labels):
        if df_.is_cached:
            df_.unpersist()
    return out


def skyline_2d(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
) -> DataFrame:
    """2-D skyline (Pareto frontier, Börzsönyi et al. ICDE 2001
    "The Skyline Operator"): keep the rows no other row strictly
    dominates, where both ``x`` and ``y`` are minimized (pass a
    negated column to maximize a criterion).  A row is dominated iff
    another row is <= on both axes and < on at least one; ties on both
    axes survive together.

    Distributed shape — the sorted-scan formulation, not the O(n^2)
    dominance self-join: (1) one hash agg reduces the corpus to the
    per-x minimum of y (anything above its x-group minimum is already
    dominated); (2) the distinct-x table is range-partitioned on x and
    each partition computes its exclusive running minimum in parallel
    (Window keyed on spark_partition_id — the global_dense_rank
    contract, never a single-partition sort); (3) one bounded collect
    of per-partition minima (one row per shuffle partition) builds the
    broadcast prefix-min map, so a point survives iff its y is
    strictly below every y at strictly smaller x; (4) one equi-join on
    (x, y) restores the surviving original rows with all their
    columns.  Shuffle payload is the distinct-x table, never the
    corpus; driver state is one scalar per partition.

    Returns ``df`` filtered to its skyline rows (original schema)."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    d2 = df.withColumn("_sky_x", xc).withColumn("_sky_y", yc)
    ytype = d2.schema["_sky_y"].dataType
    xmins = d2.groupBy("_sky_x").agg(F.min("_sky_y").alias("_ymin"))
    # size-aware range exchange (r11): no explicit partition count —
    # AQE coalesces the distinct-x table to its data volume instead of
    # fanning a kilobyte intermediate out to one task per core (the
    # c8-beats-c32 finding on the rank primitives; same fix class).
    ranged = (
        xmins.repartitionByRange("_sky_x")
        .select("_sky_x", "_ymin", F.spark_partition_id().alias("_pid"))
        .localCheckpoint(eager=True)
    )
    sizes = (
        ranged.groupBy("_pid")
        .agg(F.min("_ymin").alias("_m"))
        .orderBy("_pid")
        .collect()
    )
    if not sizes:
        return df.limit(0)
    running, entries = None, []
    for r in sizes:
        if running is not None:
            entries += [F.lit(r["_pid"]), F.lit(running).cast(ytype)]
        m = r["_m"]
        if m is not None and (running is None or m < running):
            running = m
    if entries:
        prior = F.create_map(*entries)[F.col("_pid")]
    else:
        prior = F.lit(None).cast(ytype)
    w = (
        Window.partitionBy("_pid")
        .orderBy("_sky_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # least() skips NULLs (no preceding row / no prior partition), so
    # a missing bound never disqualifies the row
    best_before = F.least(prior, F.min("_ymin").over(w))
    frontier = ranged.withColumn("_bb", best_before).filter(
        F.col("_bb").isNull() | (F.col("_ymin") < F.col("_bb"))
    )
    out = d2.join(
        frontier.select(
            "_sky_x", F.col("_ymin").alias("_sky_y")
        ),
        ["_sky_x", "_sky_y"],
    )
    return out.drop("_sky_x", "_sky_y")
