"""Change-data-capture operators: snapshot reconciliation.

Complements aggregates.latest_per_key (changelog -> snapshot) with the
inverse direction: given two snapshots, derive the changelog. The
reference has no incremental semantics at all (it reprocesses whole
PDFs); at 100 TB, diffing snapshots is how incremental pipelines avoid
full recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots of the same table into a changelog: one row
    per key classified ``added`` / ``removed`` / ``changed`` (payload
    differs) — ``unchanged`` rows are dropped unless asked for.

    ONE full-outer shuffle join on the key; payloads are compared as
    null-safe structs so NULL fields are handled without per-column
    logic. The output is O(churn), not O(table): at 100 TB with 0.1%
    daily churn the changelog is 1000x smaller than either input —
    downstream stages consume that, never the snapshots.
    """
    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("_old")
    )
    n = new.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("_new")
    )
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("change_type", change)
    if not keep_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out.select(*key_cols, "change_type")


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE a CDC change batch (insert/update/delete ops) into a
    snapshot — the batch form of Delta/Iceberg ``MERGE INTO`` on an
    append-only changelog.

    Semantics: per key, the highest-``order_col`` row across
    (snapshot ∪ changes) wins; if the winner is a ``delete`` op the key
    disappears. Snapshot rows enter the union with a NULL op and a
    LONG_MIN-class order (any change beats them) — long, not double,
    so nanosecond-scale version counters keep exact total order
    (doubles lose integers past 2^53). ``order_col`` must be unique per
    key within the batch (make it so upstream: version counter, or
    time*shards+shard); ties would make max_by nondeterministic. ONE
    shuffle on the key via ``max_by`` partial aggregation — no window
    sorting all versions, same plan class as
    aggregates.latest_per_key, O(snapshot + batch).
    """
    payload = [c for c in snapshot.columns if c not in key_cols]
    s = snapshot.select(
        *key_cols,
        F.lit(None).cast("string").alias("_op"),
        F.lit(-(1 << 62)).cast("long").alias("_ord"),
        F.struct(*[F.col(c) for c in payload]).alias("_p"),
    )
    c = changes.select(
        *key_cols,
        F.col(op_col).cast("string").alias("_op"),
        F.col(order_col).cast("long").alias("_ord"),
        F.struct(*[F.col(p) for p in payload]).alias("_p"),
    )
    # atomic winner: one max_by of (op, payload) keyed on (_ord, _op) —
    # the contract still demands unique _ord per key, but if an
    # upstream violates it the snapshot degrades to a deterministic
    # whole-row winner instead of tearing op and payload from
    # different rows (same hardening as merge_changelog)
    won = (
        s.unionByName(c)
        .groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(F.col("_op"), F.col("_p")),
                F.struct(F.col("_ord"), F.col("_op")),
            ).alias("_w")
        )
        .filter(F.col("_w._op").isNull() | (F.col("_w._op") != delete_op))
    )
    return won.select(
        *key_cols, *[F.col(f"_w._p.{p}").alias(p) for p in payload]
    )


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    payload_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2: turn a changelog into validity
    intervals — one row per version per key with ``[valid_from,
    valid_to)`` bounds, ``valid_to`` NULL on the current version.

    One window per key (lead over the version order): a single shuffle
    on the key, linear per key, parallel across keys — the standard
    warehouse historization, and the inverse of
    :func:`aggregates.latest_per_key` (which keeps only the last
    interval). Consecutive versions with IDENTICAL payload are collapsed
    first (null-safe struct compare against lag), so storage is
    O(distinct versions), not O(events).

    ``tiebreak_cols`` extends the window ORDER BY (not the interval
    bounds) so two versions sharing an ``order_col`` value still sort
    deterministically — without it, lag/lead tie order is engine- and
    run-nondeterministic and equal-timestamp versions may collapse
    differently across runs.
    """
    from pyspark.sql import Window

    payload_cols = payload_cols or [
        c
        for c in changes.columns
        if c not in key_cols and c != order_col and c not in (tiebreak_cols or [])
    ]
    order_cols = [order_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    p = F.struct(*[F.col(c) for c in payload_cols])
    # drop no-op updates: payload identical to the previous version
    dedup = (
        changes.withColumn("_prev", F.lag(p).over(w))
        .filter(~p.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return dedup.select(
        *key_cols,
        *payload_cols,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w2).alias("valid_to"),
        F.lead(order_col).over(w2).isNull().alias("is_current"),
    )


def merge_changelog(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Tombstone-retaining changelog merge — the INCREMENTAL form of
    :func:`apply_changes`. Where apply_changes drops deleted keys
    outright (correct for one-shot MERGE), a micro-batched pipeline
    must KEEP the winning delete with its version: otherwise a
    lower-versioned upsert arriving in a later batch would resurrect a
    key the one-shot semantics say is dead (and symmetrically, a late
    low-versioned delete would kill a live key). Snapshot rows carry
    (_op, _ver) forward; the winner per key is max_by version across
    snapshot ∪ batch — associative, so ANY batch split of the same
    changelog converges to the identical snapshot. Read the live view
    with :func:`live_rows`."""
    payload = [
        c for c in changes.columns if c not in [*key_cols, op_col, order_col]
    ]
    c = changes.select(
        *key_cols,
        F.col(op_col).cast("string").alias("_op"),
        F.col(order_col).cast("long").alias("_ver"),
        F.struct(*[F.col(p) for p in payload]).alias("_p"),
    )
    if snapshot is not None:
        s = snapshot.select(
            *key_cols, "_op", "_ver",
            F.struct(*[F.col(p) for p in payload]).alias("_p"),
        )
        c = s.unionByName(c)
    # ONE max_by with an atomic (op, payload) value and a (ver, op)
    # ordering key: two independent max_by calls would tear op and
    # payload from DIFFERENT rows on a version tie (delete + re-insert
    # emitted with the same version), making batch splits diverge. The
    # op in the ordering key is the deterministic tiebreak: 'upsert'
    # sorts above 'delete', so a same-version delete+upsert pair always
    # resolves to the upsert, in every split.
    won = c.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(F.col("_op"), F.col("_p")),
            F.struct(F.col("_ver"), F.col("_op")),
        ).alias("_w"),
        F.max("_ver").alias("_ver"),
    )
    return won.select(
        *key_cols,
        *[F.col(f"_w._p.{p}").alias(p) for p in payload],
        F.col("_w._op").alias("_op"),
        "_ver",
    )


def live_rows(snapshot: DataFrame, delete_op: str = "delete") -> DataFrame:
    """The queryable view of a merge_changelog snapshot: tombstones
    filtered, bookkeeping columns dropped."""
    return snapshot.filter(F.col("_op") != delete_op).drop("_op", "_ver")


# ------------------------------------------------------- Merkle reconcile

def _h60_concat(cols: list[str]):
    """Portable 60-bit row hash over named columns: unit-separated
    concat (0x1f never occurs in the data's printable domain) through
    the repo's md5-60-bit construction (sketch._h60) — replayable in
    DuckDB via the same strpos nibble fold or ('0x'||hex) cast.

    NULLs get an explicit sentinel per column: concat_ws SKIPS null
    operands, so without it (k, 'b', NULL) and (k, NULL, 'b') would
    concat — and hash — identically, and a change that shifts a value
    across a NULL column would be invisible to the checksum (while
    snapshot_diff's null-safe compare reports it)."""
    from .sketch import _h60

    return _h60(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
                for c in cols
            ],
        )
    )


def merkle_summary(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    n_buckets: int = 4096,
) -> DataFrame:
    """Bucketed checksum summary for cheap snapshot reconciliation
    (the anti-entropy / Merkle-tree idea from replicated storage
    systems — Merkle 1987; Dynamo-class stores use it for replica
    sync; all public): each row hashes to one of ``n_buckets`` by its
    KEY, and the bucket's fingerprint is the XOR of portable 60-bit
    row hashes over key+payload, plus a row count.

    XOR is commutative/associative, so the whole summary is ONE
    partial-combinable aggregate — map-side combine leaves
    ``n_buckets`` rows per executor and the result is n_buckets rows
    total, whatever the table size. Comparing two 100 TB snapshots
    costs two scans + a join of two 4096-row tables; the row-level
    shuffle (`merkle_diff`) then touches ONLY the buckets whose
    fingerprints differ — O(churn-containing fraction), never
    O(table). snapshot_diff above is the one-shot full-shuffle
    alternative; this pair is the incremental-scale path.

    Hashes are the repo's portable md5-60-bit construction (same as
    sketch/sampling), so an external engine derives the identical
    summary — cross-system reconciliation is the whole point.
    """
    rowh = _h60_concat([*key_cols, *payload_cols])
    bucket = _h60_concat(key_cols) % n_buckets
    return (
        df.select(bucket.alias("bucket"), rowh.alias("_rh"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(_rh)").alias("checksum"),
        )
    )


def merkle_changed_buckets(
    summary_old: DataFrame, summary_new: DataFrame
) -> DataFrame:
    """Buckets whose (count, checksum) fingerprints disagree between
    two summaries — a full-outer join of two n_buckets-row tables
    (absent bucket == empty bucket). Returns (bucket)."""
    o = summary_old.select(
        "bucket",
        F.col("n_rows").alias("_no"),
        F.col("checksum").alias("_co"),
    )
    n = summary_new.select(
        "bucket",
        F.col("n_rows").alias("_nn"),
        F.col("checksum").alias("_cn"),
    )
    j = o.join(n, "bucket", "full_outer")
    differs = ~(
        F.coalesce(F.col("_no"), F.lit(0)).eqNullSafe(
            F.coalesce(F.col("_nn"), F.lit(0))
        )
        & F.coalesce(F.col("_co"), F.lit(0)).eqNullSafe(
            F.coalesce(F.col("_cn"), F.lit(0))
        )
    )
    return j.filter(differs).select("bucket")


def merkle_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    n_buckets: int = 4096,
) -> DataFrame:
    """Row-level changelog computed the anti-entropy way: summarize
    both snapshots (one agg each), find disagreeing buckets (tiny
    join), then run the full-outer row diff ONLY over rows hashing
    into those buckets (broadcast semi-join on the bucket id). Output
    contract matches snapshot_diff: (key..., change_type) — and
    equals it exactly, since unchanged buckets contain no changed
    rows (pinned in tests)."""
    changed = merkle_changed_buckets(
        merkle_summary(old, key_cols, payload_cols, n_buckets),
        merkle_summary(new, key_cols, payload_cols, n_buckets),
    )
    bucket = _h60_concat(key_cols) % n_buckets
    o = old.withColumn("_b", bucket).join(
        F.broadcast(changed), F.col("_b") == F.col("bucket"), "left_semi"
    )
    n = new.withColumn("_b", bucket).join(
        F.broadcast(changed), F.col("_b") == F.col("bucket"), "left_semi"
    )
    return snapshot_diff(
        o.drop("_b"), n.drop("_b"), key_cols, compare_cols=payload_cols
    )
