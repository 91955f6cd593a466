"""Distributed probabilistic sketches (beyond-reference).

Bloom filter (Bloom 1970) and Count-Min sketch (Cormode & Muthukrishnan
2005) built as plain aggregates over hashed positions — the two
workhorses of large-scale ingest pipelines (membership pre-screens
before expensive dedup joins; frequency estimates without a full
vocabulary shuffle).

Both use the repo's portable 60-bit md5 hash (same construction as
dedup.simhash portable mode: top 15 hex chars of md5, base-16 folded)
so an external engine replays every bit of the sketch — no JVM-only
hash in the signature path.

Scale shape: a sketch IS a partial-combinable aggregate — each
partition ORs its local bitset / sums its local counters, and the merge
is associative. The materialized sketch is constant-size (m_bits/32
longs; depth x width counters), so probing broadcast-joins it against
any stream for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_BITS = 32  # 32-bit words: exactly representable in DOUBLE, so
# oracle replays and non-JVM consumers reproduce the packing bit-for-bit


def _h60(c: Column) -> Column:
    """Portable 60-bit hash: top 15 hex chars of md5, as a long."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _pos(elem: Column, i: int, modulus: int) -> Column:
    """i-th hash position in [0, modulus): salted portable hash."""
    return _h60(F.concat(F.lit(f"{i}:"), elem)) % modulus


def bloom_build(
    df: DataFrame,
    elem_col: str,
    m_bits: int = 16384,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom bitset over ``elem_col``: k salted positions per
    element, OR-ed into m_bits/32 packed words via one hash agg on
    word index (partial bit_or per partition, associative merge).
    Returns (word_idx, bits) — at most m_bits/32 rows, broadcastable
    anywhere."""
    elem = F.col(elem_col)
    poss = F.array(*[_pos(elem, i, m_bits) for i in range(k)])
    return (
        df.select(F.explode(poss).alias("p"))
        .select(
            (F.col("p") / WORD_BITS).cast("int").alias("word_idx"),
            F.pow(F.lit(2.0), F.col("p") % WORD_BITS).cast("long").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    elem_col: str,
    id_col: str,
    m_bits: int = 16384,
    k: int = 4,
) -> DataFrame:
    """Membership probe: an element is a MAYBE only if all k bits are
    set (no false negatives by construction). The probe stream explodes
    to k rows, broadcast-joins the constant-size bitset on word index,
    and re-aggregates with bool_and — one narrow pass over the stream,
    zero shuffles of the sketch. Returns (id, bloom_hit)."""
    elem = F.col(elem_col)
    poss = F.array(*[_pos(elem, i, m_bits) for i in range(k)])
    probes = df.select(F.col(id_col), F.explode(poss).alias("p")).select(
        id_col,
        (F.col("p") / WORD_BITS).cast("int").alias("word_idx"),
        F.pow(F.lit(2.0), F.col("p") % WORD_BITS).cast("long").alias("m"),
    )
    joined = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) != 0
        ).alias("hit"),
    )
    return joined.groupBy(id_col).agg(F.min("hit").alias("bloom_hit"))


def countmin_build(
    df: DataFrame,
    elem_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch: depth salted hash rows of ``width`` counters;
    one hash agg on (row, position) — partial counts combine
    associatively. Returns (row, pos, n): at most depth*width rows."""
    elem = F.col(elem_col)
    rows = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _pos(elem, i, width).alias("pos"))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("e"))
        .select("e.row", "e.pos")
        .groupBy("row", "pos")
        .agg(F.count("*").alias("n"))
    )


def countmin_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    elem_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates: min over the depth counters each
    element hashes to (never underestimates). Sketch is broadcast;
    probe stream explodes to depth rows and re-aggregates. Returns
    (elem, est_n)."""
    elem = F.col(elem_col)
    rows = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _pos(elem, i, width).alias("pos"))
            for i in range(depth)
        ]
    )
    ex = probes.select(elem.alias("elem"), F.explode(rows).alias("e")).select(
        "elem", "e.row", "e.pos"
    )
    return (
        ex.join(F.broadcast(sketch), ["row", "pos"], "left")
        .select("elem", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .groupBy("elem")
        .agg(F.min("n").alias("est_n"))
    )
