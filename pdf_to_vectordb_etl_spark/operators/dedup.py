"""Deduplication operators for large-scale corpus curation.

Beyond-reference capability (BASELINE.json north star): the reference
processes hundreds of questions; a 100 TB training-data pipeline needs
near-duplicate removal as a first-class relational operator. Five
strategies, all shuffle-conscious:

- exact:        one hash-groupBy on a digest — the only full shuffle.
- ngram Jaccard: shingle -> inverted-index equi-join -> per-pair counts;
                 only docs *sharing a shingle* ever meet (no n^2 pairs).
- MinHash+LSH:  shingle minhash signatures banded into buckets; the
                 candidate join is an equi-join on (band, bucket-hash).
- SimHash:      64-bit signature; duplicates = equal signatures (or
                 Hamming<=r via rotations) — again an equi-join.
- embedding:    cosine >= threshold over an embedding column; LSH-
                 bucketed variant shares topk.lsh_signature.

All hashing is deterministic (xxhash64 / crc32 built-ins) — re-runs and
retries of a 1000-executor job produce identical clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vector import cosine_similarity


def normalize_text(text, *, lower: bool = True) -> "F.Column":
    """Canonical form for dedup: trim, collapse whitespace, optional lower."""
    t = F.regexp_replace(F.trim(text), r"\s+", " ")
    return F.lower(t) if lower else t


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: group by content digest, keep the min-id canonical
    row, report group size. Hashing first keeps the shuffle narrow
    (32-byte digest instead of document bodies on the wire)."""
    digest = F.sha2(normalize_text(F.col(text_col)), 256)
    return (
        df.select(F.col(id_col), digest.alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min id) per identical normalized text."""
    digest = F.sha2(normalize_text(F.col(text_col)), 256)
    w = Window.partitionBy("_digest").orderBy(id_col)
    return (
        df.withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_digest", "_rn")
    )


def word_shingles(text, n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles of a text column (native: split +
    transform over positions; no UDF)."""
    words = F.split(normalize_text(text), " ")
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), count)
    shingle = lambda i: F.array_join(F.slice(words, i, n), " ")  # noqa: E731
    return F.array_distinct(F.when(count > 0, F.transform(idx, shingle)).otherwise(F.array()))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard similarity.

    Inverted-index plan: explode shingles -> self-equi-join on shingle
    (docs sharing no shingle never pair) -> count common -> Jaccard from
    the per-doc distinct-shingle counts. Shuffles on shingle then on
    (a, b): both keys high-cardinality. Emits (id_a < id_b, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        F.size(word_shingles(F.col(text_col), n)).alias("n_sh"),
    )
    left = sh.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("na"), "shingle"
    )
    right = sh.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    common = (
        left.join(right, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- MinHash/LSH

def minhash_signature(shingles, n_hashes: int = 32) -> "F.Column":
    """MinHash signature: for permutation i, min over shingles of
    xxhash64(shingle, seed=i). Native higher-order funcs, one pass."""
    mins = [
        F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))
        )
        for i in range(n_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: split the signature into ``bands`` rows of
    ``n_hashes/bands``, hash each band, equi-join on (band, band_hash).
    Probability a pair with Jaccard j collides: 1-(1-j^r)^b."""
    rows = n_hashes // bands
    sig = minhash_signature(word_shingles(F.col(text_col), shingle_n), n_hashes)
    banded = df.select(F.col(id_col).alias("id"), sig.alias("sig")).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash LSH candidates verified by exact Jaccard on shingle sets.

    The verify join re-reads only candidate docs (semi-join pushdown),
    so the expensive exact computation touches O(candidates), not O(n^2).
    """
    cands = minhash_lsh_candidates(
        df, n_hashes, bands, shingle_n, text_col, id_col
    )
    sets_df = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sets_df.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------- SimHash

def simhash64(text, shingle_n: int = 2) -> "F.Column":
    """64-bit SimHash over word shingles, fully native.

    For each bit position, sum +1/-1 votes of each shingle's xxhash64
    bit; the signature's bit = sign of the vote. Near-dup texts differ
    in few bits.
    """
    sh = word_shingles(text, shingle_n)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    one = F.lit(1).cast("long")
    bit_votes = [
        F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    sig = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        sig = sig + F.when(v > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 2
) -> DataFrame:
    """Docs sharing an identical SimHash signature (Hamming distance 0
    buckets; for radius r, join on r+1 signature segments instead)."""
    sig = simhash64(F.col(text_col), shingle_n)
    return (
        df.select(F.col(id_col), sig.alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------- embedding near-dup

def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Pairs of rows whose embeddings' cosine similarity >= threshold.

    Exact mode: self-join (quadratic — correctness baseline / small
    partitions). LSH mode: prune with random-hyperplane buckets first
    (the scale path; same signature as topk.lsh_signature).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        from .topk import lsh_signature, random_hyperplanes

        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = random_hyperplanes(dim, n_planes)
        a = a.withColumn("_sig", lsh_signature("va", planes))
        b = b.withColumn("_sig", lsh_signature("vb", planes))
        pairs = a.join(b, "_sig").drop("_sig")
    else:
        pairs = a.crossJoin(b)
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
