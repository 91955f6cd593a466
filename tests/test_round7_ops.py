"""Round-7 operator pins: T30 streaming Bloom dedup (multi-batch) and
the collapse-exact graded-minhash invariants not covered by the oracle
gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import load


def test_t30_multibatch_admits_exactly_the_batch_digest_set(spark, sf_dir):
    """Three micro-batches (3 files, maxFilesPerTrigger=1): the admitted
    DIGEST set must equal the batch twin's — each unseen digest admitted
    exactly once, across batch boundaries (the persisted _digests table
    is the cross-batch memory). Row ids can differ from the batch twin
    when a later batch carries a smaller id for an already-admitted
    digest, so the pin is on digests — the admit decision itself."""
    from pdf_to_vectordb_etl_spark.operators import dedup
    from pdf_to_vectordb_etl_spark.streaming.pipeline import (
        stream_bloom_dedup_ingest,
    )

    docs = load(spark, sf_dir, "documents").limit(300)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    corpus, new = docs.filter(h < "8"), docs.filter(h >= "8")
    corpus_digests = dedup.content_digests(corpus)

    src = tempfile.mkdtemp(prefix="t30src")
    new.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = tempfile.mkdtemp(prefix="t30out")
    q = stream_bloom_dedup_ingest(
        stream, corpus_digests, out, tempfile.mkdtemp(prefix="t30ck")
    )
    q.awaitTermination(300)
    assert q.lastProgress["batchId"] >= 2, "expected >= 3 micro-batches"

    got = spark.read.parquet(f"{out}/data")
    got_digests = sorted(
        r.digest for r in dedup.content_digests(got).select("digest").collect()
    )
    want = dedup.incremental_exact_dedup(new, corpus_digests)
    want_digests = sorted(
        r.digest
        for r in dedup.content_digests(want).select("digest").collect()
    )
    assert got_digests == want_digests and len(got_digests) > 0
    # exactly-once per digest: no digest admitted twice across batches
    assert len(got_digests) == len(set(got_digests)) == got.count()


def test_t30_second_run_admits_nothing_new(spark, sf_dir):
    """Replaying the SAME stream into the same out dir (fresh
    checkpoint, so batches re-fire) must admit zero rows — the
    persisted digest table makes re-ingest idempotent at the digest
    level."""
    from pdf_to_vectordb_etl_spark.operators import dedup
    from pdf_to_vectordb_etl_spark.streaming.pipeline import (
        stream_bloom_dedup_ingest,
    )

    docs = load(spark, sf_dir, "documents").limit(120)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    corpus_digests = dedup.content_digests(docs.filter(h < "8"))
    new = docs.filter(h >= "8")

    src = tempfile.mkdtemp(prefix="t30src2")
    new.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = tempfile.mkdtemp(prefix="t30out2")

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = stream_bloom_dedup_ingest(
            stream, corpus_digests, out, tempfile.mkdtemp(prefix="t30ck2")
        )
        q.awaitTermination(300)

    run()
    n1 = spark.read.parquet(f"{out}/data").count()
    run()
    n2 = spark.read.parquet(f"{out}/data").count()
    assert n1 > 0 and n2 == n1


def test_fleiss_kappa_hand_fixture(spark):
    """Every item rated a,a,a,b,b: P_i = (9+4-5)/20 = 0.4 exactly,
    P_e = 0.6^2+0.4^2 = 0.52, kappa = -0.12/0.48 = -0.25; a singleton
    item is dropped and counted."""
    from pdf_to_vectordb_etl_spark.operators.evaluation import fleiss_kappa

    rows = [(i, c) for i in range(10) for c in (["a"] * 3 + ["b"] * 2)]
    rows.append((99, "a"))
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").first()
    assert r["n_items"] == 10 and r["n_dropped"] == 1
    assert r["n_ratings"] == 50
    assert abs(r["p_bar_q12"] - 0.4) < 1e-9
    assert abs(r["p_e_q12"] - 0.52) < 1e-9
    assert abs(r["kappa_q6"] - (-0.25)) < 1e-9


def test_fleiss_kappa_saturated_and_empty(spark):
    """Perfect single-category agreement saturates chance (P_e = 1)
    -> NULL kappa; an all-singleton table keeps zero items -> NULLs."""
    from pdf_to_vectordb_etl_spark.operators.evaluation import fleiss_kappa

    perfect = spark.createDataFrame(
        [(i, "a") for i in range(5) for _ in range(3)],
        "item long, cat string",
    )
    r = perfect.transform(lambda d: fleiss_kappa(d, "item", "cat")).first()
    assert r["p_bar_q12"] == 1.0 and r["p_e_q12"] == 1.0
    assert r["kappa_q6"] is None
    solo = spark.createDataFrame(
        [(i, "a") for i in range(4)], "item long, cat string"
    )
    r2 = fleiss_kappa(solo, "item", "cat").first()
    assert r2["n_items"] == 0 and r2["n_dropped"] == 4
    assert r2["kappa_q6"] is None


def test_brier_decomposition_perfect_and_identity(spark):
    """A perfect 0/1 forecast has BRIER = REL = 0 and RES = UNC; a
    generic forecast satisfies Murphy's identity up to the within-bin
    forecast variance (>= 0) plus grid quantization."""
    from pdf_to_vectordb_etl_spark.operators.evaluation import (
        brier_decomposition,
    )

    perfect = spark.createDataFrame(
        [(1000000 if i % 3 == 0 else 0, i % 3 == 0) for i in range(30)],
        "p_micro long, y boolean",
    )
    r = brier_decomposition(perfect, "p_micro", "y", n_bins=10).first()
    assert r["brier_q6"] == 0.0 and r["reliability_q6"] == 0.0
    assert abs(r["resolution_q6"] - r["uncertainty_q6"]) <= 2e-6

    generic = spark.createDataFrame(
        [(i * 10000, (i * 7) % 100 < i) for i in range(100)],
        "p_micro long, y boolean",
    )
    g = brier_decomposition(generic, "p_micro", "y", n_bins=10).first()
    # brier = rel - res + unc + (Var_k(p) - 2 Cov_k(p,y)) averaged over
    # bins: Var_k(p) <= (w/2)^2 and |Cov_k(p,y)| <= (w/2)(1/2) for bin
    # width w = 0.1, so the binned identity holds to |gap| <= 0.053
    gap = g["brier_q6"] - (
        g["reliability_q6"] - g["resolution_q6"] + g["uncertainty_q6"]
    )
    assert abs(gap) <= 0.053 + 3e-6


def test_bradley_terry_matches_converged_mm(spark):
    """6 integer-grid MM rounds land within 0.01 of the converged
    float MM fixed point on a 3-item tournament; a never-winning item
    clamps at the 1e-6 floor and the sole winner takes ~all mass."""
    from pdf_to_vectordb_etl_spark.operators.supervised import (
        bradley_terry_strengths,
    )

    cells = spark.createDataFrame(
        [("a", "b", 8), ("b", "a", 2), ("a", "c", 7), ("c", "a", 3),
         ("b", "c", 6), ("c", "b", 4)],
        "i string, j string, w long",
    )
    got = {
        r["item"]: r["strength_q9"]
        for r in bradley_terry_strengths(cells, n_rounds=6).collect()
    }
    # converged float MM reference (50 rounds): a .5997 b .2147 c .1856
    assert abs(got["a"] - 0.5997) < 0.01
    assert abs(got["b"] - 0.2147) < 0.01
    assert abs(got["c"] - 0.1856) < 0.01
    assert abs(sum(got.values()) - 1.0) < 1e-3

    solo = spark.createDataFrame([("a", "b", 5)], "i string, j string, w long")
    s = {r["item"]: r for r in bradley_terry_strengths(solo, 6).collect()}
    assert s["a"]["strength_q9"] == 1.0
    assert s["b"]["strength_q9"] == 1e-6
    assert s["a"]["wins"] == 5 and s["a"]["n_comparisons"] == 5

    empty = bradley_terry_strengths(cells.filter("w < 0"), 3)
    assert empty.count() == 0


def test_wordpiece_encode_greedy_hand_fixture(spark):
    """Explicit flavored vocab: greedy longest-match (capped at
    max_piece_len=4) segments 'unhappy' as un|h|a|p|p|y = 6,
    'unhappiness' as un|h|a|p|p|i|ness = 7 (ness wins at pos 7),
    'un' = 1; 'zzz' has no initial match -> whole-word OOV; empty
    docs report zeros."""
    from pdf_to_vectordb_etl_spark.operators.textanalysis import (
        wordpiece_encode,
    )

    docs = spark.createDataFrame(
        [(1, "unhappy unhappiness un un zzz"), (2, ""), (3, "ness")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("un", False), ("ness", True), ("h", True), ("a", True),
         ("p", True), ("y", True), ("n", True), ("e", True), ("s", True),
         ("i", True)],
        "piece string, is_cont boolean",
    )
    got = {
        r["doc_id"]: r
        for r in wordpiece_encode(docs, vocab).collect()
    }
    assert got[1]["n_words"] == 5
    assert got[1]["n_oov_words"] == 1  # zzz
    assert got[1]["n_tokens"] == 6 + 7 + 1 + 1
    assert got[2]["n_words"] == 0 and got[2]["n_tokens"] == 0
    # 'ness' at word start needs an INITIAL flavor piece: 'n' is only
    # continuation here, so the word is OOV — flavor matters
    assert got[3]["n_oov_words"] == 1


def test_wordpiece_train_prefers_likelihood_over_raw_count(spark):
    """'xq' appears 3x but x,q are rare (score 3/(3*3)); 'ab' appears
    4x from frequent a,b (score 4/(8*8)) — WordPiece must merge xq
    first even though ab has the higher raw count; BPE would pick ab."""
    from pdf_to_vectordb_etl_spark.operators.textanalysis import (
        bpe_train_merges,
        wordpiece_train_merges,
    )

    text = " ".join(["ab"] * 4 + ["xq"] * 3 + ["a b"] * 4)
    docs = spark.createDataFrame([(text,)], "text string")
    wp = wordpiece_train_merges(docs, n_merges=1).first()
    assert (wp["l"], wp["r"]) == ("x", "q")
    bpe = bpe_train_merges(docs, n_merges=1).first()
    assert (bpe["l"], bpe["r"]) == ("a", "b")


def test_ccnet_buckets_exact_tertiles(spark):
    """9 docs, one source, distinct scores: exactly 3/3/3 into
    head/middle/tail with head = the 3 highest scores; a second
    source with 4 docs splits 1/1/2 (rank*3 <= n integer cuts)."""
    from pdf_to_vectordb_etl_spark.operators.curation import (
        ccnet_perplexity_buckets,
    )

    docs = spark.createDataFrame(
        [(i, "s1") for i in range(9)] + [(i, "s2") for i in range(10, 14)],
        "doc_id long, source string",
    )
    scores = spark.createDataFrame(
        [(i, -float(i)) for i in range(9)]
        + [(i, -float(i)) for i in range(10, 14)],
        "doc_id long, kn_score double",
    )
    out = {
        (r["source"], r["bucket"]): r
        for r in ccnet_perplexity_buckets(docs, scores).collect()
    }
    assert out[("s1", "head")]["n_docs"] == 3
    assert out[("s1", "middle")]["n_docs"] == 3
    assert out[("s1", "tail")]["n_docs"] == 3
    # head = highest scores = -0,-1,-2
    assert out[("s1", "head")]["score_min"] == -2.0
    assert out[("s1", "head")]["score_max"] == 0.0
    assert out[("s1", "tail")]["score_max"] == -6.0
    assert out[("s2", "head")]["n_docs"] == 1
    assert out[("s2", "middle")]["n_docs"] == 1
    assert out[("s2", "tail")]["n_docs"] == 2


def test_l_diversity_catches_homogeneous_class(spark):
    """A large class with ONE sensitive value is k-anonymous but not
    l-diverse — the report must count it under l."""
    from pdf_to_vectordb_etl_spark.operators.quality_checks import (
        l_diversity_report,
    )

    rows = [("a", 1, "x")] * 10 + [("b", 1, "x"), ("b", 1, "y"),
                                   ("b", 1, "z")]
    df = spark.createDataFrame(rows, "qi string, band int, sens string")
    r = l_diversity_report(df, ["qi", "band"], "sens", l=2).first()
    assert r["n_classes"] == 2
    assert r["classes_under_l"] == 1
    assert r["rows_under_l"] == 10
    assert r["min_diversity"] == 1
    assert r["l_diverse"] is False
    assert abs(r["suppression_frac"] - round(10 / 13, 4)) < 1e-9


def test_personalized_pagerank_concentrates_on_seeds(spark):
    """On a 4-cycle with one seed, the seed holds the most rank, total
    mass stays ~1, and disjoint seeds return an empty frame."""
    from pdf_to_vectordb_etl_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iterations=4).collect()
    }
    assert max(got, key=got.get) == "a"
    assert abs(sum(got.values()) - 1.0) < 1e-3
    # proximity ordering on the cycle: b (1 hop) > c (2 hops)
    assert got["b"] > got["c"]

    none = personalized_pagerank(
        edges, spark.createDataFrame([("zz",)], "node string"), 2
    )
    assert none.count() == 0


def test_cross_corpus_lcs_ignores_within_corpus_repeats(spark):
    """Corpus A repeats 'WWWWWWWWWW' internally (longer than anything
    shared) but the LONGEST CROSS-corpus substring is 'shared-seq':
    within-corpus repeats must not win; witness is the lexicographic
    smallest at the max length; disjoint corpora -> 0/NULL row."""
    from pdf_to_vectordb_etl_spark.operators.suffixes import (
        cross_corpus_lcs,
    )

    df = spark.createDataFrame(
        [
            (1, "a", "xx shared-seq yy WWWWWWWWWW"),
            (2, "a", "qq WWWWWWWWWW zz"),
            (3, "b", "ko shared-seq pf"),
        ],
        "doc_id long, cor string, text string",
    )
    r = cross_corpus_lcs(df, "cor").first()
    assert r["lcs"] == " shared-seq "
    assert r["lcs_len"] == 12
    assert r["n_corpora"] == 2 and r["n_docs"] == 2

    disjoint = spark.createDataFrame(
        [(1, "a", "abc"), (2, "b", "xyz")],
        "doc_id long, cor string, text string",
    )
    r2 = cross_corpus_lcs(disjoint, "cor").first()
    assert r2["lcs_len"] == 0 and r2["lcs"] is None


def test_fdr_bh_textbook_fixture(spark):
    """p = .01,.02,.03,.2,.5 at alpha=.1, m=5: BH thresholds k*.02 ->
    ranks 1..3 rejected (note p4=.2 > .08 even though p3 passed);
    empty input -> empty frame."""
    from pdf_to_vectordb_etl_spark.operators.evaluation import fdr_bh

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.2), ("e", 0.5)],
        "key string, p double",
    )
    got = {r["key"]: r for r in fdr_bh(df, "p", "key", alpha=0.1).collect()}
    assert [got[k]["rejected"] for k in "abcde"] == [
        True, True, True, False, False
    ]
    assert got["c"]["rank"] == 3
    assert fdr_bh(df.filter("p < 0"), "p", "key").count() == 0


def test_fdr_bh_step_up_not_step_down(spark):
    """BH is STEP-UP: a late rank passing its threshold rescues every
    smaller rank, even ones that individually failed."""
    from pdf_to_vectordb_etl_spark.operators.evaluation import fdr_bh

    # p1=.04 > 1*.05/2=.025 fails alone; p2=.05 <= .05 passes -> both
    df = spark.createDataFrame(
        [("a", 0.04), ("b", 0.05)], "key string, p double"
    )
    got = {r["key"]: r["rejected"] for r in
           fdr_bh(df, "p", "key", alpha=0.05).collect()}
    assert got == {"a": True, "b": True}


def test_source_jaccard_hand_fixture(spark):
    """Two sources sharing exactly one 3-shingle out of 2 and 2:
    J = 1/3; a third disjoint source pairs at no row (inner join)."""
    from pdf_to_vectordb_etl_spark.operators.profiling import (
        source_jaccard_matrix,
    )

    df = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma delta"),      # shingles: abg, bgd
            ("s2", "alpha beta gamma epsilon"),    # shingles: abg, bge
            ("s3", "one two three"),               # shingle: ott
        ],
        "source string, text string",
    )
    rows = source_jaccard_matrix(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert {r["s1"], r["s2"]} == {"s1", "s2"}
    assert r["inter"] == 1 and r["uni"] == 3
    assert abs(r["j_q6"] - 0.333333) < 1e-9


def test_t_closeness_hand_fixture(spark):
    """Class A all-x (4), class B 2x2y (4); global (6x, 2y): both
    classes sit at exactly t = 0.25 — over at t=0.2, within at
    t=0.25; empty input -> NULLs."""
    from pdf_to_vectordb_etl_spark.operators.quality_checks import (
        t_closeness_report,
    )

    df = spark.createDataFrame(
        [("A", "x")] * 4 + [("B", "x")] * 2 + [("B", "y")] * 2,
        "qi string, s string",
    )
    strict = t_closeness_report(df, ["qi"], "s", t=0.2).first()
    assert strict["classes_over_t"] == 2 and strict["t_close"] is False
    assert abs(strict["max_t_q6"] - 0.25) < 1e-9
    loose = t_closeness_report(df, ["qi"], "s", t=0.25).first()
    assert loose["classes_over_t"] == 0 and loose["t_close"] is True
    empty = t_closeness_report(df.filter("qi = 'z'"), ["qi"], "s").first()
    assert empty["n_classes"] == 0 and empty["t_close"] is None


def test_lift_table_concentrates_positives(spark):
    """100 rows, positives exactly where score is highest (top 20):
    deciles 1-2 get lift 5.0, others 0; cumulative gain hits 1.0 at
    decile 2 and stays."""
    from pdf_to_vectordb_etl_spark.operators.evaluation import lift_table

    rows = [(i, (100 - i) * 10000, i < 20) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, p_micro long, y boolean")
    got = {r["tile"]: r for r in
           lift_table(df, "p_micro", "y", "id", n_tiles=10).collect()}
    assert got[1]["lift_q6"] == 5.0 and got[2]["lift_q6"] == 5.0
    assert got[3]["lift_q6"] == 0.0
    assert got[1]["cum_gain_q6"] == 0.5
    assert got[2]["cum_gain_q6"] == 1.0
    assert got[10]["cum_gain_q6"] == 1.0
    assert all(got[t]["n"] == 10 for t in got)


def test_rfm_segments_hand_fixture(spark):
    """10 users with monotone recency/frequency/monetary (user 0 best
    on all three): quintiles put users 0-3 in champions (r<=2,f<=2),
    users 4-9 (r,f >= 3) in hibernating; monetary sums are exact
    micro-grid integers."""
    from pdf_to_vectordb_etl_spark.operators.aggregates import rfm_segments

    rows = []
    for u in range(10):
        for k in range(10 - u):  # freq decreasing in u
            rows.append((u, (100 - u) * 10**9, 10.5 - u))
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = {r["segment"]: r for r in rfm_segments(df).collect()}
    assert got["champions"]["n_users"] == 4
    assert got["hibernating"]["n_users"] == 6
    assert set(got) == {"champions", "hibernating"}
    # user 0: 10 events at 10.5 -> 105_000_000 micro; exact
    total = sum(r["monetary_micro"] for r in got.values())
    want = sum(int((10.5 - u) * 1e6) * (10 - u) for u in range(10))
    assert total == want


def test_gopher_rule_ablation_invariants(spark):
    """Planted docs, one per failure mode: per rule,
    n_sole_fail <= n_fail; n_pass_without - n_pass == n_sole_fail (the
    docs a rule uniquely removes are exactly what dropping it returns);
    a doc failing two rules is sole-fail for neither."""
    from pdf_to_vectordb_etl_spark.operators.textanalysis import (
        gopher_rule_ablation,
    )

    good = "the of and to a in is it you that " * 10   # passes all
    # fails ONLY min_words: >= 2 Gopher stopwords, mean word len in
    # [3, 10], all-alpha, no bullets/symbols
    short = "that have handsome oranges wonderful beautiful"
    # fails min_words AND symbol ratio (many # marks, few words)
    double = "# # # # ## ###"
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, double)], "doc_id long, text string"
    )
    rows = {r["rule"]: r for r in gopher_rule_ablation(docs).collect()}
    assert len(rows) == 9
    n_pass = next(iter(rows.values()))["n_pass"]
    for r in rows.values():
        assert r["n_sole_fail"] <= r["n_fail"]
        assert r["n_pass_without"] - n_pass == r["n_sole_fail"]
        assert r["n_docs"] == 3
    assert rows["min_words"]["n_fail"] == 2
    # 'short' fails ONLY min_words (all-stopword text, sane ratios)
    assert rows["min_words"]["n_sole_fail"] >= 1


def test_repetition_depth_monotone_and_exact(spark):
    """Repeat-position counts are non-increasing in width (a repeated
    w-window implies a repeated w/2-window at the same start is
    possible — the count over FULL positions can only shrink); a
    planted 16-char duplicated block shows up at every width; the
    fully-unique corpus shows zeros past width 1."""
    from pdf_to_vectordb_etl_spark.operators.suffixes import (
        repetition_depth_profile,
    )

    block = "ABCDEFGHIJKLMNOP"  # 16 unique chars, duplicated across docs
    docs = spark.createDataFrame(
        [(1, f"xx{block}yy"), (2, f"qq{block}rr")],
        "doc_id long, text string",
    )
    rows = {r["width"]: r for r in
            repetition_depth_profile(docs).collect()}
    assert rows[16]["n_repeat_groups"] >= 1
    assert rows[16]["max_group"] >= 2
    for w in (1, 2, 4, 8, 16):
        assert rows[w]["n_repeat_positions"] >= 2
    # non-increasing in width
    widths = sorted(rows)
    for a, b in zip(widths, widths[1:]):
        assert rows[a]["n_repeat_positions"] >= rows[b]["n_repeat_positions"]

    uniq = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "ijklmnop")], "doc_id long, text string"
    )
    u = {r["width"]: r for r in repetition_depth_profile(uniq).collect()}
    assert u[2]["n_repeat_groups"] == 0 and u[16]["n_repeat_positions"] == 0


def test_code_switch_entropy_hand_fixture(spark):
    """Doc 1 alternates EN and ES sentences (entropy ln 2 ~ 0.6931,
    2 langs); doc 2 is pure EN (entropy 0, 1 lang); doc 3 has no
    marker evidence (0 classified, NULL entropy)."""
    from pdf_to_vectordb_etl_spark.operators.textanalysis import (
        code_switch_entropy,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog. el perro que la casa. "
                "of the house to a garden. los gatos de la que el."),
            (2, "the cat and the dog. of the house to a garden."),
            (3, "zzz qqq. xxx www."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in code_switch_entropy(docs).collect()}
    assert got[1]["n_langs"] == 2 and got[1]["n_classified"] == 4
    assert abs(got[1]["lang_entropy_q4"] - 0.6931) < 1e-9
    assert got[2]["n_langs"] == 1 and got[2]["lang_entropy_q4"] == 0.0
    assert got[3]["n_classified"] == 0 and got[3]["lang_entropy_q4"] is None
    assert got[3]["n_sentences"] == 2


def test_min_k_prob_selects_the_bottom_fifth(spark):
    """10 identical high-prob bigrams + 2 planted rare ones: k =
    ceil(12/5) = 3, and the min-k mean must be dragged down by the two
    rare bigrams (min_k score < overall kn score); k_used is the exact
    integer ceil."""
    from pdf_to_vectordb_etl_spark.operators.textanalysis import (
        kneser_ney_scores,
        min_k_prob,
    )

    common = "alpha beta " * 6          # frequent bigrams
    rare = "zq xv"                      # appears once in the corpus
    target = common + rare
    other_docs = [(i, "alpha beta alpha beta gamma") for i in range(2, 8)]
    docs = spark.createDataFrame(
        [(1, target)] + other_docs, "doc_id long, text string"
    )
    mk = {r["doc_id"]: r for r in min_k_prob(docs, k_denom=5).collect()}
    kn = {r["doc_id"]: r for r in kneser_ney_scores(docs).collect()}
    r1 = mk[1]
    assert r1["k_used"] == (r1["n_bigrams"] + 4) // 5
    assert r1["min_k_score_q4"] < kn[1]["kn_score"]
    # a doc of only frequent bigrams: bottom-k mean >= the mixed doc's
    assert mk[2]["min_k_score_q4"] > r1["min_k_score_q4"]
