"""Vector math as native higher-order functions (SURVEY §2.6 K1).

The reference delegates cosine kNN to Qdrant (reference
qdrant_text_loader.py:122-142, metric config :25). Here the kernel is
pure Catalyst expressions (``zip_with`` + ``aggregate``) — no Python in
the hot path, so brute-force top-k scans stay in whole-stage codegen and
scale linearly across executors.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum of elementwise products, computed in double precision."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(
    a: Column | str,
    b: Column | str,
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """Cosine similarity; zero-norm vectors score -1.0 (maximally
    dissimilar) — DuckDB's ``list_cosine_similarity`` sentinel, adopted
    here so the two engines agree on degenerate inputs AND so zero
    vectors sink deterministically to the bottom of a DESC ranking
    instead of riding engine-specific NULL ordering.

    Pass precomputed ``norm_a``/``norm_b`` in pairwise joins so the
    per-pair kernel is one dot product instead of three array folds."""
    d = dot(a, b)
    na = l2_norm(a) if norm_a is None else norm_a
    nb = l2_norm(b) if norm_b is None else norm_b
    denom = na * nb
    return F.when(denom == 0, F.lit(-1.0)).otherwise(d / denom)
