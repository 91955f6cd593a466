"""Composed table-maintenance plan (beyond-reference systems flagship).

The housekeeping lifecycle a 100 TB lakehouse table needs on a
schedule, chained from the repo's systems operators:

  1. COMPACT   — rewrite the fragmented dataset into ~target-size,
                 Z-order-clustered files (sinks.compact_parquet /
                 zorder.write_zordered): footer min/max stats prune
                 both clustered dimensions on re-read.
  2. SUMMARIZE — Merkle fingerprint of the rewritten table
                 (cdc.merkle_summary): n_buckets XOR checksums from
                 one partial-combinable pass.
  3. VERIFY    — the rewrite moved bytes but must not have changed a
                 row: merkle_changed_buckets(old, new) == ∅ proves
                 content equality WITHOUT joining the two copies
                 row-by-row (layout-invariant: the summary hashes
                 values, never file offsets).
  4. MANIFEST  — the committed summary doubles as the table's sync
                 artifact: a downstream replica diffs its own summary
                 against it and pulls only disagreeing buckets
                 (cdc.merkle_diff).

Every step is an existing oracled/pinned operator; this module is the
composition plus the verification contract, mirroring plans/curate.py
(curation) and plans/rag.py (retrieval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import cdc, zorder


def maintain_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    key_cols: list[str],
    payload_cols: list[str],
    zorder_cols: tuple[str, str] | None = None,
    n_files: int = 16,
    n_buckets: int = 4096,
) -> dict:
    """Run the compact → summarize → verify lifecycle; returns a report
    dict (files written, buckets summarized, verified flag, row count).
    Raises if the rewrite changed any bucket fingerprint — a
    maintenance job must be a byte-layout operation, never a data
    change."""
    before = spark.read.parquet(src_path)
    sum_before = cdc.merkle_summary(
        before, key_cols, payload_cols, n_buckets
    ).persist()
    n_rows = before.count()

    if zorder_cols is not None:
        zorder.write_zordered(
            before, dest_path, zorder_cols[0], zorder_cols[1], n_files=n_files
        )
    else:
        before.coalesce(n_files).write.mode("overwrite").parquet(dest_path)

    after = spark.read.parquet(dest_path)
    sum_after = cdc.merkle_summary(after, key_cols, payload_cols, n_buckets)
    n_changed = cdc.merkle_changed_buckets(sum_before, sum_after).count()
    sum_before.unpersist()
    if n_changed:
        raise ValueError(
            f"maintain_table: rewrite of {src_path} changed {n_changed} "
            "bucket fingerprints — a maintenance pass must preserve "
            "content exactly; aborting before the manifest is published."
        )
    return {
        "n_rows": n_rows,
        "n_files": n_files,
        "n_buckets_summarized": n_buckets,
        "verified": True,
    }
