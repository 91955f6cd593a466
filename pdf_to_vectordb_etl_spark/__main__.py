"""Command-line entry point — reference-tool ergonomics over the engine.

The reference is driven as scripts (extract a folder of PDFs, load a
TXT into the vector store, search). This CLI gives the Spark engine the
same one-command surface, plus direct access to the 200-query registry:

  python -m pdf_to_vectordb_etl_spark list
      every registry query name with its first docstring line
  python -m pdf_to_vectordb_etl_spark query <name> [--sf DIR] [--limit N]
      run one registry query and print the result
  python -m pdf_to_vectordb_etl_spark sql "SELECT ..." [--sf DIR]
      ad-hoc SQL over the corpus tables (registered as temp views,
      event times normalized — the interactive escape hatch)
  python -m pdf_to_vectordb_etl_spark process-folder IN COLLECTION [--dim 64]
      the reference lifecycle: folder of PDFs -> extracted questions ->
      embedded vector collection + per-(year, subject) stats
  python -m pdf_to_vectordb_etl_spark evaluate [--sf DIR]
      the composed corpus-quality report (plans/evaluate.py): one
      (metric, value) row per grade — AUC, calibration, kappa, MRR, ...
"""

from __future__ import annotations

import argparse
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_corpus_views(spark, sf_dir: str) -> None:
    """Register every corpus table as a temp view (events pre-normalized
    to bigint-nanos ``ts`` like ``_t()`` does) so ad-hoc ``spark.sql``
    matches the engine's own reading of the data."""
    from .schemas import normalize_event_times

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events":
            df = normalize_event_times(df, "ts")
        df.createOrReplaceTempView(t)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_to_vectordb_etl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")

    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)

    s = sub.add_parser("sql")
    s.add_argument("statement")
    s.add_argument("--sf", default="/root/testdata/sf0.001")
    s.add_argument("--limit", type=int, default=20)

    pf = sub.add_parser("process-folder")
    pf.add_argument("input_dir")
    pf.add_argument("collection_path")
    pf.add_argument("--dim", type=int, default=64)

    ev = sub.add_parser("evaluate")
    ev.add_argument("--sf", default="/root/testdata/sf0.001")

    args = ap.parse_args(argv)

    if args.cmd == "list":
        sys.path.insert(0, ".")
        import __spark_entry__ as entry

        for name, fn in sorted(entry.queries().items()):
            doc = (fn.__doc__ or "").strip().splitlines()
            print(f"{name}: {doc[0] if doc else ''}")
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    if args.cmd == "query":
        sys.path.insert(0, ".")
        import __spark_entry__ as entry

        df = entry.queries()[args.name](spark, args.sf)
        df.show(args.limit, truncate=False)
        return 0
    if args.cmd == "sql":
        register_corpus_views(spark, args.sf)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0
    if args.cmd == "process-folder":
        from . import api

        stats = api.process_folder(
            spark, args.input_dir, args.collection_path, dim=args.dim
        )
        stats.show(truncate=False)
        return 0
    if args.cmd == "evaluate":
        from .plans.evaluate import evaluate_corpus

        docs = spark.read.parquet(f"{args.sf}/documents.parquet")
        emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
        evaluate_corpus(spark, docs, emb).show(50, truncate=False)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
