#!/usr/bin/env python
"""Real-PDF integration probe — the standing first action on any host
where PyMuPDF is installable (it is NOT in the build sandbox, so the
real decode path of sources/pdf.py:real_pdf_decoder has never executed
there; parity is pinned via the reference's committed goldens instead).

Runs the real pipeline end-to-end:

    binaryFile scan -> real_pdf_decoder (PyMuPDF) -> full question
    parse -> per-subject extraction counts

against the reference's committed 2022 exam PDFs and asserts the
BASELINE.md:11 per-subject yields (no-images mode):

    math 37, natu 29, spani 3, lang 24, huma 26

Exit 0 = the real kernel reproduces the reference extraction, flipping
SURVEY rows S2/U1/U5 from partial to full. Exit 2 = pymupdf absent
(expected in the sandbox). Exit 1 = counts diverge — a real defect.

``--fake`` swaps in fake_pdf_decoder so the probe's own plumbing is
testable on a pymupdf-less host (counts are then NOT asserted; the run
only proves scan -> decode -> parse -> report executes).

Usage:
    python tools/real_kernel_probe.py [--folder /root/reference/pdfs_enem/2022]
                                      [--fake]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_2022 = {"math": 37, "natu": 29, "spani": 3, "lang": 24, "huma": 26}


def run_probe(spark, folder: str, use_fake: bool):
    """scan -> decode -> parse -> per-subject counts. Returns the
    {subject: n_questions} dict. Factored out so the hermetic test can
    drive it with the fake decoder."""
    from pdf_to_vectordb_etl_spark.plans import etl
    from pdf_to_vectordb_etl_spark.sources import pdf as pdfsource

    decoder = (
        pdfsource.fake_pdf_decoder if use_fake else pdfsource.real_pdf_decoder
    )
    files = pdfsource.with_filename_tokens(
        pdfsource.scan_pdf_folder(spark, folder)
    )
    pages = pdfsource.pages_from_pdfs(files, decoder=decoder)
    questions = etl.extract_questions(pages)
    report = etl.extraction_report(questions)
    return {r["subject"]: int(r["n"]) for r in report.collect()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", default="/root/reference/pdfs_enem/2022")
    ap.add_argument("--fake", action="store_true")
    args = ap.parse_args()

    if not args.fake:
        try:
            import fitz  # type: ignore[import-not-found]  # noqa: F401
        except ImportError:
            print(
                "PROBE SKIPPED: pymupdf not installed (expected in the "
                "build sandbox). Re-run on a pymupdf-capable host."
            )
            return 2

    from pdf_to_vectordb_etl_spark.session import get_spark

    spark = get_spark(
        app_name="real_kernel_probe", master="local[8]", shuffle_partitions=8
    )
    got = run_probe(spark, args.folder, use_fake=args.fake)
    print(f"extracted per-subject counts: {got}")

    if args.fake:
        print("PROBE OK (fake decoder — plumbing only, counts not asserted)")
        return 0

    missing = {
        s: (n, got.get(s)) for s, n in EXPECTED_2022.items() if got.get(s) != n
    }
    if missing:
        print(f"PROBE FAILED: expected-vs-got diverge: {missing}")
        return 1
    print("PROBE PASSED: real PyMuPDF extraction reproduces BASELINE.md 2022")
    return 0


if __name__ == "__main__":
    sys.exit(main())
