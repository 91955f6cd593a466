"""Real-PDF source (SURVEY §2.1 S1-S4, §2.12 U1).

``spark.read.format("binaryFile")`` scans a folder of PDFs (one row per
file, content as BinaryType), then a ``mapInPandas`` UDF explodes each
file into page rows — the reference's ``fitz.open`` + per-page
``get_text`` loop (enem_pdf_extractor.py:959-961,:234-236) distributed
per file across executors, Arrow-batched.

PyMuPDF is not installed in this container: the decode kernel is
import-gated. Tests drive the identical plumbing with
``fake_pdf_decoder`` (deterministic pages derived from the bytes), so
schema, partitioning, and batch shape are covered hermetically; on a
host with pymupdf the real kernel engages unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import filename as fn
from ..schemas import PAGE_SCHEMA

PageDecoder = Callable[[str, bytes], list[dict]]
"""(path, content) -> list of page dicts with keys
``page_index``/``page_text``/``n_images``/``image_names``."""


def scan_pdf_folder(spark: SparkSession, folder: str) -> DataFrame:
    """S4 — one row per ``*.pdf`` file: (path, length, content). The
    glob filter prunes at the file index; no bytes of non-PDFs are read."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(folder)
        .select("path", "length", "content")
    )


def with_filename_tokens(files: DataFrame) -> DataFrame:
    """F9/X1/X3 — filename-convention columns + validity predicate
    (reference enem_pdf_extractor.py:80-110 raises; here: a column the
    caller filters or asserts on)."""
    tail = fn.file_tail(F.col("path"))
    kind = F.when(tail.contains("GB"), "GB").when(tail.contains("PV"), "PV")
    return files.withColumns(
        {
            "doc_id": F.regexp_replace(tail, r"\.pdf$", ""),
            "year": fn.year_of(tail),
            "kind": kind,
            "day": fn.day_of(tail),
            "color": fn.color_of(tail),
            "valid_name": fn.is_pdf_name(tail)
            & kind.isNotNull()
            & (fn.day_of(tail) != "")
            & (fn.color_of(tail) != ""),
        }
    )


def real_pdf_decoder(path: str, content: bytes) -> list[dict]:
    """U1 kernel — PyMuPDF text+image extraction per page (reference
    enem_pdf_extractor.py:231-335). Import-gated: raises cleanly where
    the library is absent."""
    try:
        import fitz  # type: ignore[import-not-found]  # PyMuPDF
    except ImportError as e:
        raise NotImplementedError(
            "pymupdf not installed in this environment; use "
            "fake_pdf_decoder for hermetic tests"
        ) from e

    doc = fitz.open(stream=content, filetype="pdf")  # pragma: no cover
    pages = []  # pragma: no cover
    for i, page in enumerate(doc):  # pragma: no cover
        imgs = page.get_images()
        pages.append(
            {
                "page_index": i,
                "page_text": page.get_text(),
                "n_images": len(imgs),
                "image_names": [f"xref{x[0]}" for x in imgs],
            }
        )
    return pages  # pragma: no cover


def fake_pdf_decoder(path: str, content: bytes) -> list[dict]:
    """Deterministic decode stand-in: page count and text derive from
    the content digest, so tests exercise the full mapInPandas plumbing
    (schema, explode fan-out, ordering) without PyMuPDF."""
    import hashlib

    h = hashlib.blake2b(content, digest_size=8).digest()
    n_pages = 2 + h[0] % 3
    return [
        {
            "page_index": i,
            "page_text": f"QUESTÃO {i}\nfake page {i} of {path.rsplit('/', 1)[-1]} "
            f"digest {h.hex()}",
            "n_images": h[i % 8] % 2,
            "image_names": [],
        }
        for i in range(n_pages)
    ]


def write_page_images(
    pages_with_bytes: DataFrame,
    out_dir: str,
    image_bytes_col: str = "image_bytes",
) -> DataFrame:
    """O4 — executor-side image materialization (reference
    enem_pdf_extractor.py:302-332 transcodes each xref to PNG on the
    fly). Rows carry raw image bytes + a target name; each partition
    writes its own files (no driver round-trip) and the path column
    comes back for the question records' ``page_images``."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("page_index", T.IntegerType()),
            T.StructField("image_path", T.StringType()),
        ]
    )

    def _write(batches):
        import os

        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                name = f"{r.doc_id}_page{r.page_index}_{r.image_index}.png"
                path = os.path.join(out_dir, name)
                with open(path, "wb") as f:
                    f.write(bytes(getattr(r, image_bytes_col)))
                rows.append(
                    {"doc_id": r.doc_id, "page_index": r.page_index, "image_path": path}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return pages_with_bytes.mapInPandas(_write, out_schema)


def pages_from_pdfs(
    files: DataFrame, decoder: PageDecoder = real_pdf_decoder
) -> DataFrame:
    """S1/S2/S3 — explode binary file rows into page rows (UDTF-like:
    1 -> N) via ``mapInPandas``; one Arrow batch of files in, page rows
    out, executor-side. Output matches ``schemas.PAGE_SCHEMA``."""
    import pandas as pd

    tokened = with_filename_tokens(files)

    def _explode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for page in decoder(r.path, bytes(r.content)):
                    rows.append(
                        {
                            "doc_id": r.doc_id,
                            "path": r.path,
                            "year": r.year,
                            "kind": r.kind,
                            "day": r.day,
                            "color": r.color,
                            **page,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGE_SCHEMA.fields]
            )

    return tokened.mapInPandas(_explode, PAGE_SCHEMA)
