"""Spark 4 Python DataSource for the PDF corpus (beyond-reference).

``spark.read.format("pdf_pages").load(folder)`` as a first-class
source: one ``InputPartition`` per PDF file, so the scan parallelizes
file-per-task across executors with no driver-side byte handling —
the idiomatic Spark-4 packaging of what ``sources/pdf.py`` does with
``binaryFile`` + ``mapInPandas`` (reference behavior:
enem_pdf_extractor.py file-walk + per-file open). The two paths share
the SAME decoder kernels (fake hermetic / real import-gated PyMuPDF),
and a parity test pins row-for-row agreement.

When to use which: the mapInPandas path composes with the filename
token pipeline and Arrow-batches many small files per task; the
DataSource path gives each (potentially huge) file its own task and
plugs into plain ``spark.read`` — partition planning lists file NAMES
only (cheap driver metadata), bytes are read executor-side in
``read()``.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: flat page schema (DDL) — PAGE_SCHEMA minus the filename-token
#: columns, which remain the mapInPandas pipeline's concern
PDF_PAGES_DDL = (
    "path string, page_index int, page_text string, n_images int"
)


class PdfPagesDataSource(DataSource):
    """Registered as ``pdf_pages``; options: ``path`` (folder),
    ``decoder`` = ``fake`` (default, hermetic) | ``real`` (PyMuPDF,
    import-gated)."""

    @classmethod
    def name(cls) -> str:
        return "pdf_pages"

    def schema(self) -> str:
        return PDF_PAGES_DDL

    def reader(self, schema) -> "PdfPagesReader":
        return PdfPagesReader(self.options)


class PdfPagesReader(DataSourceReader):
    def __init__(self, options):
        self._folder = options.get("path")
        if not self._folder:
            raise ValueError("pdf_pages: .option('path', <folder>) or .load(<folder>) is required")
        self._decoder_name = options.get("decoder", "fake")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self._folder, "*.pdf")))
        # one partition per file: the planner ships file NAMES only;
        # an empty folder is an empty scan, not an error
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition):
        path = partition.value
        if path is None:
            return
        from .pdf import fake_pdf_decoder, real_pdf_decoder

        decoder = (
            real_pdf_decoder if self._decoder_name == "real" else fake_pdf_decoder
        )
        with open(path, "rb") as fh:
            content = fh.read()
        for page in decoder(path, content):
            yield (
                "file:" + path if not path.startswith("file:") else path,
                page["page_index"],
                page["page_text"],
                page["n_images"],
            )
