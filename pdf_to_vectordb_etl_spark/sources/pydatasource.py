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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)

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
        # pushdown is OPT-IN: Spark hard-errors on any reader that
        # defines pushFilters while spark.sql.python.filterPushdown
        # .enabled is false, so the capability lives on a subclass
        if self.options.get("pushdown", "false").lower() == "true":
            return PdfPagesPushdownReader(self.options)
        return PdfPagesReader(self.options)

    def simpleStreamReader(self, schema) -> "PdfPagesStreamReader":
        return PdfPagesStreamReader(self.options)


class PdfPagesReader(DataSourceReader):
    def __init__(self, options):
        self._folder = options.get("path")
        if not self._folder:
            raise ValueError("pdf_pages: .option('path', <folder>) or .load(<folder>) is required")
        self._decoder_name = options.get("decoder", "fake")
        self._path_filters = []

    def _keep(self, emitted_path: str) -> bool:
        for f in self._path_filters:
            v = f.value
            if isinstance(f, EqualTo) and emitted_path != v:
                return False
            if isinstance(f, StringContains) and v not in emitted_path:
                return False
            if isinstance(f, StringStartsWith) and not emitted_path.startswith(v):
                return False
            if isinstance(f, StringEndsWith) and not emitted_path.endswith(v):
                return False
        return True

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self._folder, "*.pdf")))
        files = [
            f for f in files if self._keep("file:" + f)
        ]
        # one partition per surviving file: the planner ships file
        # NAMES only; an empty folder is an empty scan, not an error
        return [InputPartition(f) for f in files] or [InputPartition(None)]

    def read(self, partition):
        path = partition.value
        if path is None:
            return
        yield from _decode_file(path, self._decoder_name)


def _decode_file(path: str, decoder_name: str):
    from .pdf import fake_pdf_decoder, real_pdf_decoder

    decoder = real_pdf_decoder if decoder_name == "real" else fake_pdf_decoder
    with open(path, "rb") as fh:
        content = fh.read()
    for page in decoder(path, content):
        yield (
            "file:" + path if not path.startswith("file:") else path,
            page["page_index"],
            page["page_text"],
            page["n_images"],
        )


class PdfPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the ``pdf_pages`` source — the reference's
    incremental folder ETL (T3) as a FORMAL Structured Streaming
    source with offset bookkeeping instead of a file-glob convention:
    the offset is the sorted list of files already emitted, so each
    micro-batch decodes exactly the new arrivals, replays are
    deterministic (``readBetweenOffsets`` re-derives a batch from the
    two offset lists), and exactly-once delivery falls out of the
    offset log rather than application logic.

    The list-of-names offset grows with the folder — right for
    drop-folder scale (thousands of files); a production source over
    millions of files would keep a (mtime, name) high-watermark
    instead, same contract."""

    def __init__(self, options):
        self._folder = options.get("path")
        if not self._folder:
            raise ValueError("pdf_pages stream: option 'path' is required")
        self._decoder_name = options.get("decoder", "fake")

    def initialOffset(self):
        return {"files": "[]"}

    def _list(self):
        import glob as g

        return sorted(g.glob(os.path.join(self._folder, "*.pdf")))

    def read(self, start):
        import json

        seen = set(json.loads(start["files"]))
        now = self._list()
        new = [f for f in now if f not in seen]
        # a LIST, not a generator: the simple stream reader prefetches
        # driver-side and pickles the batch into the offset cache
        rows = [
            r for f in new for r in _decode_file(f, self._decoder_name)
        ]
        end = {"files": json.dumps(sorted(seen | set(new)))}
        return rows, end

    def readBetweenOffsets(self, start, end):
        import json

        seen = set(json.loads(start["files"]))
        upto = set(json.loads(end["files"]))
        for f in sorted(upto - seen):
            yield from _decode_file(f, self._decoder_name)



class ShardCommit(WriterCommitMessage):
    """Per-task commit message: staged file, final name, row count,
    XOR-of-line-hashes checksum (partial-combinable, same construction
    as the manifest sink in sinks.py)."""

    def __init__(self, staged: str, final: str, n_rows: int, checksum: int):
        self.staged = staged
        self.final = final
        self.n_rows = n_rows
        self.checksum = checksum


class JsonlManifestDataSource(DataSource):
    """``df.write.format("jsonl_manifest").save()`` — a transactional
    sharded-JSONL training-export sink through Spark's FORMAL writer
    contract: executors stage shard files and return commit messages;
    the driver's ``commit()`` promotes every shard atomically and
    writes ``_MANIFEST.json`` (counts + XOR checksums per shard);
    ``abort()`` removes staged files so failed jobs leave nothing
    half-visible. Complements sinks.export_sharded_manifest (plain
    DataFrame implementation) with the DataSourceWriter packaging —
    readers see either the full committed export or none of it."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def schema(self) -> str:  # pragma: no cover - writer-only source
        return "value string"

    def writer(self, schema, overwrite: bool) -> "JsonlManifestWriter":
        return JsonlManifestWriter(self.options, schema)


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_manifest: save(<folder>) is required")

    def write(self, iterator) -> ShardCommit:
        import hashlib
        import json as _json
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self._path, exist_ok=True)
        staged = os.path.join(
            self._path, f".staged-shard-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        final = os.path.join(self._path, f"shard-{pid:05d}.jsonl")
        n = 0
        checksum = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                line = _json.dumps(
                    row.asDict(recursive=True), sort_keys=True, default=str
                )
                fh.write(line + "\n")
                n += 1
                checksum ^= int.from_bytes(
                    hashlib.md5(line.encode()).digest()[:8], "big"
                )
        return ShardCommit(staged, final, n, checksum)

    def commit(self, messages) -> None:
        import json as _json

        shards = []
        for m in messages:
            os.replace(m.staged, m.final)
            shards.append(
                {
                    "shard": os.path.basename(m.final),
                    "n_rows": m.n_rows,
                    "checksum": m.checksum,
                }
            )
        manifest = {
            "n_shards": len(shards),
            "n_rows": sum(s["n_rows"] for s in shards),
            "shards": sorted(shards, key=lambda s: s["shard"]),
        }
        with open(os.path.join(self._path, "_MANIFEST.json"), "w") as fh:
            _json.dump(manifest, fh, indent=2, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged)
            except FileNotFoundError:
                pass


class PdfPagesPushdownReader(PdfPagesReader):
    """``.option("pushdown", "true")`` variant (requires
    ``spark.sql.python.filterPushdown.enabled=true``): string
    predicates on ``path`` prune the FILE LIST at planning — the
    Python-source analogue of partition pruning; a query over one
    year's PDFs never opens the others. Unsupported filters are
    yielded back and Spark applies them post-scan (the v2 connector
    contract)."""

    def pushFilters(self, filters):
        for f in filters:
            if (
                isinstance(
                    f, (EqualTo, StringContains, StringStartsWith, StringEndsWith)
                )
                and tuple(f.attribute) == ("path",)
            ):
                self._path_filters.append(f)
            else:
                yield f
