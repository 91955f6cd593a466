"""Filename-convention expressions (SURVEY §2.8 X1-X5, X16).

The reference encodes year/day/color/kind in INEP file names and parses
them with ad-hoc regex/`in` checks (reference enem_pdf_extractor.py:40,
:49,:80-110,:979-980; pdf_to_qdrant_etl.py:50-64; qdrant_text_loader.py:
26-27,:174-185). Here each is a pure Column expression so Catalyst can
constant-fold and push them into scans.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def year_of(name: Column | str) -> Column:
    """X1 — first ``20\\d{2}`` token as int (reference :40,:979-980)."""
    return F.regexp_extract(F.col(name) if isinstance(name, str) else name, r"20\d{2}", 0).cast(
        "int"
    )


def subject_of(name: Column | str) -> Column:
    """X2 — ``_(.{3,}?)_`` lazy token (reference qdrant_text_loader.py:27,:182-185)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_extract(c, r"_(.{3,}?)_", 1)


def day_of(name: Column | str) -> Column:
    """X3 — ``D[12]`` token (reference pdf_to_qdrant_etl.py:50,:63)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_extract(c, r"D[12]", 0)


def color_of(name: Column | str) -> Column:
    """X3 — ``CD[1-9]`` token (reference pdf_to_qdrant_etl.py:51,:64)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_extract(c, r"CD[1-9]", 0)


def is_pdf_name(name: Column | str) -> Column:
    """X5 — case-normalized ``.pdf`` suffix test (reference pdf_to_qdrant_etl.py:42)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.lower(c).endswith(".pdf")


def file_tail(path: Column | str) -> Column:
    """X16 — path tail after the last ``/`` (reference qdrant_text_loader.py:174-175)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.element_at(F.split(c, "/"), -1)
