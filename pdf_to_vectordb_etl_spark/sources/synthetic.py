"""Deterministic synthetic ENEM-style corpus (no PDFs, no RNG).

Generates page-grain rows shaped like the reference's PyMuPDF page scan
output (reference enem_pdf_extractor.py:231-266) so the whole parse
pipeline can be tested hermetically. Every value is a pure function of
(year, day, color, question number) — same corpus on every run.

Faithfully reproduced text quirks (FIXTURES.md §1):
- cover page 0 with no questions (reference :410 skips it);
- header junk + barcode tokens ``*XXXXXXXXX*`` before the first question
  (reference :44-45 scrub, :243 header strip);
- doubled-letter alternative markers ``A \nA text`` that the parser must
  collapse to ``A)text`` (reference :116-137);
- occasional lowercase ``Questão`` delimiter (reference :237);
- essay pages with zero questions (reference :238-241);
- image pages whose questions are counted but not emitted in no-images
  mode (reference :250-258);
- malformed questions with <5 alternatives -> sentinel drop
  (reference :129-137,:457-460);
- answer-key (GB) docs: page 0 only, alternating number/letter lines
  plus long junk lines that the ``^.{4,}$`` scrub removes
  (reference :963-964);
- a few key slots intentionally missing -> NULL answer
  (reference :210,:227 sentinel path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGE_SCHEMA

QUESTIONS_PER_PAGE = 5
D1_MAX_INTERNAL = 95  # eng 1-5, spani 6-10, lang 11-50, huma 51-95
D2_MAX_INTERNAL = 91  # natu 1-45, math 46-91

ALT_WORDS = ["unifica", "divide", "expande", "reduz", "mantem"]
STEM_WORDS = [
    "A sessao do comite discute o tema",
    "O texto a seguir apresenta a questao",
    "Considere o fragmento e responda",
    "Analise o grafico apresentado sobre",
]


def printed_num(day: str, internal: int) -> int:
    """Internal counter -> exam-printed numbering.

    D1 subtracts 5 when internal > 5 (English 1-5 and Spanish 6-10 share
    printed slots 1-5; reference enem_pdf_extractor.py:342-343,:192-193);
    D2 adds 90 (reference :344-345).
    """
    if day == "D1":
        return internal - 5 if internal > 5 else internal
    return internal + 90


def answer_letter(year: int, day: int | str, num: int) -> str:
    """Deterministic key letter for printed question ``num``."""
    d = 1 if day in (1, "D1") else 2
    return "ABCDE"[(num * 7 + year * 3 + d) % 5]


def _is_image_page(year: int, day: str, page: int) -> bool:
    # every 7th content page carries images (counted, skipped in no-images mode)
    return (page + year + (1 if day == "D1" else 2)) % 7 == 0


def _is_malformed(year: int, day: str, internal: int) -> bool:
    # every 23rd question has image alternatives -> <5 markers -> sentinel
    return (internal * 31 + year) % 23 == 0


def _question_block(year: int, day: str, internal: int) -> str:
    num = printed_num(day, internal)
    delim = "Questão" if internal % 17 == 0 else "QUESTÃO"  # X6 canonicalization case
    stem = STEM_WORDS[internal % len(STEM_WORDS)]
    lines = [f"{delim} {num:02d}", f"{stem} numero {num} do ano {year}."]
    n_alts = 2 if _is_malformed(year, day, internal) else 5
    for i in range(n_alts):
        letter = "ABCDE"[i]
        # doubled-letter raw-PDF artifact: "A \nA <text>" (reference :121)
        lines.append(f"{letter} \n{letter} {ALT_WORDS[i]} da ideia {num}")
    return "\n".join(lines) + "\n"


def generate_pv_pages(year: int, day: str, color: str = "CD1") -> list[dict]:
    """All pages of one test (PV) document, page 0 = cover."""
    doc_id = f"{year}_PV_impresso_{day}_{color}"
    path = f"/corpus/{year}/{doc_id}.pdf"
    max_internal = D1_MAX_INTERNAL if day == "D1" else D2_MAX_INTERNAL

    def row(page_index: int, text: str, n_images: int) -> dict:
        return {
            "doc_id": doc_id,
            "path": path,
            "year": year,
            "kind": "PV",
            "day": day,
            "color": color,
            "page_index": page_index,
            "page_text": text,
            "n_images": n_images,
            "image_names": None,
        }

    pages = [row(0, f"CADERNO {year} {day} {color} PROVA - capa, sem questoes.", 0)]
    internal = 1
    page_index = 1
    while internal <= max_internal:
        hi = min(internal + QUESTIONS_PER_PAGE - 1, max_internal)
        blocks = [_question_block(year, day, i) for i in range(internal, hi + 1)]
        header = f"ENEM {year} {day} pagina {page_index} *ABCDEFGHI* *ABCDEFGHIJ*\n"
        text = header + "".join(blocks)
        n_images = 2 if _is_image_page(year, day, page_index) else 0
        pages.append(row(page_index, text, n_images))
        internal = hi + 1
        page_index += 1
        # every 9th page position is a question-less essay page (F1 path)
        if page_index % 9 == 0:
            pages.append(row(page_index, "PROPOSTA DE REDACAO - texto motivador.", 0))
            page_index += 1
    return pages


def generate_gb_pages(year: int, day: str, color: str = "CD1") -> list[dict]:
    """Answer-key (GB) doc: page 0 only, number/letter alternating lines
    plus junk lines of >=4 chars (removed by the X17 scrub)."""
    doc_id = f"{year}_GB_impresso_{day}_{color}"
    max_internal = D1_MAX_INTERNAL if day == "D1" else D2_MAX_INTERNAL
    # printed slot space: D1 1..90 (eng/spa share 1-5), D2 91..181
    nums = sorted({printed_num(day, i) for i in range(1, max_internal + 1)})
    lines = [f"GABARITO OFICIAL {year} {day} {color}"]
    for num in nums:
        if (num * 13 + year) % 29 == 0:  # missing slot -> NULL answer path
            continue
        lines.append(str(num))
        lines.append(answer_letter(year, day, num))
        if num % 11 == 0:
            lines.append("LINHA DE RODAPE INUTIL")  # junk >4 chars, scrubbed
    return [
        {
            "doc_id": doc_id,
            "path": f"/corpus/{year}/{doc_id}.pdf",
            "year": year,
            "kind": "GB",
            "day": day,
            "color": color,
            "page_index": 0,
            "page_text": "\n".join(lines),
            "n_images": 0,
            "image_names": None,
        }
    ]


def generate_corpus_rows(
    years: tuple[int, ...] = (2022, 2023), days: tuple[str, ...] = ("D1", "D2")
) -> list[dict]:
    rows: list[dict] = []
    for year in years:
        for day in days:
            rows.extend(generate_pv_pages(year, day))
            rows.extend(generate_gb_pages(year, day))
    return rows


def corpus_df(spark: SparkSession, years=(2022, 2023), days=("D1", "D2")) -> DataFrame:
    """Page-grain DataFrame of the synthetic corpus (PV + GB docs)."""
    return spark.createDataFrame(generate_corpus_rows(years, days), PAGE_SCHEMA)


def expected_question_counts(years=(2022, 2023), days=("D1", "D2")) -> dict:
    """Ground-truth (year, subject) -> emitted-question count, mirroring the
    pipeline rules in pure Python (test oracle, independent of Spark)."""
    from ..schemas import SUBJECT_RANGES

    counts: dict[tuple[int, str], int] = {}
    for year in years:
        for day in days:
            pages = generate_pv_pages(year, day)
            internal = 0
            for p in sorted(pages, key=lambda r: r["page_index"]):
                txt = p["page_text"]
                n_q = txt.count("QUESTÃO") + txt.count("Questão")
                first = internal + 1
                internal += n_q
                if p["n_images"] and p["n_images"] > 0:
                    continue  # counted but not emitted (F2)
                for k in range(n_q):
                    i = first + k
                    if _is_malformed(year, day, i):
                        continue  # sentinel drop (F5)
                    subject = next(
                        s for d, s, lo, hi in SUBJECT_RANGES if d == day and lo <= i <= hi
                    )
                    counts[(year, subject)] = counts.get((year, subject), 0) + 1
    return counts


def synthetic_pdf_decoder(path: str, content: bytes) -> list[dict]:
    """``sources.pdf.PageDecoder`` that serves the deterministic corpus
    keyed by filename tokens — lets the path-based API (``api.py``) run
    end-to-end through a real ``binaryFile`` scan + ``mapInPandas``
    explode without PyMuPDF: a placeholder file named
    ``{year}_{PV|GB}_impresso_{day}_{color}.pdf`` decodes to exactly the
    pages ``corpus_df`` would generate for those tokens."""
    import re

    tail = path.rsplit("/", 1)[-1]
    year = int(re.search(r"20\d\d", tail).group())
    day = re.search(r"D[12]", tail).group()
    color = re.search(r"CD\d", tail).group()
    gen = generate_gb_pages if "GB" in tail else generate_pv_pages
    return [
        {k: p[k] for k in ("page_index", "page_text", "n_images", "image_names")}
        for p in gen(year, day, color)
    ]
