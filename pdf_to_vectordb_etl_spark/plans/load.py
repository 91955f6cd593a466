"""Load lifecycle: questions -> vector table -> search (SURVEY §3.1
steps 3-4, reference ``QdrantTextLoader.dict_to_vectorDB``
qdrant_text_loader.py:242-324 and ``QDvector_search`` :122-142).

The reference collapses questions into per-subject strings, re-splits
them into chunks, embeds one chunk per HTTPS call, and upserts with
count-continuation IDs. Here the question-grain DataFrame flows
straight through: template -> embed (native deterministic or batched
client UDF) -> deterministic IDs -> payload shaping -> idempotent
parquet vector table -> brute-force/IVF cosine search over it. The
chunk re-split exists only as the golden-parity *view* (operators/
chunking.py), not as a lossy intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import sinks
from ..functions.textops import txt_record
from ..operators import embedding, topk


def questions_to_points(
    questions: DataFrame,
    dim: int = 64,
    embed_fn=None,
    id_mode: str = "hash",
) -> DataFrame:
    """Question records -> vector points (id, vector, payload).

    ``embed_fn=None`` uses the hermetic native embedder; pass a
    ``callable(list[str]) -> list[list[float]]`` (e.g. an OpenAI
    client) for real embeddings via the batched pandas UDF."""
    txt = questions.withColumn(
        "txt",
        txt_record(
            F.col("year").cast("string"),
            F.col("question_text"),
            F.coalesce(F.col("correct_answer"), F.lit("não achou a questão")),
        ),
    )
    if embed_fn is None:
        vec = embedding.deterministic_embedding(F.col("txt"), dim=dim)
        embedded = txt.withColumn("vector", vec)
    else:
        embedded = embedding.embed_with_client(
            txt, embed_fn, text_col="txt", out_col="vector", dim=dim
        )
    with_ids = embedding.assign_ids(embedded, natural_key=("ID", "subject"), mode=id_mode)
    return embedding.vector_points(
        with_ids, text_col="txt", subject_col="subject", year_col="year"
    )


def load_questions(
    questions: DataFrame, table_path: str, dim: int = 64, embed_fn=None
) -> None:
    """O5/O6 — materialize the vector collection (idempotent: hash IDs +
    dedup-on-read; a retried load rewrites identical rows)."""
    points = questions_to_points(questions, dim=dim, embed_fn=embed_fn)
    sinks.write_embeddings_table(points, table_path)


def search_text(
    spark: SparkSession,
    table_path: str,
    query_text: str,
    k: int = 1,
    dim: int = 64,
    subject: str | None = None,
) -> DataFrame:
    """kNN read path (K1/K2): embed the query text with the same
    embedder, scan the collection, return top-k by cosine. ``subject``
    pushes a payload filter below the scan (partition/row-group
    pruning on a partitioned collection)."""
    corpus = sinks.read_embeddings_table(spark, table_path)
    if subject is not None:
        corpus = corpus.filter(F.col("payload.metadata.materia") == subject)
    corpus = topk.dim_guard(corpus, "vector", dim)  # K2
    qvec_row = (
        spark.range(1)
        .select(
            embedding.deterministic_embedding(F.lit(query_text), dim=dim).alias("v")
        )
        .first()
    )
    out = topk.topk_cosine(corpus, list(qvec_row["v"]), k=k, vec_col="vector", id_col="id")
    return out.join(
        sinks.read_embeddings_table(spark, table_path).select(
            "id", "payload.page_content", "payload.metadata.materia", "payload.metadata.ano"
        ),
        "id",
    )
