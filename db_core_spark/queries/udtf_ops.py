"""Python UDTF surface (Spark 4): table functions that fan one input row out
to many output rows with per-row Python logic. Goal-derived (SURVEY.md §2C —
the reference has no UDF/UDTF surface of any kind).

The flagship is LLM-context chunking: split each document into overlapping
fixed-size token windows — the preprocessing shape of every RAG / training
tokenization pipeline. The UDTF runs via a SQL LATERAL join, so Spark
schedules it per-partition next to the data (fan-out never shuffles the
corpus; only the emitted chunks move on).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

from db_core_spark.registry import query
from db_core_spark.tables import table

CHUNK_SIZE, OVERLAP = 40, 10  # tokens; step = 30


@udtf(returnType="chunk_no int, n_tokens int, chunk_digest string", useArrow=True)
class ChunkDocument:
    """Overlapping token-window chunker. Emits one row per chunk; the final
    partial window is kept iff it starts before the text ends (standard
    stride semantics: starts at 0, step, 2*step, ... < n_tokens)."""

    def eval(self, text: str, chunk_size: int, overlap: int):  # noqa: D102
        toks = text.split()
        step = chunk_size - overlap
        i, chunk_no = 0, 0
        while i < len(toks):
            window = toks[i : i + chunk_size]
            digest = hashlib.sha256(" ".join(window).encode()).hexdigest()
            yield chunk_no, len(window), digest
            i += step
            chunk_no += 1


@query(
    "udtf_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t
      FROM documents WHERE doc_id <= 100),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_no,
             t[(i * {CHUNK_SIZE - OVERLAP} + 1):(i * {CHUNK_SIZE - OVERLAP} + {CHUNK_SIZE})] AS w
      FROM toks, UNNEST(range(0, 1 + (len(t) - 1) // {CHUNK_SIZE - OVERLAP})) AS u(i))
    SELECT doc_id, chunk_no,
           CAST(len(w) AS INT) AS n_tokens,
           sha256(array_to_string(w, ' ')) AS chunk_digest
    FROM chunks
    """,
    category="udf",
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-context chunking via Python UDTF + LATERAL join: 40-token windows
    with 10-token overlap, digest per chunk. The lateral fan-out happens
    inside the scanning task — at 100 TB the corpus never reshuffles, and
    emitted rows are 2 ints + a 64-char digest, not the chunk text."""
    spark.udtf.register("chunk_document", ChunkDocument)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_no, c.n_tokens, c.chunk_digest
        FROM _udtf_docs d, LATERAL chunk_document(d.text, {CHUNK_SIZE}, {OVERLAP}) c
        """
    )
