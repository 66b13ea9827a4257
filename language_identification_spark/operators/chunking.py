"""Overlapping document chunking — retrieval/RAG corpus preparation.

Embedding indexes and retrieval corpora are built over fixed-size chunks
with overlap (window ``chunk_size`` tokens, stride ``stride`` < chunk_size
so boundary context is never lost), not whole documents. Chunk start
offsets are 0, stride, 2*stride, ... with

    n_chunks = 1 + ceil(max(0, n_tok - chunk_size) / stride)

so every token is covered and only the last chunk may run short. All
arithmetic is exact integers (`ceil(a/b)` spelled `(a + b - 1) // b`), so
any engine produces the identical chunking.

Scale shape: ZERO exchanges — tokenize, sequence(), explode, slice,
array_join are all narrow whole-stage-codegen expressions; output rows =
input rows × per-doc chunk count (bounded by doc length / stride). The
chunk fingerprint is md5 of the joined chunk text — the proven
cross-engine primitive (module docstring, queries.py) — so downstream
chunk-level dedup composes with the exact_dedup family without
re-tokenizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each non-empty document into overlapping token-window chunks.

    Returns (doc_id, chunk_idx, start_tok, chunk_len, chunk_md5).
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        raise ValueError("stride > chunk_size would skip tokens")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("words"),
        F.size(words).cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    # integer DIV (not floor of double division) — same exactness
    # discipline as pack_sequences
    n_chunks = F.lit(1) + F.expr(
        f"(greatest(n_tok - {chunk_size}, 0) + {stride - 1}) DIV {stride}"
    )
    chunked = base.select(
        "doc_id",
        "words",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    ).withColumn("start_tok", (F.col("chunk_idx") * stride).cast("bigint"))
    chunk_words = F.slice(
        F.col("words"), F.col("start_tok").cast("int") + 1, chunk_size
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "start_tok",
        F.size(chunk_words).cast("bigint").alias("chunk_len"),
        F.md5(
            F.array_join(chunk_words, " ").cast("binary")
        ).alias("chunk_md5"),
    )
