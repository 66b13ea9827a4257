"""Sequence packing — GPT-style concat-and-chop for pretraining batches.

Pretraining consumes fixed-length token windows, not documents: the corpus
is concatenated in a deterministic order and chopped every ``ctx_len``
tokens (documents straddle boundaries; attention masking downstream is the
trainer's concern). The operator answers, per document, WHERE in that
stream it lands: which shard, its token offset, and the first/last context
window it touches — the bookkeeping a packing-aware loader or a
"which docs does window W contain" audit needs.

Distributed form: a single global concatenation order is a serial scan, so
the stream is SHARDED — shard = md5(doc_id) % n_shards, and the
concatenation order is (shard, doc_id). Each shard is packed
independently; window ids are (shard, pack_idx) pairs. This is the
standard trick: determinism and reproducibility of a global order, with
shard-width parallelism.

Scale shape (100 TB contract):
- token counting is a narrow projection (no Python);
- ONE exchange on the shard key; the per-shard running sum is a window
  cumsum over (shard | doc_id) — at web scale n_shards is O(cluster
  width × 4), so each window sort is partition-local;
- all arithmetic is exact integers (no float percentile semantics) so the
  same input gives the same packing on any engine, any cluster size.

Cross-engine: md5-hex -> int shard hash is the proven idiom of
deterministic_split/lang_mix_sample (queries.py:3025).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from language_identification_spark.operators.mixer import mix_hash


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each non-empty document its place in the packed token stream.

    Returns (doc_id, shard, n_tok, start_off, first_pack, last_pack,
    packs_spanned): token offsets are 0-based within the shard's stream;
    pack ids are 0-based window indices within the shard.
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        mix_hash(F.col(id_col), n_shards).cast("int").alias("shard"),
        F.size(words).cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("end_off", F.sum("n_tok").over(w))
    # integer DIV, not floor(double division): bigint/int goes through a
    # double, which loses exactness past 2^53 while DuckDB's // stays
    # exact — the "same packing on any engine" claim needs true integer
    # arithmetic (review finding)
    first_pack = F.expr(f"(end_off - n_tok) DIV {ctx_len}").cast("bigint")
    last_pack = F.expr(f"(end_off - 1) DIV {ctx_len}").cast("bigint")
    return cum.select(
        "doc_id",
        "shard",
        "n_tok",
        (F.col("end_off") - F.col("n_tok")).alias("start_off"),
        first_pack.alias("first_pack"),
        last_pack.alias("last_pack"),
        (last_pack - first_pack + 1).cast("bigint").alias("packs_spanned"),
    )
