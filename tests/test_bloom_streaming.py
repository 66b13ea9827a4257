"""Streaming Bloom dedup (streaming/jobs.py:streaming_bloom_dedup).

Parity contract: the Python addressing twin equals the batch expression's
(shard, word_idx, mask) draws; the streamed verdicts equal a sequential
Python oracle inserting keys in doc_id order; state stays at its fixed
size; and repeated content coming later in the stream flags maybe_dup.
"""

import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.bloomdedup import (
    M_BITS,
    N_SHARDS,
    WORD_BITS,
    _positions,
)
from language_identification_spark.streaming.jobs import (
    bloom_positions,
    run_stream_once,
    streaming_bloom_dedup,
)


def test_python_addressing_equals_batch_expression(spark):
    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    batch = {}
    for r in _positions(df, "key").collect():
        batch.setdefault(r.key, (r.shard, set()))[1].add(
            r.word_idx * WORD_BITS + _mask_bit(r.mask)
        )
    for k in keys:
        shard, poss = bloom_positions(k)
        assert shard == batch[k][0], k
        assert set(poss) == batch[k][1], k


def _mask_bit(mask: int) -> int:
    return mask.bit_length() - 1


def _sequential_oracle(rows):
    """(doc_id, key) in doc_id order per shard -> {doc_id: maybe_dup}."""
    n_words = (M_BITS + WORD_BITS - 1) // WORD_BITS
    shards = {s: [0] * n_words for s in range(N_SHARDS)}
    out = {}
    for doc_id, key in sorted(rows):
        shard, poss = bloom_positions(key)
        words = shards[shard]
        out[doc_id] = all(
            words[p // WORD_BITS] >> (p % WORD_BITS) & 1 for p in poss
        )
        for p in poss:
            words[p // WORD_BITS] |= 1 << (p % WORD_BITS)
    return out


def test_stream_matches_sequential_oracle(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        # duplicate a slice of the corpus under later doc_ids so true
        # repeats exist in-stream
        .unionByName(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter(F.col("doc_id") % 7 == 0)
            .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        )
    )
    src = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(src)

    got = {
        r.doc_id: r.maybe_dup
        for r in run_stream_once(
            streaming_bloom_dedup(spark, src),
            str(tmp_path / "ckpt_bloom"),
            "bloom_stream",
        ).collect()
    }

    rows = [
        (r.doc_id, r.key)
        for r in docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.md5(F.col("text").cast("binary")).alias("key"))
        .collect()
    ]
    want = _sequential_oracle(rows)
    assert got == want
    # every injected duplicate must flag (no false negatives on repeats)
    assert all(got[d] for d in got if d >= 1_000_000)
    # and the verdicts are not all-true (the filter isn't saturated)
    assert sum(not v for v in got.values()) > 100
