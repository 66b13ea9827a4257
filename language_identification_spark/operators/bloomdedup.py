"""Sharded Bloom-filter membership — cross-snapshot dedup without a join.

The dedup operators in queries.py (exact_dedup, url_dedup, the LSH family)
deduplicate WITHIN one corpus snapshot: every path ends in a shuffle keyed
by the content hash, so checking a fresh crawl batch against 10^12 already-
ingested documents would re-shuffle the historical corpus every time. The
standard fix (CCNet's per-shard hash sets, Dolma's Bloom-filter deduper) is
to fold history ONCE into a compact probabilistic membership structure and
check new batches against that — history is never touched again.

Design (cross-engine exact, so the DuckDB oracle replays it bit-for-bit):

- key: caller-chosen string (md5(text) content hash, canonical url, ...).
- addressing: one md5 over the key supplies all randomness — hex[0:4]
  (16 bits) mod ``n_shards`` picks the shard, hex[4+6i : 10+6i] (24 bits
  each, i < k) mod ``m_bits`` pick the k bit positions within the shard.
  k <= 4 keeps every draw inside the 32-hex-digit budget; m_bits <= 2^24.
- storage: 32 bits per word in a BIGINT (sign-safe in Spark, DuckDB, and
  parquet alike — a 1<<63 mask would overflow DuckDB's signed shift), so a
  shard is ``ceil(m_bits / 32)`` (shard, word_idx, word) rows.

Build is ONE aggregation: explode k (shard, word_idx, mask) rows per key,
bit_or(mask) by (shard, word_idx) — partial-aggregated map-side, so the
exchange carries at most n_shards * words_per_shard rows per mapper no
matter how many keys went in. Check is ONE equi-join of the batch's
exploded positions against the filter table on (shard, word_idx) — the
historical CORPUS never appears; only its fixed-size bit table does. At
test scale the filter table auto-broadcasts; at 10^12 keys (~1.5 TB of
bits at 1% FPR) broadcast is impossible BY DESIGN: both sides arrive
pre-hashed on (shard, word_idx), so the sort-merge join co-partitions the
batch against filter shards and each executor holds only its slice. That
sharding — rather than one flat bit array — is the whole point.

Semantics: maybe_dup = every one of the k bits is set. False positives at
the classical (1 - e^{-kn/m})^k rate are POSSIBLE and deterministic (both
engines hash identically); false negatives are impossible. Callers route
maybe_dup rows to an exact confirm (e.g. exact_dedup's hash join) and pass
the definite-new majority straight through.

Reference anchor: the reference deduplicates via Python set() membership
per process (langid/*.py training loops); this is that operation's
distributed, bounded-memory form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SHARDS = 8
M_BITS = 4096  # bits per shard
K_HASHES = 3
WORD_BITS = 32


def _positions(df: DataFrame, key_col: str) -> DataFrame:
    """One row per (key, hash_i): shard, word_idx, mask. The single md5 is
    computed once per key; each draw slices disjoint hex digits."""
    hexed = df.withColumn("_h", F.md5(F.col(key_col).cast("binary")))
    rows = hexed.select(
        F.col(key_col).alias("key"),
        (
            F.conv(F.substring("_h", 1, 4), 16, 10).cast("bigint")
            % N_SHARDS
        ).alias("shard"),
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring("_h", 5 + 6 * i, 6), 16, 10
                        ).cast("bigint")
                        % M_BITS
                    )
                    for i in range(K_HASHES)
                ]
            )
        ).alias("pos"),
    )
    return rows.select(
        "key",
        "shard",
        (F.col("pos") / WORD_BITS).cast("bigint").alias("word_idx"),
        # shiftleft's amount must be a literal in the Python API -> expr
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
        ).alias("mask"),
    )


def bloom_build(history: DataFrame, key_col: str) -> DataFrame:
    """Fold a history corpus into the sharded filter table:
    (shard, word_idx, word) with word = bit_or of every member mask.
    One exchange, map-side combined to <= n_shards * words rows/mapper."""
    return (
        _positions(history, key_col)
        .groupBy("shard", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_check(
    batch: DataFrame, filter_df: DataFrame, key_col: str
) -> DataFrame:
    """(key, maybe_dup) per DISTINCT batch key: maybe_dup = all k addressed
    bits set in the filter. A missing (shard, word_idx) row means those
    bits are zero (left join -> null -> not set)."""
    probes = _positions(batch.select(key_col).distinct(), key_col)
    hit = (
        F.col("word").isNotNull()
        & (F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"))
    ).cast("int")
    return (
        probes.join(filter_df, ["shard", "word_idx"], "left")
        .groupBy("key")
        .agg((F.min(hit) == 1).alias("maybe_dup"))
        .withColumnRenamed("key", key_col)
    )
