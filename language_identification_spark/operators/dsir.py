"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023).

The standard recipe for choosing pretraining data that LOOKS LIKE a trusted
target corpus: featurize every document as hashed n-gram counts, fit bag-of-
words multinomials on the target and raw distributions, weight each raw
document by its log-likelihood ratio, and resample via Gumbel top-k. This is
the data-mixing counterpart of the quality rules — rules drop garbage, DSIR
shifts the REMAINING mass toward the target domain.

Determinism/cross-engine design (the DuckDB oracle replays every step):

- features: word unigrams + bigrams of ``split(lower(text), ' ')`` (the
  corpus-wide word idiom every other gate uses), hashed into ``n_buckets``
  by md5-slice — bucket = hex[0:6] mod B, same draw both engines.
- log-ratio table: from integer bucket counts, lr_b = ln((tc_b+1)/(T+B)) -
  ln((rc_b+1)/(R+B)) (add-one smoothing), QUANTIZED to round(lr * 1e6) as
  int64. Every downstream doc score is then an exact integer sum — immune
  to float summation-order divergence between engines; the only float op
  left is one ln per bucket on identical rationals.
- doc score: sum of quantized ratios over the doc's gram instances,
  computed with a zero-shuffle array aggregate against the broadcast-
  literal ratio table (B is small BY CONSTRUCTION — 10^4-10^6 in the paper;
  the table is the model, never corpus-sized).
- resampling: Gumbel top-k with hash-derived noise — u in (0,1) from
  md5('dsir:' || doc_id), g = -ln(-ln(u)), key = logw + g. Deterministic,
  reproducible across runs AND engines, and statistically the paper's
  sampling-without-replacement scheme.

Scale shape: training is ONE exchange carrying at most B rows per mapper
(map-side combined bucket counts with a target/raw flag); scoring is a pure
narrow map (array transform + integer aggregate per row); selection is a
TopK (TakeOrderedAndProject at the gate's k, or a threshold filter for the
keep-everything-above-quantile production form). Nothing corpus-sized
shuffles, broadcasts, or collects.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256
QUANT = 1_000_000  # log-ratio fixed-point scale


def grams_col(text_col: str) -> Column:
    """array<string> of word unigrams + bigrams ('w1 w2') in position order."""
    ws = f"filter(split(lower({text_col}), ' '), w -> w != '')"
    # let-bind the token array via a single-element transform so the split
    # runs once per row — inlined, each element_at() re-evaluated the whole
    # split per element (no CSE inside HOF lambdas: the content_blocks
    # lesson, operators/blocks.py), O(T^2) chars per doc
    return F.expr(
        f"""transform(array({ws}), toks -> concat(
            toks,
            CASE WHEN size(toks) >= 2
                 THEN transform(sequence(1, size(toks) - 1),
                      i -> concat(element_at(toks, i), ' ',
                                  element_at(toks, i + 1)))
                 ELSE array() END))[0]"""
    )


def _bucket(gram: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, 6), 16, 10).cast(
            "bigint"
        )
        % N_BUCKETS
    )


def train_dsir(
    docs: DataFrame, is_target: Column, text_col: str = "text"
) -> list[int]:
    """Quantized log-ratio per bucket (index = bucket id), from ONE pass:
    explode grams with a target flag, count per (bucket), combine map-side
    to <= B rows per mapper, collect B rows, smooth + quantize on the
    driver. Buckets no gram ever hit still get the (0-count) smoothed
    ratio."""
    counts = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            is_target.cast("bigint").alias("t"),
            F.explode(grams_col(text_col)).alias("gram"),
        )
        .groupBy(_bucket(F.col("gram")).alias("b"))
        .agg(
            F.sum("t").alias("tc"),
            F.count("*").alias("rc"),
        )
        .collect()
    )
    tc = [0] * N_BUCKETS
    rc = [0] * N_BUCKETS
    for row in counts:
        tc[row.b] = row.tc
        rc[row.b] = row.rc
    t_total, r_total = sum(tc), sum(rc)
    return [
        round(
            QUANT
            * (
                math.log((tc[b] + 1) / (t_total + N_BUCKETS))
                - math.log((rc[b] + 1) / (r_total + N_BUCKETS))
            )
        )
        for b in range(N_BUCKETS)
    ]


def dsir_score(
    docs: DataFrame, ratios_q: list[int], text_col: str = "text"
) -> DataFrame:
    """+ (logw_q int64, logw, gumbel_key) per non-null-text document. Pure
    narrow map: the ratio table rides along as an array literal (the model
    is B numbers), the per-doc sum is an exact integer aggregate."""
    arr = F.array(*[F.lit(int(q)).cast("bigint") for q in ratios_q])
    scored = docs.filter(F.col(text_col).isNotNull()).withColumn(
        "logw_q",
        F.aggregate(
            F.transform(
                grams_col(text_col),
                lambda g: F.element_at(arr, (_bucket(g) + 1).cast("int")),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    # hash-derived uniform in (0,1): (h32 + 1) / (2^32 + 1) never hits 0/1
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dsir:"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    return scored.withColumn(
        "logw", F.col("logw_q") / QUANT
    ).withColumn("gumbel_key", F.col("logw") - F.log(-F.log(u)))


def dsir_select(
    docs: DataFrame,
    ratios_q: list[int],
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """Gumbel top-k selection: the k docs whose (importance + noise) keys
    win — the paper's importance resampling without replacement. Global
    TopK, so Spark plans TakeOrderedAndProject (per-partition heaps, never
    a full sort)."""
    scored = dsir_score(docs, ratios_q, text_col)
    return (
        scored.select(
            "doc_id",
            F.round("logw", 6).alias("logw"),
            F.round("gumbel_key", 6).alias("gumbel_key"),
        )
        .orderBy(F.col("gumbel_key").desc(), F.col("doc_id"))
        .limit(k)
        # rank window runs over the k surviving rows only (single tiny
        # partition) — the corpus-wide ordering was already TopK'd above
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("gumbel_key").desc(), F.col("doc_id")))
            .cast("int"),
        )
    )
