"""Deterministic data-mixing sampler — per-language keep rates by hash.

Training mixes are specified as per-language (or per-source) sampling
weights ("keep 25% of English, all of Burmese"); applying them with
``rand()`` makes every retry, resume, and re-run produce a different
corpus. The standard fix is a content-independent hash threshold: doc is
kept iff ``h(doc) < weight * D`` for a fixed denominator D — reproducible
across runs, machines, engines, AND monotone in the weight (raising a
language's weight only ADDS documents, never swaps them — so mix
ablations share their common subset, the property curriculum studies
rely on).

Hash primitive: first 8 hex digits of md5 of the id rendered as a decimal
string, mod D — the same cross-engine-proven construction as the
deterministic train/val/test split gate (queries.py:q_deterministic_split).

Scale shape: pure narrow map (one md5 + compare per row, whole-stage
codegen, no Python, no shuffle). The downstream ``filter(mix_keep)`` is a
pushable predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIX_DENOM = 1_000_000


def mix_hash(id_col: Column, denom: int = MIX_DENOM) -> Column:
    """Deterministic uniform bucket in [0, denom) from the id."""
    return (
        F.conv(
            F.substring(F.md5(id_col.cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % denom
    )


def lang_mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    denom: int = MIX_DENOM,
) -> DataFrame:
    """Add ``mix_bucket`` (the hash) and ``mix_keep`` (bucket < weight*D).
    Thresholds are precomputed driver-side as exact integers — no float
    comparison happens per row, so both engines agree at the boundary."""
    thresholds = {
        lang: int(round(w * denom)) for lang, w in sorted(weights.items())
    }
    thr: Column = F.lit(int(round(default_weight * denom)))
    for lang, t in thresholds.items():
        thr = F.when(F.col(lang_col) == lang, F.lit(t)).otherwise(thr)
    bucket = mix_hash(F.col(id_col), denom)
    return df.withColumn("mix_bucket", bucket).withColumn(
        "mix_keep", F.col("mix_bucket") < thr
    )


def temperature_mix_sample(
    df: DataFrame,
    alpha: float = 0.5,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    denom: int = MIX_DENOM,
) -> DataFrame:
    """Temperature-flattened multilingual sampling (the XLM-R alpha-sampling
    family, Conneau et al. 2020): derive per-language keep-rates FROM the
    corpus so post-sample counts are proportional to count^alpha. With the
    smallest language kept in full, the rate is

        r_lang = (n_min / n_lang) ** (1 - alpha)

    (head languages down-sampled toward the flattened distribution, tail
    languages untouched) applied through the same deterministic hash
    threshold as ``lang_mix_sample`` — reproducible, resumable, monotone.

    Cross-engine exactness: at the default alpha=0.5 the rate is
    ``sqrt(n_min / n_lang)`` — one IEEE-exactly-rounded divide, one
    exactly-rounded sqrt, one exactly-rounded multiply by denom, then
    floor: bit-identical in Spark and DuckDB, so the integer threshold
    (and every boundary keep decision) hash-matches. Other alphas go
    through pow(), which is NOT guaranteed correctly rounded across
    libm implementations — supported, but excluded from the hash gate.

    Scale shape: one tiny per-language count exchange, the |langs|-row
    rate table broadcast back, then a pure narrow map (one md5 + integer
    compare per row). The corpus never shuffles.
    """
    counts = df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_docs").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .withColumn(
            "mix_thr", F.floor(rate * F.lit(denom)).cast("long")
        )
        .select(lang_col, "n_docs", "mix_thr")
    )
    out = df.join(F.broadcast(rates), lang_col)
    bucket = mix_hash(F.col(id_col), denom)
    return out.withColumn("mix_bucket", bucket).withColumn(
        "mix_keep", F.col("mix_bucket") < F.col("mix_thr")
    )


def host_disjoint_split(
    df: DataFrame,
    host_col: str = "host",
    bounds: tuple[int, int] = (80, 90),
    denom: int = 100,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: the assignment is a function of
    the HOST, not the document, so every page from one site lands in
    exactly one split. Doc-level hash splits (q_deterministic_split) leak
    through near-duplicates — mirrored/templated pages within a site land
    on both sides of the train/test boundary and inflate eval scores. The
    standard fix (used for quality-classifier eval sets and dedup-audited
    benchmark splits) is to split on the site key: group-disjoint by
    construction, no join, no shuffle — still a pure narrow map.

    Same md5 construction as ``mix_hash`` (cross-engine proven in the
    deterministic_split gate); monotone bounds give nested 80/10/10.
    """
    b = mix_hash(F.col(host_col), denom)
    split = (
        F.when(b < bounds[0], "train")
        .when(b < bounds[1], "val")
        .otherwise("test")
    )
    return df.withColumn(split_col, split)
