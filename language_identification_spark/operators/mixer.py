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


def waterfill_allocation(counts: DataFrame, budget: Column) -> DataFrame:
    """Token-budget waterfilling: split a training budget across sources.

    Input: one row per source with (key, avail, weight) — available
    tokens and a positive integer mixing weight. Target allocation is
    proportional to weight, but a source cannot contribute more than it
    has; its surplus re-flows to the unsaturated sources (the
    Llama/GPT-style data-mix allocation step; 'waterfilling' from the
    information-theory power-allocation analogue).

    CLOSED FORM, no iteration: sort sources by saturation ratio
    a_k/w_k; the saturated set is always a prefix, and row k belongs to
    it iff  a_k * W_k <= (B - A_k) * w_k  where A_k = sum of avail over
    strictly-earlier rows and W_k = suffix weight sum including k — an
    exact-rational (cross-multiplied, overflow-safe at corpus scale:
    tokens ~ 1e12, weights ~ 1e6 -> products < 2^63) per-row test over
    dim-bounded prefix/suffix sums. Those sums come from a dim self-join
    (|sources|^2 rows, |sources| ~ languages/domains ~ 10-100), NOT a
    window — windowless by construction like the rest of the battery.
    The final water level r (ppm) spreads the remaining budget over the
    unsaturated suffix; floor-division slack means sum(alloc) <= B with
    deficit < |sources| tokens.

    Returns (key..., avail, weight, saturated, alloc, r_ppm).

    The source dim feeds three consumers (self-join left/right + totals);
    Catalyst does not reuse the upstream aggregate's exchange across
    them, so when ``counts`` is corpus-derived the corpus would be
    scanned three times — the dim is therefore localCheckpoint'ed lazily
    (the mirrors/linkgraph compute-once pattern): one corpus pass, a
    |sources|-row materialization, cleaned by the reference tracker.
    """
    d = (
        counts.select(
            F.col("key"),
            F.col("avail").cast("long"),
            F.col("weight").cast("long"),
        )
        .where(F.col("weight") > 0)
        .localCheckpoint(eager=False)
    )
    left = d.alias("l")
    right = d.alias("r")
    # strict (ratio, key) ordering via exact cross-multiplied rationals:
    # a_r/w_r < a_l/w_l  <=>  a_r*w_l < a_l*w_r
    earlier = (
        F.col("r.avail") * F.col("l.weight")
        < F.col("l.avail") * F.col("r.weight")
    ) | (
        (
            F.col("r.avail") * F.col("l.weight")
            == F.col("l.avail") * F.col("r.weight")
        )
        & (F.col("r.key") < F.col("l.key"))
    )
    sums = (
        left.join(F.broadcast(right), earlier, "left")
        .groupBy("l.key", "l.avail", "l.weight")
        .agg(
            F.coalesce(F.sum("r.avail"), F.lit(0)).alias("a_prefix"),
            F.coalesce(F.sum("r.weight"), F.lit(0)).alias("w_prefix"),
        )
    )
    totals = d.agg(
        F.sum("weight").alias("w_total"), F.sum("avail").alias("a_total")
    )
    j = sums.crossJoin(F.broadcast(totals)).withColumn("budget", budget)
    j = j.withColumn("w_suffix", F.col("w_total") - F.col("w_prefix"))
    j = j.withColumn(
        "saturated",
        F.col("avail") * F.col("w_suffix")
        <= (F.col("budget") - F.col("a_prefix")) * F.col("weight"),
    )
    # water level from the saturated totals (same for every row)
    sat = j.groupBy().agg(
        F.sum(F.when(F.col("saturated"), F.col("avail")).otherwise(0)).alias(
            "a_sat"
        ),
        F.sum(F.when(~F.col("saturated"), F.col("weight")).otherwise(0)).alias(
            "w_unsat"
        ),
    )
    out = j.crossJoin(F.broadcast(sat)).withColumn(
        "r_ppm",
        F.when(F.col("w_unsat") > 0,
               F.expr("(budget - a_sat) * 1000000 div w_unsat"))
        .otherwise(F.lit(None).cast("long")),
    )
    return out.select(
        "key",
        F.col("avail").cast("bigint"),
        F.col("weight").cast("bigint"),
        "saturated",
        F.when(F.col("saturated"), F.col("avail"))
        .otherwise(F.expr("r_ppm * weight div 1000000"))
        .cast("bigint")
        .alias("alloc"),
        F.col("r_ppm").cast("bigint"),
    )
