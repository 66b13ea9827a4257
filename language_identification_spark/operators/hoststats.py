"""Host-level corpus statistics under hot-host skew — salted two-phase agg.

Common-Crawl host keys are Zipfian: a handful of hosts own double-digit
percentages of all pages, so a single ``groupBy(host)`` sends a hot host's
entire corpus share through ONE reducer task — the straggler that decides
the stage's wall clock at 10^12 documents. (AQE's skew handling splits
oversized *join* partitions; a skewed *aggregation* key still lands on one
task unless the plan itself spreads it.)

This operator makes the spread explicit: phase 1 aggregates on
``(host, salt)`` where ``salt = pmod(id, salt_buckets)`` — deterministic,
so runs are reproducible and resumable, unlike ``rand()`` salts — cutting
the hot key into ``salt_buckets`` parallel partials; phase 2 merges the
(tiny: |hosts| x salt_buckets rows) partials on ``host`` alone. Every
statistic is chosen to be decomposable:

- count / sum: merge by sum,
- mean: carried as (sum, count), divided at the end (6 dp),
- distinct langs: per-salt ``collect_set`` (bounded by the lang
  vocabulary, NOT by rows), merged via flatten + array_distinct.

Spark's own partial aggregation ("map-side combine") already does partial
counts per input partition — but partials collapse onto ONE reducer per
key at the exchange; the salt keeps the parallelism THROUGH the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_stats_salted(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    lang_col: str = "lang",
    salt_buckets: int = 16,
) -> DataFrame:
    """(host, n_docs, total_chars, mean_chars, n_langs) via the salted
    two-phase plan. Result is identical to a direct groupBy(host) — the
    salt is physical, never visible in the output."""
    partial = (
        df.withColumn("salt", F.pmod(F.col(id_col), F.lit(salt_buckets)))
        .groupBy(F.col(host_col).alias("host"), "salt")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col(chars_col).cast("bigint")).alias("chars"),
            F.collect_set(lang_col).alias("langs"),
        )
    )
    return (
        partial.groupBy("host")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_docs"),
            F.sum("chars").cast("bigint").alias("total_chars"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("langs")))
            ).cast("bigint").alias("n_langs"),
        )
        .select(
            "host",
            "n_docs",
            "total_chars",
            F.round(
                F.col("total_chars").cast("double") / F.col("n_docs"), 6
            ).alias("mean_chars"),
            "n_langs",
        )
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hot-key JOIN defense: explicit salting when the dim is too large to
    broadcast and AQE's skew split can't help (e.g. the skew only
    materializes after upstream stages, or the engine runs with AQE off
    for plan stability — the scaling-bench configuration).

    The fact side gets ``salt = pmod(id, salt_buckets)``; the dim side is
    replicated once per salt value via a literal explode (dim_rows x
    salt_buckets — still dimension-shaped). The join key becomes
    (key, salt), so a Zipf-head key's rows spread over ``salt_buckets``
    reducers instead of one straggler task. Deterministic (id-derived
    salt, never rand()) => reproducible partitioning, resumable stages.

    Result is row-identical to ``fact.join(dim, key)``; the salt never
    escapes. Broadcast stays the FIRST choice for truly small dims
    (domain_blocked's docstring); this is the mid-size-dim fallback.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.col(id_col), F.lit(salt_buckets)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast(
                "array<int>"
            )
        ),
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")


def wilson_bounds_ppm(
    k_col: str = "n_keep",
    n_col: str = "n_docs",
    z_str: str = "1.96",
) -> tuple[F.Column, F.Column]:
    """Wilson score interval for a per-group keep rate, in floor-ppm.

    Ranking hosts by raw keep fraction over-trusts tiny hosts (2/2 beats
    9000/10000); the Wilson lower bound is the standard small-sample
    correction (Wilson 1927 — the Reddit 'best' sort), so crawl
    prioritization reads the LB and quarantine reads the UB.

    Cross-engine determinism: the formula is spelled with an EXPLICIT
    operation order using only IEEE-correctly-rounded ops (+ - * /
    sqrt) on doubles derived from bigints, so Spark and DuckDB produce
    bit-identical doubles and the floor(1e6*x) ppm cast cannot straddle.
    The z literal is passed as a string so both engines parse the same
    decimal into the same double.

    Returns (wilson_lb_ppm, wilson_ub_ppm) BIGINT columns; callers
    supply the (k, n) aggregate columns.
    """
    lb = _wilson_expr(k_col, n_col, z_str, "-")
    ub = _wilson_expr(k_col, n_col, z_str, "+")
    return lb, ub


def _wilson_expr(k: str, n: str, z: str, sign: str) -> F.Column:
    # (p + z2/(2n) +/- z*sqrt( (p*(1-p))/n + z2/(4n^2) )) / (1 + z2/n)
    # -- every subexpression parenthesized; SQL below must mirror EXACTLY.
    e = (
        f"CAST(floor(1000000.0 * ((((CAST({k} AS DOUBLE) / CAST({n} AS "
        f"DOUBLE)) + (({z} * {z}) / (2.0 * CAST({n} AS DOUBLE)))) {sign} "
        f"({z} * sqrt((((CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)) * "
        f"(1.0 - (CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)))) / "
        f"CAST({n} AS DOUBLE)) + (({z} * {z}) / (4.0 * (CAST({n} AS "
        f"DOUBLE) * CAST({n} AS DOUBLE))))))) / (1.0 + (({z} * {z}) / "
        f"CAST({n} AS DOUBLE))))) AS BIGINT)"
    )
    return F.expr(e)


def wilson_sql_expr(k: str, n: str, z: str, sign: str) -> str:
    """The DuckDB-side twin of _wilson_expr — char-for-char the same
    arithmetic (only the cast spelling differs)."""
    kd = f"CAST({k} AS DOUBLE)"
    nd = f"CAST({n} AS DOUBLE)"
    return (
        f"CAST(floor(1000000.0 * (((({kd} / {nd}) + (({z} * {z}) / "
        f"(2.0 * {nd}))) {sign} ({z} * sqrt(((({kd} / {nd}) * (1.0 - "
        f"({kd} / {nd}))) / {nd}) + (({z} * {z}) / (4.0 * ({nd} * "
        f"{nd})))))) / (1.0 + (({z} * {z}) / {nd})))) AS BIGINT)"
    )
