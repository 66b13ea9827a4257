"""URL canonicalization + URL-level dedup — the FIRST dedup stage of a
Common-Crawl-style pipeline.

Crawls re-fetch the same page under cosmetically different URLs (scheme
case, ``www.``, default ports, tracking parameters, fragments, trailing
slashes); CCNet/RefinedWeb-style pipelines therefore dedupe by normalized
URL *before* any content hashing — it removes the bulk of exact refetches
for the price of a string map plus one shuffle, where content dedup costs
a full-text hash of every copy.

Canonicalization contract (pinned; each step is a regex both Java regex
and RE2 execute identically — no lookaround, no backrefs in patterns):

1. drop the fragment (``#...`` to end),
2. drop tracking parameters ``utm_*`` / ``fbclid`` / ``gclid`` (value runs
   to the next ``&``), keeping the leading delimiter, then collapse the
   delimiter debris (``?&+`` -> ``?``, ``&&+`` -> ``&``, trailing ``[?&]``
   dropped),
3. lowercase the scheme://host[:port] prefix (path/query case preserved),
4. drop a ``www.`` host prefix,
5. drop explicit default ports ``:80`` / ``:443``,
6. drop a single trailing ``/``.

Dedup contract: one winner per canonical URL = the row with the smallest
``id_col`` (deterministic under any partitioning); every row is returned
with its group's size so the caller can either filter ``is_canonical``
(keep-list) or audit duplication rates per site.

Scale shape: canonicalization is a narrow map (regex chain in whole-stage
codegen, no Python); the dedup is ONE hash exchange on ``canon_url`` —
the same cost class as exact_dedup, but on short keys. Canonical-URL keys
are near-unique, so the window sees tiny partitions and no skew defense
is needed (contrast host keys — operators' host-level aggregation salts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"([?&])(?:utm_[a-z_]+|fbclid|gclid)=[^&#]*"


def canonical_url_expr(url: Column) -> Column:
    """The 6-step canonicalization chain as a pure Column expression."""
    u = F.regexp_replace(url, r"#.*", "")  # 1. fragment
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "$1")  # 2. tracking params
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    pfx = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    u = F.concat(  # 3. lowercase scheme://host[:port]
        F.lower(pfx), u.substr(F.length(pfx) + 1, F.length(u))
    )
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")  # 4. www
    u = F.regexp_replace(  # 5. default ports
        u, r"^([a-z][a-z0-9+.-]*://[^/:?#]+):(?:80|443)([/?].*)?$", "$1$2"
    )
    return F.regexp_replace(u, r"/$", "")  # 6. trailing slash


def domain_blocked(host: Column, blocklist: list[str]) -> Column:
    """UT1-style domain blocklist test: blocked iff the host IS an entry or
    is a subdomain of one (``ads.bad.example.com`` matches entry
    ``bad.example.com``; ``notbad.example.com`` does not — the dot-suffix
    rule, not a substring match). For a literal-sized list this is a
    zero-shuffle narrow map (exists over an array literal). A production
    UT1 list (~millions of entries) instead extracts the host's registered
    domain and BROADCAST-semi-joins it against the list — same verdicts,
    one broadcast, still no corpus shuffle."""
    entries = F.array(*[F.lit(e) for e in blocklist])
    return F.exists(
        entries,
        lambda e: (host == e) | host.endswith(F.concat(F.lit("."), e)),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, url, canon_url, is_canonical, n_copies) per non-null-url
    row: the canonical form, whether this row is its group's winner
    (smallest id), and the group's size."""
    base = df.filter(F.col(url_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        canonical_url_expr(F.col(url_col)).alias("canon_url"),
    )
    w = Window.partitionBy("canon_url")
    return base.select(
        "doc_id",
        "url",
        "canon_url",
        (
            F.row_number().over(w.orderBy("doc_id")) == 1
        ).alias("is_canonical"),
        F.count("*").over(w).cast("bigint").alias("n_copies"),
    )


def url_word_score(
    url: Column,
    strict_words: list[str],
    soft_weights: dict[str, int],
    threshold: int,
) -> Column:
    """RefinedWeb-style soft URL filtering (Penedo et al. 2023 §3.1): the
    UT1 blocklist misses hosts it has never seen, so URLs are ALSO scored
    lexically — the url is split into alphanumeric tokens and (a) any
    strict-list token blocks outright, (b) weighted soft-list token hits
    accumulate (each occurrence counts) and block at ``threshold``.

    Weights and threshold are exact integers — no float boundary ambiguity
    across engines. Zero-shuffle narrow map (regex split + two array folds
    over literal lists); a production-sized soft list becomes a broadcast
    map the same way domain_blocked documents.

    Returns a struct column (strict_hit boolean, score int, blocked
    boolean) so callers can keep the parts as audit columns.
    """
    toks = F.filter(
        F.split(F.lower(url), "[^a-z0-9]+"), lambda t: t != ""
    )
    strict_arr = F.array(*[F.lit(w) for w in sorted(strict_words)])
    strict_hit = F.arrays_overlap(toks, strict_arr)

    # per-token weight: chained CASE over the literal map
    def _tok_weight(t: Column) -> Column:
        expr = F.lit(0)
        for w, wt in sorted(soft_weights.items(), reverse=True):
            expr = F.when(t == w, F.lit(int(wt))).otherwise(expr)
        return expr

    score = F.aggregate(
        F.transform(toks, _tok_weight), F.lit(0), lambda acc, x: acc + x
    )
    return F.struct(
        strict_hit.alias("strict_hit"),
        score.cast("int").alias("score"),
        (strict_hit | (score >= F.lit(int(threshold)))).alias("blocked"),
    )


def latest_snapshot(
    df,
    url_col: str = "url",
    ts_col: str = "snap_h",
    id_col: str = "doc_id",
):
    """Keep the NEWEST crawl snapshot per URL (recency dedup).

    Common-Crawl-style tables carry many (url, warc_ts) snapshots of the
    same page; training corpora keep one, preferring the freshest capture
    (the CCNet/C4 convention). One exchange on the short url key; the
    winner election is a max-of-struct aggregate (ts desc, then MIN id as
    the deterministic tie-break via negated id), never a window — the
    same map-side-combinable shape as exact_dedup, so partial aggregation
    bounds shuffle rows by distinct-url count, not corpus size.

    Returns (url, doc_id, ts, n_snapshots) with the winning row's id/ts.
    """
    win = F.max(
        F.struct(
            F.col(ts_col).alias("ts"),
            (-F.col(id_col)).alias("neg_id"),
        )
    ).alias("w")
    return (
        df.groupBy(url_col)
        .agg(win, F.count("*").cast("bigint").alias("n_snapshots"))
        .select(
            url_col,
            (-F.col("w.neg_id")).cast("bigint").alias(id_col),
            F.col("w.ts").cast("bigint").alias(ts_col),
            "n_snapshots",
        )
    )
