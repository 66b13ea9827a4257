"""HTML <head> metadata: extraction, index-policy filtering, canonical dedup.

A Common-Crawl-style curation pipeline reads three head signals before it
reads a single body byte (reference scope: remove_html_tags.py strips the
head wholesale at :155-164 — this module is the complementary operator that
USES it first):

- ``<meta name="robots">`` — a ``noindex`` directive is the publisher
  telling every indexer to drop the page; honoring it both shrinks the
  corpus and removes a class of soft-404/login/duplicate chrome pages.
- ``<link rel="canonical">`` — the publisher's own dedup key: print views,
  UTM-tagged republications, and paginated mirrors all point at one
  canonical URL. Grouping by it is exact publisher-declared dedup, far
  cheaper than content fingerprints (one narrow map + one hash aggregate
  on a host-local key vs shingling the body).
- ``<link rel="alternate" hreflang>`` — declared language, which curation
  stacks audit AGAINST detected language (metadata lies; the consistency
  matrix is the trust measurement).

Extraction is native ``regexp_extract`` over the html string — stays in
whole-stage codegen, zero Python (the patterns are lookaround-free and
behave identically in Java regex / RE2 / Python re, the
oracle-portability contract of operators/scrub.py).

Scale shape: ``extract_html_meta`` is a pure narrow map. ``canonical_dedup``
is ONE hash aggregate keyed on the canonical URL; canonical groups are
host-local by construction (a publisher canonicalizes within its own site),
so the key inherits host-grain parallelism and its skew ceiling is the
largest single canonical cluster — bounded by per-host page counts, the
same envelope hostcap already enforces upstream. Output is dim-sized
(distinct canonicals), never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TITLE_RE = r"<title>([^<]*)</title>"
ROBOTS_RE = r'<meta name="robots" content="([^"]*)"'
CANONICAL_RE = r'<link rel="canonical" href="([^"]*)"'
HREFLANG_RE = r'<link rel="alternate" hreflang="([^"]*)"'

N_HOSTS = 25  # host slots, same modulus as linkgraph's synth pages
CANON_GROUP = 4  # pages per canonical cluster in the synth fixture


def extract_html_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages(url, <html_col>, ...) -> + (title, robots, noindex, canonical,
    hreflang). Absent tags extract as '' (both engines' regexp_extract
    no-match value) — '' canonical means self-canonical downstream."""
    h = F.col(html_col)
    return pages.withColumns(
        {
            "title": F.regexp_extract(h, TITLE_RE, 1),
            "robots": F.regexp_extract(h, ROBOTS_RE, 1),
            "canonical": F.regexp_extract(h, CANONICAL_RE, 1),
            "hreflang": F.regexp_extract(h, HREFLANG_RE, 1),
        }
    ).withColumn("noindex", F.col("robots").contains("noindex"))


def canonical_dedup(meta: DataFrame) -> DataFrame:
    """Publisher-declared dedup: group by coalesce(canonical, url); keep —
    among non-noindex members — the page whose url IS the canonical if
    present, else the min doc_id (deterministic). noindex pages are
    counted per group but never elected.

    Output (canon_url, n_pages, n_noindex, kept_doc_id); kept_doc_id is
    NULL when every member is noindexed (the whole cluster drops)."""
    canon = F.when(F.col("canonical") != "", F.col("canonical")).otherwise(
        F.col("url")
    )
    is_self = F.col("url") == canon
    live = ~F.col("noindex")
    return (
        meta.select(
            canon.alias("canon_url"),
            "doc_id",
            live.alias("live"),
            is_self.alias("is_self"),
        )
        .groupBy("canon_url")
        .agg(
            F.sum(F.when(F.col("live"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pages"),
            F.sum(F.when(F.col("live"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_noindex"),
            F.coalesce(
                F.min(
                    F.when(F.col("live") & F.col("is_self"), F.col("doc_id"))
                ),
                F.min(F.when(F.col("live"), F.col("doc_id"))),
            ).alias("kept_doc_id"),
        )
    )


def synth_meta_pages(docs: DataFrame) -> DataFrame:
    """Deterministic head-tagged pages from the documents table (the
    linkgraph synth pattern — a real deployment feeds WARC html):

    - canonical clusters of up to 4 consecutive doc_ids on one host
      (h = (doc_id // 4) % 25), canonical -> the cluster-leader URL;
    - the canonical tag is OMITTED on doc_id % 3 == 0 (self-canonical
      fallback path, including some cluster leaders);
    - robots: noindex on doc_id % 7 == 3, explicit index on % 7 == 5,
      absent otherwise;
    - hreflang: the document's own lang, except every 11th page declares
      a WRONG language (en, or zh for en pages) — the metadata-lies case
      the consistency audit exists to count."""
    d = F.col("doc_id")
    # (d - d%k)/k: numerator exactly divisible, so the double division is
    # exact — engine-portable integer floor-div without float hazards
    h = (((d - d % CANON_GROUP) / CANON_GROUP).cast("long") % N_HOSTS).cast(
        "string"
    )
    leader = (d - d % CANON_GROUP).cast("string")
    url = F.concat(
        F.lit("http://site"), h, F.lit(".example.com/p"), d.cast("string")
    )
    canonical_url = F.concat(
        F.lit("http://site"), h, F.lit(".example.com/p"), leader
    )
    robots_tag = (
        F.when(
            d % 7 == 3,
            F.lit('<meta name="robots" content="noindex,nofollow">'),
        )
        .when(d % 7 == 5, F.lit('<meta name="robots" content="index,follow">'))
        .otherwise(F.lit(""))
    )
    canonical_tag = F.when(d % 3 == 0, F.lit("")).otherwise(
        F.concat(F.lit('<link rel="canonical" href="'), canonical_url, F.lit('">'))
    )
    declared = F.when(
        d % 11 == 0,
        F.when(F.col("lang") == "en", F.lit("zh")).otherwise(F.lit("en")),
    ).otherwise(F.col("lang"))
    hreflang_tag = F.concat(
        F.lit('<link rel="alternate" hreflang="'),
        declared,
        F.lit('" href="'),
        url,
        F.lit('">'),
    )
    html = F.concat(
        F.lit("<html><head><title>site"),
        h,
        F.lit(" page "),
        d.cast("string"),
        F.lit("</title>"),
        robots_tag,
        canonical_tag,
        hreflang_tag,
        F.lit("</head><body><p>page "),
        d.cast("string"),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        "doc_id", "lang", url.alias("url"), html.alias("html")
    )
