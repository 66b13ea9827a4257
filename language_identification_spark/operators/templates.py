"""Host-level template (boilerplate) line detection and scrubbing.

A crawl's per-host boilerplate — nav bars, cookie banners, footers — repeats
across most pages of that host but differs across hosts, so neither global
line rules (operators/c4.py) nor global first-occurrence paragraph dedup
(operators/paradedup.py) models it: the right unit is "fraction of THIS
host's pages containing this exact line". CCNet's shard-level common-line
removal and trafilatura's inter-page boilerplate comparison are the public
anchors for this operator family.

Two operators:

- ``host_template_lines`` — the template table: per (host, line), the
  number of that host's pages CONTAINING the line (presence, not
  occurrence: a page repeating its own footer twice counts once), kept
  when an integer-exact majority test fires:

      2 * n_pages >= n_host_docs   AND   n_pages >= min_pages

  (the >=50% threshold as exact integer arithmetic — no float thresholds,
  the split_token_budget discipline).
- ``scrub_template_lines`` — per-document cleanup: every template line of
  the document's host removed, preserving the order of surviving lines.

Scale shape: detection is ONE corpus exchange on (host, line) with
map-side combine (pages of a host share few distinct template lines, so
partial aggregation collapses hard), one tiny (host) aggregate, and an
integer-exact filter. Scrubbing joins docs to the template table on
host — the template table is host-dim-sized (lines that clear a 50%-of-
host-pages bar are the site chrome: tens per host, bounded by page
length), so the join side is broadcastable at web scale; the join is a
left join (hosts with no templates pass through) followed by a narrow
array_except-style filter. No windows, no collect, no Python.

Lines are ``\\n``-splits, trimmed, empties dropped — the
operators/repetition.py line convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(text_col) -> "F.Column":
    """Trimmed non-empty lines of a document, in order."""
    return F.filter(
        F.transform(F.split(text_col, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def host_template_lines(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_pages: int = 2,
) -> DataFrame:
    """(host, line, n_pages, n_host_docs, page_frac): lines present in an
    integer-exact majority (>=50%) of the host's pages, at least
    ``min_pages`` absolute. page_frac is one float division of two exact
    bigints, rounded to 6 dp."""
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(host_col).alias("host"), F.col(text_col).alias("text")
    )
    # presence per page: distinct lines within each doc before counting
    page_lines = base.select(
        "host", F.explode(F.array_distinct(_lines(F.col("text")))).alias("line")
    )
    line_counts = page_lines.groupBy("host", "line").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages")
    )
    host_counts = base.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_host_docs")
    )
    return (
        line_counts.join(F.broadcast(host_counts), "host")
        .filter(
            (F.lit(2) * F.col("n_pages") >= F.col("n_host_docs"))
            & (F.col("n_pages") >= F.lit(min_pages))
        )
        .select(
            "host",
            "line",
            "n_pages",
            "n_host_docs",
            F.round(F.col("n_pages") / F.col("n_host_docs"), 6).alias(
                "page_frac"
            ),
        )
    )


def scrub_template_lines(
    docs: DataFrame,
    templates: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Remove every template line of the document's host, preserving the
    order of surviving lines. Adds ``n_lines_removed`` (exact bigint) and
    ``scrubbed_text``; hosts without templates pass through unchanged.
    The per-host template set is collected host-side first (host-dim-sized
    groupBy), broadcast into a left join, then applied as a narrow
    array-expression filter.

    If the input already carries ``n_lines_removed`` or ``scrubbed_text``
    (e.g. a second scrub pass), this raises rather than silently shadowing
    the existing columns; internal join columns are collision-proofed."""
    clash = {
        "n_lines_removed", "scrubbed_text", "__tpl_host__", "__tpl_lines__"
    } & set(docs.columns)
    if clash:
        raise ValueError(
            f"scrub_template_lines output columns {sorted(clash)} already "
            "exist on the input — rename or drop them first"
        )
    # internal names that cannot collide with user columns (and are dropped
    # via an explicit final select anyway)
    tpl_host = "__tpl_host__"
    tpl_lines = "__tpl_lines__"
    tpl_sets = (
        templates.groupBy("host")
        .agg(F.collect_set("line").alias(tpl_lines))
        .withColumnRenamed("host", tpl_host)
    )
    with_tpl = docs.filter(F.col(text_col).isNotNull()).join(
        F.broadcast(tpl_sets),
        F.col(host_col) == F.col(tpl_host),
        "left",
    )
    lines = _lines(F.col(text_col))
    tpl = F.coalesce(F.col(tpl_lines), F.array().cast("array<string>"))
    kept = F.filter(lines, lambda s: ~F.array_contains(tpl, s))
    return with_tpl.select(
        *[F.col(c) for c in docs.columns],
        (F.size(lines) - F.size(kept)).cast("bigint").alias(
            "n_lines_removed"
        ),
        F.array_join(kept, "\n").alias("scrubbed_text"),
    )


# ---------------------------------------------------------------------------
# Cross-language template spam: punctuation-skeleton fingerprints
# ---------------------------------------------------------------------------

# explicit ASCII structural keep-set (digits, punctuation, space). Explicit
# because Java regex and RE2 disagree on shorthand classes (\p{L} Unicode
# versions, \s membership) but agree exactly on enumerated ASCII classes —
# the same lesson as readability's whitespace class.
SKELETON_KEEP = "0-9\\]\\[():|=!,;.%&#@ -"


def text_skeleton(col):
    """The page's structural skeleton: every character OUTSIDE the explicit
    ASCII digit/punctuation/space set removed (any script's words vanish),
    space runs collapsed, trimmed. Template-generated pages — the same
    scaffold refilled with rewritten or machine-translated content — share
    their skeleton even when no content n-gram survives translation, which
    is exactly why skeleton equality catches what MinHash cannot."""
    s = F.regexp_replace(col, f"[^{SKELETON_KEEP}]", "")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)


def template_spam_groups(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_skeleton_len: int = 6,
) -> DataFrame:
    """Group documents by md5(skeleton) and surface template families:
    (skeleton_fp, n_docs, n_langs, langs, keep_doc_id, cross_lang). A
    family spanning >= 2 languages (cross_lang) is machine-translated
    template spam evidence — same scaffold, different-language fill —
    invisible to content-based near-dup (translation destroys shingles).
    Skeletons shorter than min_skeleton_len carry no structure (every
    plain-prose page collapses to '.' or ''), so they are excluded rather
    than fused into one mega-group — the degenerate-key defense, same
    motive as the LSH bucket cap but exact.

    Scale shape: one narrow skeleton map (two regex passes + md5, pure
    codegen), then ONE groupBy(fp) with map-side partials — the
    exact_dedup cost shape. No joins, no windows."""
    skel = text_skeleton(F.col(text_col))
    rows = df.where(
        F.col(text_col).isNotNull()
        & (F.length(skel) >= min_skeleton_len)
    ).select(
        F.md5(skel.cast("binary")).alias("skeleton_fp"),
        F.col(lang_col).alias("lang"),
        F.col(id_col).alias("doc_id"),
    )
    return (
        rows.groupBy("skeleton_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.array_join(F.sort_array(F.collect_set("lang")), ",").alias(
                "langs"
            ),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
        .withColumn("cross_lang", F.col("n_langs") >= 2)
    )
