"""Block-level main-content extraction — the jusText/Arc90 family.

Web pages are sequences of HTML BLOCKS (p/div/h*/li/td/...), and the
classic boilerplate removers (jusText — Pomikalek 2011 "Removing
boilerplate and duplicate content from web corpora"; Arc90 readability;
trafilatura's baseline) classify each block from three cheap signals —
link density, stopword density, and length — then run a CONTEXT pass
where borderline blocks inherit the verdict of their nearest confident
neighbor (headings above an article body are content; a short line deep
inside nav chrome is not). This is the page-STRUCTURE half of boilerplate
removal; the host-template operator (operators/templates.py) is the
cross-PAGE half — a production cleaner runs both. The reference repo
strips tags wholesale (reference html_utils.py `remove_html_tags`), which
keeps nav/footer junk inside the extracted text; this operator is the
block-aware upgrade its cleanup.ipynb pipeline would want at corpus scale.

Semantics (pinned, integer-exact — deliberately simplified from jusText's
full ruleset so both engines can replay it bit-identically):

- blocks: regex-split of the html on block-level open/close tags
  (``BLOCK_TAG_RE``); indexes are assigned BEFORE empties are dropped, so
  a block's position is stable regardless of how many tag boundaries
  surround it.
- per-block text: inline tags replaced by spaces, ASCII whitespace runs
  collapsed to one space, ends trimmed (``norm``). Blocks whose norm is
  empty classify ``empty`` and never reach the output or the context
  logic (they are transparent to neighbor search).
- features (all exact bigints): ``n_bytes = octet_length(norm)`` —
  UTF-8 BYTE length, the one length both engines define identically
  (Spark ``length`` counts code points, DuckDB ``length`` counts
  grapheme-ish characters; bytes are unambiguous — same choice as
  dedup_keep_best); ``link_bytes`` = summed normalized-text byte length
  of ``<a>...</a>`` bodies; ``n_words`` = space-split token count of
  norm; ``n_stop`` = tokens whose lowercase form is in
  ``JUSTEXT_STOPS``.
- context-free class (jusText defaults, as integer cross-products — no
  float thresholds):
    * ``bad``      iff 5*link_bytes > n_bytes          (link density > 0.2)
    * else ``short``    iff n_bytes < 70               (LENGTH_LOW)
    * else ``good``     iff 10*n_stop >= 3*n_words AND n_bytes > 200
    * else ``neargood`` iff 10*n_stop >= 3*n_words     (density >= 0.3)
    * else ``bad``
  (jusText separates stopwords_low=0.30 / stopwords_high=0.32; this
  implementation uses the single 0.30 bar — documented divergence.)
- context pass: ``good``/``bad`` are final. ``short``/``neargood``
  become ``good`` iff the nearest PRECEDING or nearest FOLLOWING block
  whose context-free class is good/bad (skipping short/neargood/empty)
  is ``good``; otherwise ``bad``. Page edges count as absent (null).
- main text: the norms of final-``good`` blocks joined with ``\n`` in
  block order.

Scale shape — ZERO shuffle, zero Python: the whole pipeline (split,
feature extraction, classification, the context pass, and the main-text
join) is nested higher-order array expressions on each row, because a
document's blocks live in one array cell; the neighbor search is a
slice+filter over the per-row class array, not a window. At 100 TB this
fuses into the scan's codegen stage like the C4 line filter
(operators/c4.py). The per-block GATE view (`content_blocks`) adds one
narrow posexplode — still no exchange. The DuckDB oracle deliberately
uses the OTHER natural formulation (explode + ignore-nulls windows over
block_idx), so the hash gate is also an equivalence proof between the
array-native and relational forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-boundary tags. Explicit ASCII whitespace class (NOT \s: Java \s
# includes \x0b, RE2's does not — the one divergence that would silently
# desync split points between the engines).
BLOCK_TAG_RE = (
    r"(?i)</?(p|div|h[1-6]|li|ul|ol|td|tr|table|thead|tbody|nav|footer|"
    r"header|aside|blockquote|section|article|main|figure|figcaption|"
    r"form|fieldset|pre|hr|br)([ \t\n\r\f][^>]*)?/?>"
)

# Any remaining (inline) tag inside a block — replaced by a space so
# "<b>a</b><i>b</i>" never word-joins into "ab".
INLINE_TAG_RE = r"<[^>]*>"

WS_RUN_RE = r"[ \t\n\x0b\f\r]+"

LENGTH_LOW = 70  # UTF-8 bytes; below = "short" (jusText length_low default 70)
LENGTH_HIGH = 200  # UTF-8 bytes; above + stopword-dense = confident good

# jusText ships per-language stopword files; this engine pins one small
# English list (lowercase, exact-match after lower()) so the density test
# is deterministic and oracle-replayable.
JUSTEXT_STOPS: tuple[str, ...] = (
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "are", "was", "or",
)

GOOD, BAD, SHORT, NEARGOOD, EMPTY = "good", "bad", "short", "neargood", "empty"


def _norm(c: Column) -> Column:
    """Inline-tag strip + whitespace collapse + trim, as one expression."""
    stripped = F.regexp_replace(c, INLINE_TAG_RE, " ")
    return F.trim(F.regexp_replace(stripped, WS_RUN_RE, " "))


def _anchor_bytes(block: Column) -> Column:
    """Total normalized-text UTF-8 bytes inside <a>...</a> bodies of a raw
    block. Two extract_all passes (attributed and bare <a>) — only the
    LENGTHS are summed, so cross-pass ordering is irrelevant."""
    bodies = F.concat(
        F.regexp_extract_all(block, F.lit(r"(?is)<a[ \t\n\r\f][^>]*>(.*?)</a>"), 1),
        F.regexp_extract_all(block, F.lit(r"(?is)<a>(.*?)</a>"), 1),
    )
    return F.aggregate(
        bodies, F.lit(0).cast("long"), lambda acc, b: acc + F.octet_length(_norm(b))
    )


def _ctx_free_class(n_bytes: Column, link_bytes: Column, n_words: Column, n_stop: Column) -> Column:
    dense = (10 * n_stop) >= (3 * n_words)
    return (
        F.when(n_bytes == 0, F.lit(EMPTY))
        .when((5 * link_bytes) > n_bytes, F.lit(BAD))
        .when(n_bytes < LENGTH_LOW, F.lit(SHORT))
        .when(dense & (n_bytes > LENGTH_HIGH), F.lit(GOOD))
        .when(dense, F.lit(NEARGOOD))
        .otherwise(F.lit(BAD))
    )


def block_features(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-row array of block feature structs + context-free/final classes.

    Adds one column ``blocks``: array<struct<block_idx:int, norm:string,
    n_bytes:long, link_bytes:long, n_words:long, n_stop:long, cls_ctx:string,
    cls:string>> — 1-based block_idx over the raw split (empties included
    in numbering, excluded from the array is NOT done here; empties stay,
    classified ``empty``, so downstream can filter). Pure expressions —
    no UDF, no explode, no exchange.
    """
    parts = F.split(F.col(html_col), BLOCK_TAG_RE)

    stops = F.array(*[F.lit(s) for s in JUSTEXT_STOPS])

    def feat(part: Column, i: Column) -> Column:
        norm = _norm(part)
        n_bytes = F.octet_length(norm).cast("long")
        link_bytes = _anchor_bytes(part)
        words = F.when(norm == "", F.array().cast("array<string>")).otherwise(
            F.split(norm, " ")
        )
        n_words = F.size(words).cast("long")
        n_stop = F.size(
            F.filter(words, lambda w: F.array_contains(stops, F.lower(w)))
        ).cast("long")
        return F.struct(
            (i + 1).cast("int").alias("block_idx"),
            norm.alias("norm"),
            n_bytes.alias("n_bytes"),
            link_bytes.alias("link_bytes"),
            n_words.alias("n_words"),
            n_stop.alias("n_stop"),
            _ctx_free_class(n_bytes, link_bytes, n_words, n_stop).alias("cls_ctx"),
        )

    feats = F.transform(parts, feat)

    # Context pass as LINEAR scans, not per-element slices. Subtlety that
    # decides the runtime: a column expression referenced inside a
    # higher-order-function lambda is RE-EVALUATED per element (Catalyst
    # clones the subtree; no CSE inside HOF lambdas) — the first version
    # sliced the class array per element and was O(B^2) full-regex
    # evaluations per row (measured 24 s vs 2 s on the gate fixture).
    # Here every expensive subtree is an ARGUMENT of aggregate/zip_with,
    # so it is evaluated once per row: prev/next "nearest confident
    # class" arrays come from one forward and one backward running scan,
    # then two zip_with passes attach them element-wise.
    def _confident(c: Column) -> Column:
        return (c == GOOD) | (c == BAD)

    def _prev_scan(cls_arr: Column) -> Column:
        """out[i] = last confident class strictly before i (null if none)."""
        zero = F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("last"),
        )
        return F.aggregate(
            cls_arr,
            zero,
            lambda acc, c: F.struct(
                F.concat(acc["out"], F.array(acc["last"])).alias("out"),
                F.when(_confident(c), c).otherwise(acc["last"]).alias("last"),
            ),
            lambda acc: acc["out"],
        )

    cls0 = F.transform(feats, lambda s: s["cls_ctx"])
    prev_arr = _prev_scan(cls0)
    next_arr = F.reverse(_prev_scan(F.reverse(cls0)))

    with_prev = F.zip_with(
        feats, prev_arr, lambda s, p: s.withField("prev_c", p)
    )

    def resolve(s: Column, next_c: Column) -> Column:
        c = s["cls_ctx"]
        promoted = (s["prev_c"] == GOOD) | (next_c == GOOD)
        final = (
            F.when((c == GOOD) | (c == BAD) | (c == EMPTY), c)
            .when(promoted, F.lit(GOOD))
            .otherwise(F.lit(BAD))
        )
        return s.withField("cls", final).dropFields("prev_c")

    return df.withColumn("blocks", F.zip_with(with_prev, next_arr, resolve))


def content_blocks(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Per-block classification table: one row per NONEMPTY block.

    posexplode is narrow (no exchange); empties are dropped after index
    assignment so block_idx is the raw split position.
    """
    b = block_features(df, html_col)
    # explode_OUTER, deliberately: plain explode lets the optimizer infer
    # `size(blocks) > 0` from the Generate and push it into the SCAN as a
    # data filter — re-evaluating the whole block expression per row on
    # the pre-repartition (possibly single-split) scan, single-threaded
    # (measured: 3x the query's wall time on the gate fixture). outer
    # generates null rows for empty arrays instead of implying a filter;
    # the cls_ctx predicate below drops them (null fails != EMPTY).
    return (
        b.select(id_col, F.explode_outer("blocks").alias("blk"))
        .where(F.col("blk.cls_ctx") != EMPTY)
        .select(
            id_col,
            F.col("blk.block_idx").alias("block_idx"),
            F.col("blk.n_bytes").alias("n_bytes"),
            F.col("blk.link_bytes").alias("link_bytes"),
            F.col("blk.n_words").alias("n_words"),
            F.col("blk.n_stop").alias("n_stop"),
            F.col("blk.cls_ctx").alias("cls_ctx"),
            F.col("blk.cls").alias("cls"),
            F.md5(F.col("blk.norm").cast("binary")).alias("block_md5"),
        )
    )


def extract_main_text(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Per-document main text: final-good block norms joined with \\n in
    block order — still zero-shuffle (array filter + join per row, no
    groupBy: the blocks never left their row)."""
    b = block_features(df, html_col)
    good = F.filter(F.col("blocks"), lambda s: s["cls"] == GOOD)
    nonempty = F.filter(F.col("blocks"), lambda s: s["cls_ctx"] != EMPTY)
    main = F.array_join(F.transform(good, lambda s: s["norm"]), "\n")
    return b.select(
        id_col,
        F.size(nonempty).cast("long").alias("n_blocks"),
        F.size(good).cast("long").alias("n_good"),
        F.octet_length(main).cast("long").alias("main_bytes"),
        F.md5(main.cast("binary")).alias("main_md5"),
    )
