"""Host link graph + exact-integer PageRank — crawl-frontier host ranking.

Web-scale curation pipelines rank hosts by link structure before (or
alongside) content quality: Common-Crawl publishes host-level harmonic
centrality / PageRank ranks, and RefinedWeb / web-curation stacks use such
link-based priors for crawl prioritization and quality weighting. This
module provides that operator family Spark-first:

- ``synth_linked_pages``  — deterministic Common-Crawl-shaped pages whose
  html carries real ``<a href>`` outlinks (the test/bench fixture; a real
  deployment replaces this with the WARC scan of sources/warc.py).
- ``extract_host_edges``  — parse outlinks out of html with a native
  ``regexp_extract_all`` (zero Python), aggregate to the distinct
  host->host edge list WITH per-source doc counts in ONE map-side-combined
  exchange: each page emits its 4 link targets, so ``count(*)`` per
  (src, dst) group IS the source host's page count.
- ``host_pagerank_exact`` — K iterations of PageRank with damping 0.85
  over the fixed-outdegree-4 host graph, in EXACT INTEGER arithmetic
  (order-independent, engine-independent — the same discipline as the
  pack_sequences/split_token_budget integer accounting):

      rank_k(v) = 0.15/N + 0.85 * sum_{u->v} rank_{k-1}(u) / 4

  Scaling by ``A_k = N * 80**k`` makes every term integral: with
  ``S_k = rank_k * A_k`` the recurrence collapses (N cancels!) to

      S_0 = 1;   S_k(v) = 12 * 80**(k-1) + 17 * sum_{u->v} S_{k-1}(u)

  because ``N*80**k * 0.15/N = 12*80**(k-1)`` and
  ``0.85/4 * 80 = 17`` exactly. ``rank = S_K / (N * 80**K)`` at the end —
  one float division over exact ints, bit-identical across engines.
  Per-link mass is rank/4 by construction of the synthetic crawl
  (every host page lists exactly 4 distinct target hosts); links whose
  target host has no crawled pages leak their mass, the standard
  discard-dangling PageRank convention.

Scale shape (100 TB audit in SCALE.md): the corpus is touched ONCE — a
narrow per-doc map (html synth + regexp extract + explode to 4 rows) into
one (src, dst) hash aggregate whose output is bounded by the host-graph
size (<= 4 * |hosts| rows), never by the corpus. Everything after is
dimension-sized: the K rank iterations join/aggregate tables of |hosts|
rows with explicit broadcasts — no corpus-sized shuffle, no collect, no
windows. At 10^12 docs the only full-data cost is the scan + map-side
combine; the graph itself (10^7-10^8 real-world hosts) stays comfortably
in executor memory as a broadcast.

Reference anchor: the reference repo has no link-graph operator; this is
part of the §2.11 LLM-data-pipeline family (SURVEY.md), built on public
knowledge only (Page et al. 1999; Common Crawl host-rank releases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed synthetic host graph: 25 hosts, outdegree exactly 4, no self-loops,
# deliberately skewed indegree (0..12) so ranks are non-trivial (20 distinct
# exact rank values at K=3). Generated once with a seeded preferential-
# attachment sampler; a LITERAL dim table (VALUES CTE on the oracle side),
# the same pattern as the inlined NB model of oracle/pipeline_sql.py.
HOST_LINKS: list[tuple[int, list[int]]] = [
    (0, [6, 14, 16, 21]),
    (1, [10, 21, 22, 24]),
    (2, [7, 14, 18, 19]),
    (3, [7, 14, 20, 21]),
    (4, [14, 20, 22, 23]),
    (5, [11, 13, 17, 24]),
    (6, [11, 21, 22, 23]),
    (7, [17, 20, 23, 24]),
    (8, [20, 21, 22, 23]),
    (9, [8, 10, 15, 16]),
    (10, [11, 15, 16, 21]),
    (11, [14, 15, 17, 24]),
    (12, [13, 17, 21, 22]),
    (13, [20, 21, 23, 24]),
    (14, [7, 15, 16, 22]),
    (15, [14, 16, 23, 24]),
    (16, [18, 19, 21, 24]),
    (17, [15, 18, 20, 24]),
    (18, [10, 14, 19, 24]),
    (19, [8, 11, 21, 23]),
    (20, [9, 17, 18, 24]),
    (21, [5, 20, 23, 24]),
    (22, [11, 15, 20, 21]),
    (23, [15, 18, 19, 24]),
    (24, [13, 16, 19, 23]),
]

N_HOST_SLOTS = 25
OUTDEG = 4
HREF_PATTERN = r'href="http://site([0-9]+)\.example\.com/'


def _host_links_dim(spark: SparkSession) -> DataFrame:
    rows = [(h, ts[0], ts[1], ts[2], ts[3]) for h, ts in HOST_LINKS]
    return spark.createDataFrame(
        rows, schema="h bigint, t1 int, t2 int, t3 int, t4 int"
    )


def synth_linked_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, h, html): Common-Crawl-shaped page per document whose html
    contains exactly the 4 ``<a href>`` outlinks of its host's row in
    HOST_LINKS. Broadcast join on the 25-row dim, narrow map otherwise."""
    spark = docs.sparkSession
    dim = F.broadcast(_host_links_dim(spark))
    with_h = docs.select(
        "doc_id", (F.col("doc_id") % N_HOST_SLOTS).alias("h")
    )

    def _anchor(t):
        return F.concat(
            F.lit('<a href="http://site'),
            F.col(t).cast("string"),
            F.lit(".example.com/d"),
            F.col("doc_id").cast("string"),
            F.lit('">l</a>'),
        )

    return with_h.join(dim, "h").select(
        "doc_id",
        "h",
        F.concat(
            F.lit("<html><body><h1>site"),
            F.col("h").cast("string"),
            F.lit("</h1>"),
            _anchor("t1"),
            _anchor("t2"),
            _anchor("t3"),
            _anchor("t4"),
            F.lit("</body></html>"),
        ).alias("html"),
    )


def extract_host_edges(pages: DataFrame) -> DataFrame:
    """(src, dst, n_docs): distinct host->host edges parsed out of the html
    with native regexp, ONE map-side-combined exchange. n_docs is the
    SOURCE host's page count (each page emits each of its 4 targets once,
    so the (src, dst) group count equals the source's page count)."""
    exploded = pages.select(
        F.col("h").alias("src"),
        F.explode(
            F.regexp_extract_all(F.col("html"), F.lit(HREF_PATTERN), F.lit(1))
        ).alias("dst_str"),
    ).select("src", F.col("dst_str").cast("int").alias("dst"))
    return exploded.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# Exact host-graph operators are DIM-SIZED by contract: they broadcast
# |hosts|-bounded tables and (for harmonic) build radius-ball distance
# pairs. The caps below turn that documented envelope into an enforced
# one — the lsh_oversized_buckets pattern. Full-web graphs (10^8+ hosts)
# need HyperBall (HLL counters per node; Boldi & Vigna 2013), not these.
MAX_EXACT_HOSTS = 2_000_000
MAX_HC_DIST_PAIRS = 50_000_000


def _guard_host_dim(n: int, cap: int, what: str) -> None:
    if n > cap:
        raise ValueError(
            f"{what}: {n:,} rows exceeds the exact-operator cap {cap:,}. "
            "These operators are exact and dimension-sized by design "
            "(10^5-10^6 curated hosts); for full-web graphs use a "
            "HyperBall-style HLL approximation (Boldi & Vigna 2013) or "
            "raise the cap knowingly."
        )


def host_pagerank_exact(
    edges: DataFrame, k: int = 3, max_hosts: int = MAX_EXACT_HOSTS
) -> DataFrame:
    """Exact-integer PageRank over the extracted host graph (module
    docstring derivation). Returns (host, n_docs, rank_scaled, rank) with
    rank_scaled = S_k exact bigint and rank = S_k / (N * 80**k) rounded to
    8 dp. Every join is dimension-sized and explicitly broadcast.

    The edge table is cached: hosts / live / every rank iteration / the
    N-scalar all branch from it, and without the cache each branch would
    re-run the corpus-sized extraction (the ngram-counts precedent,
    queries.py q_ngram_counts). It is <= OUTDEG * |hosts| rows — a few GB
    even at the real web's 10^8 hosts. The |hosts| dimension is guarded
    by ``max_hosts`` (loud error, not a silent straggler); the returned
    frame is eagerly localCheckpoint-ed (host-dim-sized) so the edge
    cache can be unpersisted before returning — repeated invocations in a
    long-lived session no longer accumulate storage blocks."""
    edges = edges.cache()
    try:
        return _pagerank_body(edges, k, max_hosts)
    finally:
        # runs after the eager localCheckpoint materializes (or after the
        # guard raises) — either way the cache mark never outlives the call
        edges.unpersist()


def _pagerank_body(edges: DataFrame, k: int, max_hosts: int) -> DataFrame:
    hosts = edges.groupBy("src").agg(F.max("n_docs").alias("n_docs")).select(
        F.col("src").alias("h"), "n_docs"
    )
    _guard_host_dim(hosts.count(), max_hosts, "host_pagerank_exact hosts")
    # keep only edges whose target host was itself crawled (mass to
    # un-crawled hosts leaks: discard-dangling convention)
    live = edges.join(
        F.broadcast(hosts.select(F.col("h").alias("dst"))), "dst"
    ).select("src", "dst")

    rank = hosts.select("h", F.lit(1).cast("bigint").alias("s"))
    for i in range(1, k + 1):
        contrib = (
            live.join(
                F.broadcast(rank.select(F.col("h").alias("src"), "s")), "src"
            )
            .groupBy("dst")
            .agg(F.sum("s").alias("in_s"))
        )
        teleport = 12 * 80 ** (i - 1)
        rank = (
            hosts.select("h")
            .join(F.broadcast(contrib.select(F.col("dst").alias("h"), "in_s")), "h", "left")
            .select(
                "h",
                (
                    F.lit(teleport).cast("bigint")
                    + F.lit(17) * F.coalesce(F.col("in_s"), F.lit(0))
                )
                .cast("bigint")
                .alias("s"),
            )
        )

    n_hosts = hosts.agg(F.count(F.lit(1)).alias("nh"))
    scale = float(80**k)
    out = (
        rank.join(F.broadcast(hosts), "h")
        .crossJoin(F.broadcast(n_hosts))
        .select(
            F.concat(
                F.lit("site"), F.col("h").cast("string"), F.lit(".example.com")
            ).alias("host"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("s").alias("rank_scaled"),
            F.round(
                F.col("s") / (F.col("nh") * F.lit(scale)), 8
            ).alias("rank"),
        )
    )
    # materialize the |hosts|-sized result (one job) so the caller's frame
    # no longer references the edge cache; its checkpoint blocks are
    # reclaimed by the ContextCleaner once the caller drops the frame
    return out.localCheckpoint(eager=True)


def host_pagerank(docs: DataFrame, k: int = 3) -> DataFrame:
    """Full chain: synth pages -> extract outlinks -> exact PageRank."""
    return host_pagerank_exact(
        extract_host_edges(synth_linked_pages(docs)), k=k
    )


# --- incoming anchor-text profiles --------------------------------------

# Small deterministic anchor-text pool: link d->t carries
# "<pool[(d+t) % 10]> site<t>" as its anchor body, so every target host
# accumulates a varied but exactly replayable incoming-term profile.
ANCHOR_WORDS: tuple[str, ...] = (
    "visit", "best", "official", "news", "cheap",
    "blog", "shop", "guide", "top", "review",
)

# One regex run captures BOTH pieces of every anchor; two extract_all
# calls (group 1 = target host, group 2 = body) return match-ordered
# lists, so positional pairing is exact in both engines.
ANCHOR_PAIR_RE = r'href="http://site([0-9]+)\.example\.com/[^"]*">([^<]*)</a>'


def synth_anchored_pages(docs: DataFrame) -> DataFrame:
    """synth_linked_pages with meaningful anchor bodies (fixture for the
    anchor-text operator; a real deployment feeds WARC html)."""
    spark = docs.sparkSession
    dim = F.broadcast(_host_links_dim(spark))
    with_h = docs.select(
        "doc_id", (F.col("doc_id") % N_HOST_SLOTS).alias("h")
    )
    pool = F.array(*[F.lit(w) for w in ANCHOR_WORDS])

    def _anchor(t):
        word = F.element_at(
            pool, ((F.col("doc_id") + F.col(t)) % 10 + 1).cast("int")
        )
        return F.concat(
            F.lit('<a href="http://site'),
            F.col(t).cast("string"),
            F.lit(".example.com/d"),
            F.col("doc_id").cast("string"),
            F.lit('">'),
            word,
            F.lit(" site"),
            F.col(t).cast("string"),
            F.lit("</a>"),
        )

    return with_h.join(dim, "h").select(
        "doc_id",
        "h",
        F.concat(
            F.lit("<html><body><h1>site"),
            F.col("h").cast("string"),
            F.lit("</h1>"),
            _anchor("t1"),
            _anchor("t2"),
            _anchor("t3"),
            _anchor("t4"),
            F.lit("</body></html>"),
        ).alias("html"),
    )


def anchor_text_profile(pages: DataFrame) -> DataFrame:
    """Incoming anchor-term profile per target host — the classic web-IR
    quality/relevance prior (anchor text describes the TARGET better than
    the target's own text; search and curation stacks aggregate it per
    host/URL alongside link-based ranks).

    (host, term, n_links, n_src_hosts): term = lowercased space-split
    token of the anchor body; n_links = total incoming anchors carrying
    the term; n_src_hosts = DISTINCT linking hosts carrying it (the
    spam-resistance count — one host repeating an anchor a million times
    moves n_links but not n_src_hosts).

    Scale shape: the corpus is touched once — a narrow map (two
    regexp_extract_all runs over the same pattern, zipped positionally,
    exploded ~4x then ~2x) into ONE (dst, term) hash aggregate with
    map-side combine; count(DISTINCT src) rides the same exchange as a
    two-phase partial-distinct. Output is bounded by
    |hosts| x |anchor vocab|, never by the corpus — the same
    corpus-once/dim-sized-after discipline as extract_host_edges.
    """
    dsts = F.regexp_extract_all(F.col("html"), F.lit(ANCHOR_PAIR_RE), F.lit(1))
    txts = F.regexp_extract_all(F.col("html"), F.lit(ANCHOR_PAIR_RE), F.lit(2))
    pairs = F.zip_with(
        dsts,
        txts,
        lambda d, t: F.struct(d.alias("dst"), t.alias("txt")),
    )
    anchors = pages.select(
        F.col("h").alias("src"), F.explode(pairs).alias("a")
    ).select(
        "src",
        F.col("a.dst").cast("int").alias("dst"),
        F.col("a.txt").alias("txt"),
    )
    terms = anchors.select(
        "src",
        "dst",
        F.explode(
            F.filter(F.split(F.lower("txt"), " "), lambda w: w != "")
        ).alias("term"),
    )
    return terms.groupBy("dst", "term").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src").alias("n_src_hosts"),
    ).select(
        F.concat(
            F.lit("site"), F.col("dst").cast("string"), F.lit(".example.com")
        ).alias("host"),
        "term",
        F.col("n_links").cast("bigint").alias("n_links"),
        F.col("n_src_hosts").cast("bigint").alias("n_src_hosts"),
    )


# --- harmonic centrality (radius-truncated, exact) -----------------------

HC_RADIUS = 4
# lcm(1..4) = 12 makes every 1/d term integral: 12, 6, 4, 3
_HC_WEIGHTS = {1: 12, 2: 6, 3: 4, 4: 3}


def host_harmonic_exact(
    edges: DataFrame,
    radius: int = HC_RADIUS,
    max_hosts: int = MAX_EXACT_HOSTS,
    max_dist_pairs: int = MAX_HC_DIST_PAIRS,
) -> DataFrame:
    """Radius-truncated harmonic centrality over the extracted host graph —
    the OTHER rank Common Crawl publishes for its host web graph (harmonic
    centrality; Boldi & Vigna 2014 "Axioms for centrality"):

        HC(v) = sum_{u != v, d(u,v) <= radius} 1 / d(u,v)

    with d = directed shortest-path distance INTO v. Truncation at a fixed
    radius is the standard bounded variant; with lcm(1..4) = 12 every term
    is integral, so ``hc_scaled = 12*n1 + 6*n2 + 4*n3 + 3*n4`` is an EXACT
    bigint (n_d = hosts at shortest distance exactly d) and the float
    ``harmonic = hc_scaled / 12`` is one division at the end — the same
    exact-integer discipline as host_pagerank_exact.

    Shape: breadth-first expansion of the distance table, one round per
    radius step — every table is bounded by the radius-ball pair count of
    the HOST graph (never the corpus; the corpus was spent building
    ``edges``). Each round is a dim-sized join + left_anti against the
    known-distance table, cached per round (dedup_clusters' lineage
    discipline). The scale envelope is ENFORCED, not just documented:
    |hosts| is guarded by ``max_hosts`` and the accumulating distance
    table by ``max_dist_pairs`` per round (the lsh_oversized_buckets
    pattern — loud error, never a silent week-long straggler); full-web
    harmonic centrality at 10^8+ hosts is HyperBall (HLL counters per
    node) — approximate by construction and out of scope for a
    hash-exact gate. All per-round caches are unpersisted before
    returning (the result is eagerly localCheckpoint-ed first), so
    repeated invocations in a long-lived session do not accumulate
    executor storage.

    Same discard-dangling convention as PageRank: only crawled hosts
    (sources of at least one edge) count as sources and targets.
    """
    cached: list[DataFrame] = []
    try:
        return _harmonic_body(edges, radius, max_hosts, max_dist_pairs, cached)
    finally:
        # after the eager localCheckpoint (or a guard raise) every
        # intermediate cache mark is released — no storage accumulation
        # across invocations in a long-lived session
        for c in cached:
            c.unpersist()


def _harmonic_body(
    edges: DataFrame,
    radius: int,
    max_hosts: int,
    max_dist_pairs: int,
    cached: list[DataFrame],
) -> DataFrame:
    e = edges.select("src", "dst").distinct()
    crawled = e.select(F.col("src").alias("h")).distinct()
    _guard_host_dim(crawled.count(), max_hosts, "host_harmonic_exact hosts")
    live = (
        e.join(F.broadcast(crawled.select(F.col("h").alias("dst"))), "dst")
        .select("src", "dst")
        .cache()
    )
    cached.append(live)
    dist = live.withColumn("d", F.lit(1)).cache()
    cached.append(dist)
    n_dist = dist.count()
    _guard_host_dim(
        n_dist, max_dist_pairs, "host_harmonic_exact distance pairs (d=1)"
    )
    frontier = dist
    for r in range(2, radius + 1):
        step = (
            frontier.select(F.col("src"), F.col("dst").alias("mid"))
            .join(
                F.broadcast(live.select(F.col("src").alias("mid"), "dst")),
                "mid",
            )
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        nxt = step.join(
            dist.select("src", "dst"), ["src", "dst"], "left_anti"
        ).withColumn("d", F.lit(r)).cache()
        cached.append(nxt)
        n_dist += nxt.count()
        _guard_host_dim(
            n_dist,
            max_dist_pairs,
            f"host_harmonic_exact distance pairs (d<={r})",
        )
        dist = dist.unionByName(nxt).cache()
        cached.append(dist)
        frontier = nxt
    counts = (
        dist.where(F.col("src") != F.col("dst"))
        .groupBy("dst")
        .pivot("d", list(range(1, radius + 1)))
        .count()
        .na.fill(0)
    )
    ncols = [F.coalesce(F.col(str(d)), F.lit(0)).cast("bigint") for d in range(1, radius + 1)]
    scaled = sum(
        (F.lit(_HC_WEIGHTS[d]) * ncols[d - 1] for d in range(1, radius + 1)),
        F.lit(0),
    )
    out = counts.select(
        F.concat(
            F.lit("site"), F.col("dst").cast("string"), F.lit(".example.com")
        ).alias("host"),
        *[ncols[d - 1].alias(f"n_d{d}") for d in range(1, radius + 1)],
        scaled.cast("bigint").alias("hc_scaled"),
    )
    # crawled hosts nobody links to within R still appear (hc = 0)
    all_hosts = crawled.select(
        F.concat(
            F.lit("site"), F.col("h").cast("string"), F.lit(".example.com")
        ).alias("host")
    )
    out = all_hosts.join(out, "host", "left").na.fill(0)
    return out.select(
        "host",
        *[F.col(f"n_d{d}").cast("bigint").alias(f"n_d{d}") for d in range(1, radius + 1)],
        F.col("hc_scaled").cast("bigint").alias("hc_scaled"),
        F.round(F.col("hc_scaled") / 12.0, 6).alias("harmonic"),
    ).localCheckpoint(eager=True)


def host_harmonic(docs: DataFrame, radius: int = HC_RADIUS) -> DataFrame:
    """Full chain: synth pages -> extract outlinks -> harmonic centrality."""
    return host_harmonic_exact(
        extract_host_edges(synth_linked_pages(docs)), radius=radius
    )
