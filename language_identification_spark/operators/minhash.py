"""Config-driven MinHash-LSH — the production-parameter near-dup path.

Round-4 verdict #1: the MinHash path was hard-coded to 8 permutations in
4 bands of 2 (queries.py MINHASH_PERMS) — gate-sized toy parameters. The
configurations real pipelines ship are ~112 permutations in 14 bands of
8 rows (FineWeb; RedPajama-v2 runs 9x13) — at a Jaccard threshold s the
candidate probability is 1-(1-s^r)^b, so 14x8 gives ~0.9996 recall at
s=0.9 and a sharp cutoff below ~0.7 (Broder 1997 banding math; see
PAPERS.md). This module makes perms/bands CONFIG-DRIVEN with generated
permutation constants, so the same code runs the toy gate parameters
(existing gates unchanged) and the production parameters (new gates +
bench entry), and the recall/bucket-cap audits can be re-run at any
setting.

Engine discipline (identical to the toy path, queries.py
q_minhash_signatures):

- ONE md5 per DISTINCT (doc, shingle), then n universal-hash
  permutations ``(a*h + b) mod 2^32`` with a odd and a,b < 2^30 — the
  product stays < 2^62, no BIGINT overflow in either engine, and the n
  permutations are arithmetic on one base hash (n-x cheaper than
  hashing per permutation).
- Permutation constants are GENERATED deterministically from md5 of a
  salt+index (committed generator, not a blob): reproducible across
  sessions/engines with no RNG state.
- Banding explodes each signature into (band, bucket) keys; everything
  downstream is hash-aggregate / equi-join on those keys — the corpus
  never self-joins.
- ``max_bucket_size`` caps degenerate buckets (a boilerplate signature
  shared by 10^8 docs would make the within-bucket pairing quadratic);
  capping is a recall tradeoff and NEVER silent — the oversized-bucket
  audit emits what was dropped (the operators/similarity.py
  lsh_oversized_buckets pattern).

Scale shape at 10^12 docs: the corpus is touched once (shingle explode
-> distinct -> per-doc min-agg with map-side combine); signatures are
|docs| x n_perms; the banding shuffle keys are (band, bucket) — 14
rows per doc at production parameters. All caps/audits are gate- and
bench-verified at both toy and production parameters.

Reference anchor: the reference repo has no dedup operator; this is the
§2.11 LLM-data-pipeline family (SURVEY.md), built on public knowledge
(Broder 1997 resemblance/minwise permutations; FineWeb/RPv2 published
configurations).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from language_identification_spark.functions import char_ngrams_expr

# FineWeb-class production parameters: 112 perms = 14 bands x 8 rows.
PROD_N_PERMS = 112
PROD_BANDS = 14
PROD_ROWS_PER_BAND = 8

_PERM_SALT = "minhash-lsh-v1"


def gen_perms(n: int, salt: str = _PERM_SALT) -> list[tuple[int, int]]:
    """n deterministic universal-hash constants (a, b): a odd, a,b in
    [1, 2^30) — md5-derived from (salt, index), no RNG state, identical
    in every session and inlinable into the DuckDB oracle."""
    perms: list[tuple[int, int]] = []
    for i in range(n):
        d = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        a = (int(d[:8], 16) % (1 << 30)) | 1
        b = int(d[8:16], 16) % (1 << 30)
        perms.append((a, b))
    return perms


PROD_PERMS = gen_perms(PROD_N_PERMS)


def base_hash_expr(col) -> F.Column:
    """First 8 md5 hex digits -> uint32 as bigint — the shared base hash
    every permutation is arithmetic on (engine-identical)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def minhash_signatures(
    docs: DataFrame,
    perms: list[tuple[int, int]],
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signatures over char-``shingle_k``
    shingles — one distinct + one map-side-combined min aggregate."""
    shingles = docs.select(
        id_col, F.explode(char_ngrams_expr(text_col, shingle_k)).alias("sh")
    ).distinct()
    h = base_hash_expr("sh")
    hashed = shingles.select(
        id_col,
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(1 << 32)).alias(f"h{i}")
            for i, (a, b) in enumerate(perms)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(len(perms))]
    )


def band_assignments(
    sig: DataFrame,
    n_bands: int,
    rows_per_band: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, bucket): one row per (doc, band); bucket is the ':'
    join of the band's ``rows_per_band`` signature values."""
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_band_buckets(
    docs: DataFrame,
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Buckets holding >1 doc — the candidate-cluster table. Two hash
    shuffles total; no quadratic join touches the corpus."""
    if n_bands * rows_per_band != len(perms):
        raise ValueError(
            f"{len(perms)} perms cannot band as {n_bands}x{rows_per_band}"
        )
    sig = minhash_signatures(docs, perms, shingle_k, id_col, text_col)
    bands = band_assignments(sig, n_bands, rows_per_band, id_col)
    return (
        bands.groupBy("band", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_bucket_pairs(
    docs: DataFrame,
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate (a, b) pairs, a < b. ``max_bucket_size``
    excludes degenerate buckets from pairing (recall tradeoff, never
    silent — audit with ``minhash_oversized_buckets`` at the same cap)."""
    sig = minhash_signatures(docs, perms, shingle_k, id_col, text_col)
    bands = band_assignments(sig, n_bands, rows_per_band, id_col)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        bands = (
            bands.withColumn("bucket_n", F.count("*").over(w))
            .filter(F.col("bucket_n") <= max_bucket_size)
            .drop("bucket_n")
        )
    return (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )


def minhash_oversized_buckets(
    docs: DataFrame,
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    max_bucket_size: int,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(band, bucket, n_members) rows the cap excluded — write to the
    run's metrics table so capping is observable."""
    sig = minhash_signatures(docs, perms, shingle_k, id_col, text_col)
    bands = band_assignments(sig, n_bands, rows_per_band, id_col)
    return (
        bands.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
    )


def minhash_recall_eval(
    docs: DataFrame,
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    max_doc: int,
    threshold: float,
    shingle_k: int = 5,
) -> DataFrame:
    """Measured candidate quality at ANY parameterization: candidate
    pairs (shared band bucket) scored against exact char-shingle Jaccard
    >= threshold ground truth on the doc_id < max_doc universe (exact
    truth is quadratic — the fixed eval sample is the standard audit).
    One row: (n_truth, n_cand, n_tp, precision, recall)."""
    universe = docs.filter(F.col("doc_id") < max_doc)
    cand = minhash_bucket_pairs(
        universe, perms, n_bands, rows_per_band, shingle_k
    )
    sh = universe.select(
        "doc_id", F.explode(char_ngrams_expr("text", shingle_k)).alias("sh")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    truth = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
        .join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "a").withColumnRenamed(
                    "sz", "sza"
                )
            ),
            "a",
        )
        .join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "b").withColumnRenamed(
                    "sz", "szb"
                )
            ),
            "b",
        )
        .filter(
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
            >= threshold
        )
        .select("a", "b")
    )
    tp = truth.join(cand, ["a", "b"]).select("a", "b")
    agg = (
        truth.select(F.count("*").alias("n_truth"))
        .crossJoin(cand.select(F.count("*").alias("n_cand")))
        .crossJoin(tp.select(F.count("*").alias("n_tp")))
    )
    return agg.select(
        F.col("n_truth").cast("bigint").alias("n_truth"),
        F.col("n_cand").cast("bigint").alias("n_cand"),
        F.col("n_tp").cast("bigint").alias("n_tp"),
        F.round(
            F.when(F.col("n_cand") > 0, F.col("n_tp") / F.col("n_cand"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("precision"),
        F.round(
            F.when(F.col("n_truth") > 0, F.col("n_tp") / F.col("n_truth"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("recall"),
    )


# --- DuckDB oracle builders (same constants, same arithmetic) -------------


def _sig_ctes(
    perms: list[tuple[int, int]],
    shingle_k: int,
    where: str = "",
    src: str = "documents",
) -> str:
    cols = ",\n    ".join(
        f"min(({a} * h + {b}) % 4294967296) AS h{i}"
        for i, (a, b) in enumerate(perms)
    )
    return f"""shingles AS (
  SELECT DISTINCT doc_id, substring(text, i, {shingle_k}) AS sh
  FROM {src}, unnest(range(1, greatest(length(text) - {shingle_k - 1}, 0) + 1)) AS t(i)
  {where}
), hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(sh), 1, 8)) AS UINT32)::BIGINT AS h
  FROM shingles
), sig AS (
  SELECT doc_id,
    {cols}
  FROM hashed GROUP BY doc_id
)"""


def _bands_union(n_bands: int, rows_per_band: int) -> str:
    return "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, {expr} AS bucket FROM sig".format(
            b=b,
            expr=" || ':' || ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )


def minhash_band_buckets_sql(
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    shingle_k: int = 5,
) -> str:
    return f"""
WITH {_sig_ctes(perms, shingle_k)},
bands AS (
  {_bands_union(n_bands, rows_per_band)}
)
SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM bands GROUP BY band, bucket HAVING count(*) > 1
"""


def minhash_recall_eval_sql(
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    max_doc: int,
    threshold: float,
    shingle_k: int = 5,
) -> str:
    return f"""
WITH {_sig_ctes(perms, shingle_k, where=f"WHERE doc_id < {max_doc}")},
bands AS (
  {_bands_union(n_bands, rows_per_band)}
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc_id < y.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id
), truth AS (
  SELECT a, b FROM (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
    FROM shingles x JOIN shingles y USING (sh) WHERE x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
  ) p JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
  WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= {threshold}
), tp AS (SELECT a, b FROM truth INTERSECT SELECT a, b FROM cand)
SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
       (SELECT count(*) FROM cand)::BIGINT AS n_cand,
       (SELECT count(*) FROM tp)::BIGINT AS n_tp,
       round(CASE WHEN (SELECT count(*) FROM cand) > 0
         THEN (SELECT count(*) FROM tp) * 1.0 / (SELECT count(*) FROM cand)
         ELSE 0.0 END, 6) AS precision,
       round(CASE WHEN (SELECT count(*) FROM truth) > 0
         THEN (SELECT count(*) FROM tp) * 1.0 / (SELECT count(*) FROM truth)
         ELSE 0.0 END, 6) AS recall
"""


def minhash_dedup_pipeline_sql(
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    shingle_k: int = 5,
) -> str:
    """DuckDB replay of the END-TO-END production dedup: candidate pairs
    (shared band bucket) -> connected components (recursive-CTE closure,
    identical fixpoint to the Spark min-label propagation) -> keep-LONGEST
    representative per cluster (exact UTF-8 byte length, min-id ties) —
    the FineWeb/Dolma dedup composition at whatever parameters the
    candidates were generated with."""
    return f"""
WITH RECURSIVE {_sig_ctes(perms, shingle_k)},
bands AS (
  {_bands_union(n_bands, rows_per_band)}
), cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc_id < y.doc_id
), edges AS (
  SELECT a, b FROM cands UNION ALL SELECT b, a FROM cands
),
reach(node, lbl) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
),
final AS (SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node),
scored AS (
  SELECT f.cluster, f.doc_id,
         CAST(octet_length(encode(COALESCE(d.text, ''))) AS BIGINT) AS score
  FROM final f JOIN documents d ON d.doc_id = f.doc_id
),
mx AS (
  SELECT cluster, max(score) AS keep_score, count(*) AS n_docs
  FROM scored GROUP BY cluster
)
SELECT s.cluster, m.n_docs, m.keep_score, min(s.doc_id) AS keep_id
FROM scored s JOIN mx m ON m.cluster = s.cluster AND s.score = m.keep_score
GROUP BY s.cluster, m.n_docs, m.keep_score
"""


def minhash_bucket_cap_audit_sql(
    perms: list[tuple[int, int]],
    n_bands: int,
    rows_per_band: int,
    max_bucket_size: int,
    shingle_k: int = 5,
) -> str:
    return f"""
WITH {_sig_ctes(perms, shingle_k)},
bands AS (
  {_bands_union(n_bands, rows_per_band)}
), bucket_n AS (
  SELECT band, bucket, count(*) AS n_members FROM bands GROUP BY band, bucket
), capped AS (
  SELECT bs.doc_id, bs.band, bs.bucket
  FROM bands bs JOIN bucket_n b ON b.band = bs.band AND b.bucket = bs.bucket
  WHERE b.n_members <= {max_bucket_size}
), pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM capped x JOIN capped y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc_id < y.doc_id
), n_pairs AS (SELECT count(*)::BIGINT AS n_pairs_after_cap FROM pairs)
SELECT band, count(*)::BIGINT AS n_oversized,
       sum(n_members)::BIGINT AS n_excluded_members,
       (SELECT n_pairs_after_cap FROM n_pairs) AS n_pairs_after_cap
FROM bucket_n WHERE n_members > {max_bucket_size}
GROUP BY band
"""


def plan_bands(
    spark,
    n_perms: int = PROD_N_PERMS,
    t_num: int = 4,
    t_den: int = 5,
    max_r: int = 16,
):
    """Broder/MMDS banding planner: enumerate every (bands b, rows r) split
    with b*r <= n_perms, r <= max_r, and score it against a target Jaccard
    threshold t = t_num/t_den (default 0.8) — the config step that decides
    how a permutation budget becomes (bands, rows) (PAPERS.md: Broder '97;
    Leskovec MMDS ch.3 S-curve math). ``chosen`` is the s50-matching
    split (b*t^r closest to 1); production configs like 14x8 deliberately
    overshoot b to trade precision for recall — both live in the output.

    ALL arithmetic is exact-integer fixed point (ppm), so the oracle
    replays it bit-for-bit with no cross-engine float-pow hazard:
      tr_ppm     = floor(1e6 * t^r)           per-band collision prob at t
      dist_ppm   = floor(1e6 * |b*t^r - 1|)   how far the S-curve midpoint
                                              proxy b*t^r sits from 1
                                              (s50 = (1/b)^(1/r) == t  <=>
                                               b*t^r == 1)
      p_at_t_ppm = 1e6 - fold_b(acc*q//1e6)   exact left fold of
                                              1-(1-t^r)^b in floor-ppm
    t^r is computed by exact integer exponentiation (fold over
    array_repeat), never float pow. ``chosen`` marks the (dist_ppm, b)
    minimum — computed via a global min-struct aggregate broadcast back
    (planner table is <= n_perms*max_r rows; no single-partition window).

    Driver-side cost: none (pure DataFrame plan from spark.range).
    """
    r = spark.range(1, max_r + 1).select(F.col("id").alias("r"))
    b = spark.range(1, n_perms + 1).select(F.col("id").alias("b"))
    pairs = (
        r.crossJoin(b)
        .where(F.col("b") * F.col("r") <= F.lit(n_perms))
        .withColumn(
            "p_num",
            F.expr(
                f"aggregate(array_repeat(CAST({t_num} AS BIGINT), "
                "CAST(r AS INT)), CAST(1 AS BIGINT), (acc, x) -> acc * x)"
            ),
        )
        .withColumn(
            "p_den",
            F.expr(
                f"aggregate(array_repeat(CAST({t_den} AS BIGINT), "
                "CAST(r AS INT)), CAST(1 AS BIGINT), (acc, x) -> acc * x)"
            ),
        )
        .withColumn("tr_ppm", F.expr("(1000000 * p_num) div p_den"))
        .withColumn(
            "dist_ppm",
            F.expr("(1000000 * abs(b * p_num - p_den)) div p_den"),
        )
        .withColumn(
            "p_at_t_ppm",
            F.expr(
                "CAST(1000000 AS BIGINT) - aggregate("
                "array_repeat(1000000 - tr_ppm, CAST(b AS INT)), "
                "CAST(1000000 AS BIGINT), (acc, x) -> (acc * x) div 1000000)"
            ),
        )
        .select(
            F.col("b").cast("bigint"),
            F.col("r").cast("bigint"),
            (F.col("b") * F.col("r")).cast("bigint").alias("n_used"),
            "tr_ppm",
            "dist_ppm",
            "p_at_t_ppm",
        )
    )
    best = pairs.agg(
        F.min(F.struct("dist_ppm", "b")).alias("m")
    ).select(F.col("m.dist_ppm").alias("_bd"), F.col("m.b").alias("_bb"))
    return (
        pairs.join(F.broadcast(best))
        .withColumn(
            "chosen",
            (F.col("dist_ppm") == F.col("_bd")) & (F.col("b") == F.col("_bb")),
        )
        .drop("_bd", "_bb")
    )


def plan_bands_sql(
    n_perms: int = PROD_N_PERMS,
    t_num: int = 4,
    t_den: int = 5,
    max_r: int = 16,
) -> str:
    """DuckDB oracle for plan_bands — identical integer fixed-point
    arithmetic: recursive CTE for exact t^r numerator/denominator powers,
    recursive CTE for the left floor-fold of (1-t^r)^b in ppm."""
    return f"""
WITH RECURSIVE pw(r, p_num, p_den) AS (
  SELECT 1, CAST({t_num} AS BIGINT), CAST({t_den} AS BIGINT)
  UNION ALL
  SELECT r + 1, p_num * {t_num}, p_den * {t_den} FROM pw WHERE r < {max_r}
),
pairs AS (
  SELECT b.b, pw.r, b.b * pw.r AS n_used,
         (1000000 * p_num) // p_den AS tr_ppm,
         (1000000 * abs(b.b * p_num - p_den)) // p_den AS dist_ppm
  FROM pw, (SELECT unnest(range(1, {n_perms} + 1)) AS b) b
  WHERE b.b * pw.r <= {n_perms}
),
fold(b, r, i, acc) AS (
  SELECT b, r, CAST(0 AS BIGINT), CAST(1000000 AS BIGINT) FROM pairs
  UNION ALL
  SELECT b, r, i + 1, (acc * q.tr) // 1000000
  FROM fold JOIN (SELECT b AS fb, r AS fr, 1000000 - tr_ppm AS tr
                  FROM pairs) q ON q.fb = fold.b AND q.fr = fold.r
  WHERE i < b
),
pp AS (
  SELECT b, r, 1000000 - acc AS p_at_t_ppm FROM fold WHERE i = b
),
best AS (
  SELECT dist_ppm AS bd, b AS bb FROM pairs ORDER BY dist_ppm, b LIMIT 1
)
SELECT CAST(p.b AS BIGINT) AS b, CAST(p.r AS BIGINT) AS r,
       CAST(n_used AS BIGINT) AS n_used, tr_ppm, dist_ppm,
       pp.p_at_t_ppm,
       (dist_ppm = best.bd AND p.b = best.bb) AS chosen
FROM pairs p JOIN pp ON pp.b = p.b AND pp.r = p.r, best
"""
