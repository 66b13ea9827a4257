"""Similarity search over embedding columns: brute-force cosine + LSH bucketing.

Brute-force variants use numpy matmul inside ``mapInPandas`` — each Arrow
batch of corpus vectors multiplies against a broadcast query matrix (BLAS,
~100x faster than per-pair SQL expression trees). Per-batch top-k then a tiny
global top-k keeps the shuffle to k rows per batch — the standard distributed
top-k reduction.

Scale path (100 TB): brute-force against a broadcast query matrix is linear
scan per query set — right for reranking and small query batches. For
corpus-vs-corpus near-dup at scale use ``lsh_bucket_pairs``: random-hyperplane
signatures bucket the join (same banding idea as MinHash-LSH for text), so
candidate generation is an equi-join on (band, sig) instead of a cross join.

Cross-engine note: numpy float64 matmul differs from sequential summation in
the last ~2 ulps; outputs round cosines to 4 dp and rank on full precision, so
DuckDB oracles agree unless two cosines tie within ~1e-12 (never observed on
the test vectors).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized_matrix(rows: list[tuple[int, list[float]]]) -> tuple[np.ndarray, np.ndarray]:
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors in ``corpus`` for every row of ``queries``.

    queries is collected + broadcast (must be the small side); the corpus is
    streamed through numpy matmul per Arrow batch. Output:
    (query_id, neighbor_id, rank, cos[4dp]) with total tie-break.
    """
    spark = corpus.sparkSession
    q_rows = [(r[id_col], list(r[vec_col])) for r in queries.select(id_col, vec_col).collect()]
    q_ids, q_mat = _normalized_matrix(q_rows)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = "query_id long, neighbor_id long, cos double"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
            c_norms[c_norms == 0] = 1.0
            sims = (c_mat / c_norms) @ mat_q.T  # (batch, n_queries)
            if exclude_self:
                mask = c_ids[:, None] == ids_q[None, :]
                sims[mask] = -np.inf
            # per-batch top-k per query keeps the shuffle tiny
            kk = min(k, sims.shape[0])
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            rows = []
            for qi in range(len(ids_q)):
                for ci in idx[:, qi]:
                    if np.isfinite(sims[ci, qi]):
                        rows.append((int(ids_q[qi]), int(c_ids[ci]), float(sims[ci, qi])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partial = corpus.select(id_col, vec_col).mapInPandas(compute, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def _exact_dot(a, b):
    """Left-to-right double summation — bit-identical to DuckDB
    list_dot_product on DOUBLE[] (same formulation as queries._dot)."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_with_plane(v, plane: list[float]):
    """v . plane with literal coefficients via the sequential HOF fold.

    Measured note: an unrolled 64-term `+` tree looks codegen-friendly but
    actually lands in interpreted evaluation at ~80 us/dot (the projection's
    expression count blows the codegen limits), while the zip_with/aggregate
    fold — though CodegenFallback itself — evaluates at ~9 us/dot. Keep the
    fold, and keep the evaluation count down structurally (materialization
    barrier below) instead of micro-optimizing the expression."""
    return _exact_dot(v, F.array(*[F.lit(x) for x in plane]))


def lsh_planes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes, shared verbatim by the Spark plan and
    the DuckDB oracle (inlined as float literals — repr round-trips exactly)."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def lsh_near_dup_topn(
    emb: DataFrame,
    top_n: int = 20,
    n_planes: int = 24,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-N near-dup pairs via LSH candidates + exact rerank — the 100 TB
    shape: signature bits -> band signatures -> bucketed self-join (never
    all-pairs, never a driver collect), exact cosine computed ONLY for
    candidate pairs by joining the embeddings back on each side (two
    id-keyed shuffle joins of the candidate table — candidate volume, not
    corpus-squared volume).

    All float math is the sequential-sum JVM expression (not numpy) so sign
    bits AND cosines are bit-identical to a DuckDB list_dot_product oracle
    built from the same inlined planes — the gate compares this exact plan
    against SQL that replays the identical candidate generation.
    Output: (rank, a, b, cos[4dp]), ties broken totally.
    """
    planes = lsh_planes(dim, n_planes, seed)
    bits_per_band = n_planes // bands
    p = emb.sparkSession.sparkContext.defaultParallelism
    v = F.col(vec_col)
    # Stage 1: the 24 plane dots as PLAIN COLUMNS with an exchange barrier
    # after them. Inlining the dot trees into the band-signature structs
    # (CollapseProject does this eagerly) builds a ~10k-node expression per
    # row that falls out of whole-stage codegen AND is re-evaluated by BOTH
    # sides of the self-join — measured 26 s vs ~1 s with the barrier. The
    # exchange materializes rows, so each dot runs exactly once per vector
    # and everything downstream references cheap column refs.
    dots = emb.select(
        F.col(id_col).alias("vid"),
        *[
            _dot_with_plane(v, plane).alias(f"d{i}")
            for i, plane in enumerate(planes)
        ],
    ).repartition(p)
    band_structs = []
    for k in range(bands):
        sig = None
        for j in range(bits_per_band):
            bit = F.when(F.col(f"d{k * bits_per_band + j}") > 0, 1).otherwise(0)
            term = bit * F.lit(1 << j)
            sig = term if sig is None else sig + term
        band_structs.append(F.struct(F.lit(k).alias("band"), sig.alias("sig")))
    sigs = dots.select(
        "vid", F.explode(F.array(*band_structs)).alias("bs")
    ).select("vid", "bs.band", "bs.sig")
    # the candidate table is BYTES-tiny (two longs per pair) but each row
    # carries a 64-term dot in the rerank — AQE's size-based coalescing
    # would collapse the post-distinct shuffle to one partition and run
    # every dot on one core (measured: 3.5 s single-task tail). Re-spread
    # by the compute parallelism instead; at real scale candidate volume is
    # large enough that AQE sizing is right on its own.
    cands = (
        sigs.alias("x")
        .join(sigs.alias("y"), ["band", "sig"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("a"), F.col("y.vid").alias("b"))
        .distinct()
        .repartition(p)
    )
    # norms once per VECTOR (N rows), not once per PAIR: the pair table is
    # the big side, so the 2 extra dot products per pair were 2/3 of the
    # rerank cost. Values are identical (same expression over the same
    # array), so the DuckDB oracle may still compute norms inline.
    normed = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        F.sqrt(_exact_dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    ea = normed.select(
        F.col("nid").alias("a"), F.col("nv").alias("va"), F.col("norm").alias("na")
    )
    eb = normed.select(
        F.col("nid").alias("b"), F.col("nv").alias("vb"), F.col("norm").alias("nb")
    )
    cos = _exact_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = (
        cands.join(F.broadcast(ea), "a")
        .join(F.broadcast(eb), "b")
        .select("a", "b", cos.alias("cos"))
    )
    # top-N via orderBy+limit = TakeOrderedAndProject: per-partition local
    # top-N then a driver merge of N rows per partition. A global
    # Window.orderBy here would exchange EVERY candidate pair to one
    # partition and evaluate the cos projection there on one core
    # (measured 3.5 s of a 4 s query at sf0.1); rank is then a window over
    # only the N surviving rows.
    topn = scored.orderBy(F.desc("cos"), F.asc("a"), F.asc("b")).limit(top_n)
    w = Window.orderBy(F.desc("cos"), F.asc("a"), F.asc("b"))
    return (
        topn.withColumn("rank", F.row_number().over(w))
        .select("rank", "a", "b", F.round("cos", 4).alias("cos"))
    )


def lsh_near_dup_topn_sql(
    top_n: int = 20,
    n_planes: int = 24,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """DuckDB oracle replaying lsh_near_dup_topn's exact candidate generation
    and rerank from the same inlined planes."""
    planes = lsh_planes(dim, n_planes, seed)
    bits_per_band = n_planes // bands
    bit_cols = ",\n    ".join(
        "CASE WHEN list_dot_product(v, [{vals}]::DOUBLE[]) > 0 THEN 1 ELSE 0 END AS bit{i}".format(
            vals=", ".join(repr(x) for x in plane), i=i
        )
        for i, plane in enumerate(planes)
    )
    sig_cols = ",\n    ".join(
        " + ".join(
            f"bit{k * bits_per_band + j} * {1 << j}" for j in range(bits_per_band)
        )
        + f" AS sig{k}"
        for k in range(bands)
    )
    bands_union = "\n  UNION ALL\n  ".join(
        f"SELECT vid, {k} AS band, sig{k} AS sig FROM sigs" for k in range(bands)
    )
    return f"""
WITH p AS (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
), bits AS (
  SELECT vid, v,
    {bit_cols}
  FROM p
), sigs AS (
  SELECT vid,
    {sig_cols}
  FROM bits
), bands AS (
  {bands_union}
), cands AS (
  SELECT DISTINCT x.vid AS a, y.vid AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.vid < y.vid
), scored AS (
  SELECT a, b,
         list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
  FROM cands JOIN p ea ON ea.vid = a JOIN p eb ON eb.vid = b
)
SELECT rank, a, b, round(cos, 4) AS cos FROM (
  SELECT a, b, cos, row_number() OVER (ORDER BY cos DESC, a, b) AS rank FROM scored
) WHERE rank <= {top_n}
"""


def lsh_bucket_pairs(
    emb: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH candidate pairs — the 100 TB near-dup path.

    sign(v @ plane) bits -> ``bands`` band signatures per vector -> equi-join
    on (band, sig). Only candidates sharing a band signature are compared
    downstream, so the join is shuffle-by-signature instead of a cross join.
    Returns distinct candidate (a, b) pairs, a < b.

    ``max_bucket_size`` is the stop-shingle defense for skewed buckets (a
    boilerplate-dominated signature shared by 10^8 docs would make the
    within-bucket self-join quadratic): buckets above the cap are EXCLUDED
    from candidate generation — a recall tradeoff, not a correctness bug,
    and never silent: audit what was dropped with ``lsh_oversized_buckets``
    (same inputs, same cap) and record it in the run's metrics table.
    """
    sigs = _lsh_signatures(emb, n_planes, bands, seed, id_col, vec_col)
    if max_bucket_size is not None:
        # window count per bucket, then drop members of oversized buckets —
        # one extra shuffle on the SAME (band, sig) key the join needs
        w = Window.partitionBy("band", "sig")
        sigs = (
            sigs.withColumn("bucket_n", F.count("*").over(w))
            .filter(F.col("bucket_n") <= max_bucket_size)
            .drop("bucket_n")
        )
    return (
        sigs.alias("x")
        .join(sigs.alias("y"), ["band", "sig"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("a"), F.col("y.vid").alias("b"))
        .distinct()
    )


def lsh_oversized_buckets(
    emb: DataFrame,
    max_bucket_size: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Audit companion to ``lsh_bucket_pairs(max_bucket_size=...)``: the
    (band, sig, n_members) rows the cap excluded — write this to the run's
    metrics table so capping is observable, never silent."""
    sigs = _lsh_signatures(emb, n_planes, bands, seed, id_col, vec_col)
    return (
        sigs.groupBy("band", "sig")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
    )


def lsh_bucket_cap_audit_sql(
    max_bucket_size: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """DuckDB replay of ``lsh_oversized_buckets`` + capped
    ``lsh_bucket_pairs`` over the embeddings view: rebuilds the IDENTICAL
    numpy-seeded hyperplanes (default_rng(seed).standard_normal((dim,
    n_planes)) — _lsh_signatures' plane layout, transposed vs lsh_planes),
    re-derives the (band, sig) buckets, and emits per-band oversized-bucket
    stats plus the global surviving candidate-pair count. Sign bits agree
    with numpy's BLAS dots unless a |dot| falls within float summation-order
    noise (~1e-14; measured minimum on the testdata is ~2e-5)."""
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    bits_per_band = n_planes // bands
    bit_cols = ",\n    ".join(
        "CASE WHEN list_dot_product(v, [{vals}]::DOUBLE[]) > 0 THEN 1 ELSE 0 END AS bit{j}".format(
            vals=", ".join(repr(float(x)) for x in planes[:, j]), j=j
        )
        for j in range(n_planes)
    )
    # sig packs chunk[0] as the MOST significant bit (int(''.join(bits), 2))
    sig_cols = ",\n    ".join(
        " + ".join(
            f"bit{k * bits_per_band + j} * {1 << (bits_per_band - 1 - j)}"
            for j in range(bits_per_band)
        )
        + f" AS sig{k}"
        for k in range(bands)
    )
    bands_union = "\n  UNION ALL\n  ".join(
        f"SELECT vid, {k} AS band, sig{k} AS sig FROM sigs" for k in range(bands)
    )
    return f"""
WITH p AS (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
), bits AS (
  SELECT vid,
    {bit_cols}
  FROM p
), sigs AS (
  SELECT vid,
    {sig_cols}
  FROM bits
), bandsigs AS (
  {bands_union}
), bucket_n AS (
  SELECT band, sig, count(*) AS n_members FROM bandsigs GROUP BY band, sig
), capped AS (
  SELECT bs.vid, bs.band, bs.sig
  FROM bandsigs bs JOIN bucket_n b ON b.band = bs.band AND b.sig = bs.sig
  WHERE b.n_members <= {max_bucket_size}
), pairs AS (
  SELECT DISTINCT x.vid AS a, y.vid AS b
  FROM capped x JOIN capped y ON x.band = y.band AND x.sig = y.sig AND x.vid < y.vid
), n_pairs AS (SELECT count(*)::BIGINT AS n_pairs_after_cap FROM pairs)
SELECT band, count(*)::BIGINT AS n_oversized,
       sum(n_members)::BIGINT AS n_excluded_members,
       (SELECT n_pairs_after_cap FROM n_pairs) AS n_pairs_after_cap
FROM bucket_n WHERE n_members > {max_bucket_size}
GROUP BY band
"""


def _lsh_signatures(
    emb: DataFrame,
    n_planes: int,
    bands: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vid, band, sig) rows via numpy sign bits against seeded hyperplanes
    — shared by candidate generation and the bucket-size audit (identical
    planes => identical buckets)."""
    rng = np.random.default_rng(seed)
    dim = len(emb.select(vec_col).first()[0])
    planes = rng.standard_normal((dim, n_planes))
    bc = emb.sparkSession.sparkContext.broadcast(planes)
    bits_per_band = n_planes // bands

    def signature(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (mat @ pl) > 0  # (n, n_planes)
            rows = []
            for i, vid in enumerate(pdf[id_col]):
                for band in range(bands):
                    chunk = bits[i, band * bits_per_band : (band + 1) * bits_per_band]
                    sig = int("".join("1" if b else "0" for b in chunk), 2)
                    rows.append((int(vid), band, sig))
            yield pd.DataFrame(rows, columns=["vid", "band", "sig"])

    return emb.select(id_col, vec_col).mapInPandas(
        signature, schema="vid long, band int, sig long"
    )
