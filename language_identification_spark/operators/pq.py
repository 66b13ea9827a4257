"""Product-quantization encoding — the compression half of IVF-PQ ANN.

The `.ftz` fastText reader (operators/fasttext_np.py) DECODES product-
quantized matrices; this is the distributed ENCODE direction: split each
embedding into M contiguous subvectors and replace each with the id of
its nearest subspace centroid — 64 floats become M small codes (with
K=256 in production, one byte each), the standard memory trade that lets
a 10^12-vector index live in RAM (Jegou et al., TPAMI 2011).

Codebook: dimension-shaped (M x K rows) and enters via broadcast — the
corpus never shuffles for it. Training it is Lloyd iterations per
subspace (exactly the kmeans_ivf_train shape, reused verbatim at
production); the gate derives a deterministic codebook from the first K
vectors so both engines replay it from the parquet alone.

Cross-engine determinism: squared distance is composed from three
list_dot_product-parity dot products (the verified _dot primitive) in a
fixed expression order, rounded to 6 dp, and the argmin tie-break is
total (dist, code). Assignment is a row_number window per (vec, sub) —
partitioned by the id, so at web scale the window rides the explode's
narrow partitioning; no corpus-wide sort exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    """Left-to-right double dot product (bit-identical to DuckDB
    list_dot_product on DOUBLE[] — queries.py:_dot)."""
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"),
            b.cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector's M subvectors to their nearest centroid.

    ``codebook``: (sub, code, cent) with cent an array of sub_dim floats —
    M x K rows, broadcast. Returns (vec_id, sub, code, dist) with dist
    the rounded squared distance of the winning centroid.

    Vectors whose length is not m*sub_dim are EXCLUDED up front: a short
    subvector makes zip_with pad with NULLs, every distance goes NULL,
    and Spark's NULLS FIRST ascending sort would silently assign code 0
    (review finding) — a malformed embedding must not become a quiet
    wrong answer.
    """
    emb = emb.filter(F.size(F.col(vec_col)) == m * sub_dim)
    subs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice(
                            F.col(vec_col), j * sub_dim + 1, sub_dim
                        ).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.sub", "s.sv")
    sv, cent = F.col("sv"), F.col("cent")
    dist = F.round(
        _dot(sv, sv) - 2.0 * _dot(sv, cent) + _dot(cent, cent), 6
    )
    scored = subs.join(F.broadcast(codebook), "sub").select(
        "vec_id", "sub", "code", dist.alias("dist")
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("dist"), F.asc("code")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id",
            F.col("sub").cast("int").alias("sub"),
            F.col("code").cast("int").alias("code"),
            "dist",
        )
    )


def codebook_from_first_k(
    emb: DataFrame,
    m: int,
    sub_dim: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic fixture codebook: subvectors of the first K vectors
    (production swaps in per-subspace Lloyd centroids — same shape)."""
    return (
        emb.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("int").alias("code"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            F.slice(
                                F.col(vec_col), j * sub_dim + 1, sub_dim
                            ).alias("cent"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s"),
        )
        .select(
            F.col("s.sub").alias("sub"),
            "code",
            F.col("s.cent").alias("cent"),
        )
    )
