"""PQ encoding vs a numpy oracle + plan shape."""

import numpy as np

from language_identification_spark.operators.pq import (
    codebook_from_first_k,
    pq_encode,
)

SF = "/root/testdata/sf0.001"
M, D, K = 8, 8, 4


def test_pq_assignment_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    cents = {
        (j, c): vecs[c][j * D : (j + 1) * D]
        for c in range(K)
        for j in range(M)
    }
    cb = codebook_from_first_k(emb, m=M, sub_dim=D, k=K)
    got = pq_encode(emb, cb, m=M, sub_dim=D).collect()
    assert len(got) == len(vecs) * M
    for r in got:
        sv = vecs[r.vec_id][r.sub * D : (r.sub + 1) * D]
        dists = {
            c: round(float(np.sum((sv - cents[(r.sub, c)]) ** 2)), 6)
            for c in range(K)
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        assert (r.code, r.dist) == best, (r.vec_id, r.sub)


def test_pq_plan_broadcasts_codebook(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb = codebook_from_first_k(emb, m=M, sub_dim=D, k=K)
    plan = (
        pq_encode(emb, cb, m=M, sub_dim=D)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_malformed_vectors_are_excluded_not_misassigned(spark):
    from pyspark.sql import Row

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    short = spark.createDataFrame(
        [Row(vec_id=10_000, embedding=[0.5] * 60, label=0)]
    )
    cb = codebook_from_first_k(emb, m=M, sub_dim=D, k=K)
    out = pq_encode(emb.unionByName(short), cb, m=M, sub_dim=D)
    ids = {r.vec_id for r in out.collect()}
    assert 10_000 not in ids  # excluded, not silently assigned code 0
