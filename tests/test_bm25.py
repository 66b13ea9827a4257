"""BM25 retrieval: scores vs a pure-Python oracle, plan shape at scale."""

import math

from pyspark.sql import Row

from language_identification_spark.operators.bm25 import bm25_topk

CORPUS = [
    (1, "spark window spark stream"),
    (2, "vector vector vector vector vector"),
    (3, "window stream window stream window stream"),
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "spark"),
    (6, ""),
    (7, "stream   stream"),  # double space -> empty tokens must not count
]
TERMS = ["spark", "vector", "stream"]
K1, B = 1.2, 0.75


def py_bm25(corpus, terms, k1=K1, b=B):
    docs = {i: [w for w in t.split(" ") if w] for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    df = {
        t: sum(1 for ws in docs.values() if t in ws) for t in terms
    }
    out = {}
    for i, ws in docs.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_python_oracle(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in CORPUS]
    )
    got = {
        r.doc_id: r.score for r in bm25_topk(docs, TERMS, k=10).collect()
    }
    assert got == py_bm25(CORPUS, TERMS)


def test_bm25_rank_is_total_and_k_bounded(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in CORPUS]
    )
    rows = bm25_topk(docs, TERMS, k=3).collect()
    assert len(rows) == 3
    assert [r.rank for r in rows] == [1, 2, 3]
    # rank order: score desc, doc_id asc
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_bm25_plan_shape(spark):
    """100 TB contract: df_t and corpus stats re-enter via broadcast (the
    corpus side never reshuffles for them), top-k is TakeOrderedAndProject
    (never a global Sort+collect)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        bm25_topk(docs, TERMS, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_null_text_docs_do_not_corrupt_avgdl(spark):
    from pyspark.sql import Row

    base = [Row(doc_id=i, text=t) for i, t in CORPUS]
    with_nulls = base + [Row(doc_id=100 + i, text=None) for i in range(50)]
    a = {r.doc_id: r.score for r in bm25_topk(
        spark.createDataFrame(base), TERMS, k=10).collect()}
    b = {r.doc_id: r.score for r in bm25_topk(
        spark.createDataFrame(with_nulls), TERMS, k=10).collect()}
    # NULL docs are excluded entirely: identical stats, identical scores
    assert a == b


def test_duplicate_terms_are_set_semantics(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in CORPUS])
    a = {(r.doc_id, r.score) for r in bm25_topk(docs, TERMS, k=10).collect()}
    b = {(r.doc_id, r.score) for r in bm25_topk(docs, TERMS + TERMS, k=10).collect()}
    assert a == b
