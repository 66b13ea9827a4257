"""Winnowing: python-oracle parity, the w+k-1 match guarantee, plan shape."""

import hashlib

from pyspark.sql import Row

from language_identification_spark.operators.winnow import (
    winnow_fingerprints,
)

K, W = 5, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    n = len(text) - (k - 1)
    if n < w:
        return set()
    hs = [_h(text[i : i + k]) for i in range(n)]
    out = set()
    for j in range(n - w + 1):
        window = hs[j : j + w]
        m = min(window)
        # rightmost minimum
        pos = max(i for i, v in enumerate(window) if v == m)
        out.add((j + pos + 1, m))  # 1-based gram position
    return out


def test_matches_python_oracle(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abcdefghabcdefgh"),
        (3, "aaaaaaaaaaaa"),  # all-equal hashes: rightmost rule matters
        (4, "short"),  # n_grams(1) < w: no fingerprints
        (5, ""),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in texts])
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in texts:
        expect = py_winnow(t)
        assert got.get(i, set()) == expect, i


def test_shared_substring_guarantee(spark):
    """Any shared substring of length >= w+k-1 must share a fingerprint
    HASH between the two docs (the paper's correctness property)."""
    shared = "zqxvbnmkjh"  # 10 chars >= w+k-1 = 8, rare alphabet
    a = "first document prefix " + shared + " and a tail here"
    b = "completely different start " + shared + " other ending text"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b)]
    )
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2]


def test_density_and_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = winnow_fingerprints(docs, k=K, w=W)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # zero exchanges; ONE Arrow-batched map (the measured-faster path —
    # see the operator docstring)
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
    # density ~ 2/(w+1): sanity band, not exactness
    n_fp = out.count()
    n_chars = sum(
        r.n for r in docs.selectExpr("length(text) AS n").collect()
    )
    assert 0.1 < n_fp / n_chars < 0.8


def test_string_doc_ids_are_preserved(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id="url-a", text="the quick brown fox jumps over it")]
    )
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    assert rows and all(r.doc_id == "url-a" for r in rows)
