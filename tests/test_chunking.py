"""Overlapping chunking: coverage/overlap invariants, edges, plan shape."""

import hashlib

import pytest
from pyspark.sql import Row

from language_identification_spark.operators.chunking import chunk_documents


def _chunks(spark, corpus, size, stride):
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in corpus])
    return chunk_documents(
        docs, chunk_size=size, stride=stride
    ).collect()


def test_every_token_covered_and_overlap_exact(spark):
    corpus = [(i, " ".join(f"t{j}" for j in range(5 + i * 13))) for i in range(8)]
    rows = _chunks(spark, corpus, size=10, stride=7)
    tok_count = {i: 5 + i * 13 for i, _ in corpus}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = tok_count[doc_id]
        covered = set()
        for r in chunks:
            assert r.start_tok == r.chunk_idx * 7
            assert r.chunk_len == min(10, n - r.start_tok)
            covered.update(range(r.start_tok, r.start_tok + r.chunk_len))
        assert covered == set(range(n)), doc_id
        # no chunk starts past the end; minimal chunk count
        assert chunks[-1].start_tok < n
        if len(chunks) > 1:
            assert chunks[-2].start_tok + 10 < n or len(chunks) == 2


def test_chunk_md5_matches_python(spark):
    text = " ".join(f"w{j}" for j in range(20))
    rows = _chunks(spark, [(1, text)], size=8, stride=6)
    words = text.split(" ")
    for r in rows:
        expect = hashlib.md5(
            " ".join(words[r.start_tok : r.start_tok + 8]).encode()
        ).hexdigest()
        assert r.chunk_md5 == expect


def test_short_and_empty_docs(spark):
    rows = _chunks(spark, [(1, "only three words"), (2, ""), (3, "  ")], 64, 48)
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].chunk_len == 3 and rows[0].chunk_idx == 0


def test_invalid_params_raise(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, stride=9)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0, stride=1)


def test_chunking_is_zero_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
