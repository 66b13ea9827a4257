"""Benchmark decontamination (operators/decontaminate.py) — operator-level
semantics on a hand-built corpus plus full Spark-vs-DuckDB parity of the
gate query's injection harness."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.decontaminate import (
    benchmark_grams,
    contaminated_docs,
)
from language_identification_spark.queries import (
    SQL_DECONTAMINATE,
    q_decontaminate,
)

EVAL_SENTENCE = "the capital of france is paris as everyone knows well"
FILLER = "completely unrelated filler content about weather and sports"


def test_operator_flags_exact_counts(spark):
    bench = spark.createDataFrame([(EVAL_SENTENCE,)], "text string")
    corpus = spark.createDataFrame(
        [
            # contains the full 10-token eval sentence -> 3 distinct 8-grams
            (1, f"intro words {EVAL_SENTENCE} outro words"),
            # repeats the SAME 8-gram twice -> still counts ONCE
            (
                2,
                "the capital of france is paris as everyone stop "
                "the capital of france is paris as everyone stop",
            ),
            (3, FILLER),  # clean
            (4, "short doc"),  # < 8 tokens
            (5, None),  # null text
            # case-insensitive match
            (6, "The Capital OF France IS Paris AS Everyone hears"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_contaminated, r.first_gram)
        for r in contaminated_docs(corpus, benchmark_grams(bench)).collect()
    }
    assert set(got) == {1, 2, 6}
    assert got[1][0] == 3  # 10-token window over an 8-gram -> 3 shared grams
    assert got[2][0] == 1  # dedup within doc
    assert got[6][0] == 1
    assert got[2][1] == "the capital of france is paris as everyone"


def test_gate_parity_and_injection(spark):
    """The q_decontaminate harness end-to-end on a synthetic documents
    table: every % 31 == 0 corpus doc gets a benchmark doc appended and
    must flag; the % 97 benchmark slice never appears in the output."""
    rows = []
    for i in range(200):
        if i % 97 == 0:
            rows.append((i, f"benchmark eval text number {i} " + EVAL_SENTENCE))
        else:
            rows.append((i, f"{FILLER} doc {i} with enough distinct tokens"))
    rows.append((201, None))

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    odf = (
        con.execute(SQL_DECONTAMINATE)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(os.path.join(d, "documents.parquet"))
        sdf = (
            q_decontaminate(spark, d)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert len(sdf) == len(odf)
    for i in range(len(sdf)):
        s, o = sdf.iloc[i], odf.iloc[i]
        assert int(s.doc_id) == int(o.doc_id)
        assert int(s.n_contaminated) == int(o.n_contaminated)
        assert s.first_gram == o.first_gram
    flagged = set(sdf.doc_id)
    # every injected doc (% 31 == 0, not a benchmark doc, non-null text)
    injected = {i for i, t in rows if i % 31 == 0 and i % 97 != 0 and t}
    assert injected <= flagged
    # benchmark docs are excluded from the corpus side entirely
    assert not any(i % 97 == 0 for i in flagged)
    assert (sdf.n_contaminated >= 1).all()