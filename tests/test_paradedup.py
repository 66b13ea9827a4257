"""Paragraph-level global dedup (operators/paradedup.py): semantics on a
hand-built corpus plus Spark-vs-DuckDB parity of the gate query."""

from __future__ import annotations

import duckdb
import pytest

from language_identification_spark.operators.paradedup import dedup_paragraphs
from language_identification_spark.queries import (
    SQL_PARAGRAPH_DEDUP,
    q_paragraph_dedup,
)

BOILER = "subscribe to our newsletter"

DOCS = [
    # doc 0 defines the boilerplate (first occurrence -> kept here only)
    (0, f"unique intro zero\n\n{BOILER}\n\nunique outro zero"),
    # doc 1 repeats it -> dropped; also repeats a paragraph WITHIN itself
    (1, f"{BOILER}\n\nrepeated inside\n\nrepeated inside\n\nunique one"),
    # doc 2 is ENTIRELY duplicates -> reconstructs to ''
    (2, f"{BOILER}\n\nrepeated inside"),
    # doc 3: single newlines do NOT split paragraphs
    (3, "line a\nline b\n\nline c"),
    (4, None),
    # doc 5: whitespace-padded copy trims to the same paragraph -> dropped
    (5, f"  {BOILER}  \n\nunique five"),
]


def test_dedup_semantics(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.dedup_text, r.n_kept, r.n_dropped)
        for r in dedup_paragraphs(docs).collect()
    }
    assert set(got) == {0, 1, 2, 3, 5}  # null-text doc 4 excluded
    assert got[0] == (
        f"unique intro zero\n\n{BOILER}\n\nunique outro zero", 3, 0,
    )
    # doc 1: boilerplate dropped (doc 0 owns it); first 'repeated inside'
    # kept, second dropped
    assert got[1] == ("repeated inside\n\nunique one", 2, 2)
    # doc 2: everything already seen -> empty reconstruction, still present
    assert got[2] == ("", 0, 2)
    # doc 3: \n alone never splits
    assert got[3] == ("line a\nline b\n\nline c", 2, 0)
    # doc 5: trimmed copy equals the original paragraph -> dropped
    assert got[5] == ("unique five", 1, 1)


def test_gate_parity(spark):
    import os
    import tempfile

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    odf = (
        con.execute(SQL_PARAGRAPH_DEDUP)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(DOCS, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(os.path.join(d, "documents.parquet"))
        sdf = (
            q_paragraph_dedup(spark, d)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert len(sdf) == len(odf)
    for i in range(len(sdf)):
        s, o = sdf.iloc[i], odf.iloc[i]
        assert int(s.doc_id) == int(o.doc_id)
        assert s.dedup_text == o.dedup_text, (s.doc_id, s.dedup_text, o.dedup_text)
        assert int(s.n_kept) == int(o.n_kept)
        assert int(s.n_dropped) == int(o.n_dropped)
    # the % 7 == 0 injection (doc 0) means the injected subscribe footer's
    # FIRST copy lives in doc 0's mutated text; parity above already pins
    # the cross-engine winner choice
    assert (sdf.n_kept + sdf.n_dropped > 0).all()
