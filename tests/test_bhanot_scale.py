"""Full bhanot dictionary at real vocabulary scale (round-3 verdict item 7).

The dictionary/fuzzy gates run on fixture-sized vocabularies; this suite
ingests the reference's COMPLETE Malay-English dictionary (~9.6k headwords,
~14k sense rows after the reference's own numbered-sense + ';' expansion —
bhanot/bhanot_dictionary.py:15570-15589) through the same ingestion +
lookup + fuzzy operators the gates use, on a real vocabulary's length/
collision distribution. Skipped when the reference blob is absent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.dictionary import (
    BHANOT_SRC,
    export_bhanot_csv,
    lookup_terms,
    read_bilingual_dictionary,
)

pytestmark = [
    pytest.mark.bhanot,
    pytest.mark.skipif(
        not os.path.exists(BHANOT_SRC),
        reason="reference bhanot dictionary not present",
    ),
]


@pytest.fixture(scope="module")
def entries(spark, tmp_path_factory):
    csv_path = export_bhanot_csv(str(tmp_path_factory.mktemp("bhanot")))
    return read_bilingual_dictionary(spark, csv_path).cache()


def test_full_ingestion_shape(entries):
    n = entries.count()
    assert n > 9_000, n  # the full dictionary, not a sample
    row = entries.first()
    assert row["dict_id"] == "[zsm] Malay-English.csv"
    assert row["term_lang"] == "malay" and row["def_lang"] == "english"
    # casefolded both sides, entry_id dense from 0
    assert entries.filter(F.col("term") != F.lower(F.col("term"))).count() == 0
    ids = entries.agg(
        F.min("entry_id").alias("lo"), F.max("entry_id").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    assert ids["lo"] == 0 and ids["hi"] == ids["n"] - 1


def test_lookup_self_retrieval_at_scale(spark, entries):
    """Queries built from every 80th term must retrieve their own entry at
    rank 1 (n_shared = full token overlap beats any partial overlap;
    ties broken by entry_id, and the query IS the term)."""
    terms = [
        r["term"]
        for r in entries.select("term", "entry_id")
        .filter(F.length("term") >= 6)
        .orderBy("entry_id")
        .collect()
    ][::80]
    queries = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "query_id long, text string"
    )
    top1 = (
        lookup_terms(entries, queries, k=1)
        .select("query_id", "term")
        .collect()
    )
    got = {r["query_id"]: r["term"] for r in top1}
    hits = sum(got.get(i) == t for i, t in enumerate(terms))
    # multi-sense rows share the same term string: top-1 may be a different
    # entry_id but must be the same TERM for >= 95% (a few single-token
    # terms tie with superstring terms sharing the token)
    assert hits / len(terms) >= 0.95, hits / len(terms)


def test_fuzzy_candidate_join_on_real_vocabulary(spark, entries):
    """The bigram candidate join + DL re-score against the full 9.6k-word
    headword vocabulary: a deterministic single-char deletion must recover
    the original word at rank 1 for >= 90% of probes (the rest lose to a
    genuinely closer real word — correct behavior, not a miss)."""
    from language_identification_spark.operators.fuzzy import fuzzy_topk

    words = sorted(
        {
            r["term"]
            for r in entries.select("term").collect()
            if " " not in r["term"] and len(r["term"]) >= 7
        }
    )
    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    probes = words[::60]
    queries = spark.createDataFrame(
        [(w[:3] + w[4:],) for w in probes], "query string"
    )
    out = fuzzy_topk(vocab, queries, k=3).filter(F.col("rank") == 1).collect()
    got = {r["query"]: r["word"] for r in out}
    hits = sum(got.get(w[:3] + w[4:]) == w for w in probes)
    assert hits / len(probes) >= 0.90, hits / len(probes)
    # every probe produced candidates (the bigram join never starves on a
    # real vocabulary's gram distribution)
    assert len(got) == len(probes)
