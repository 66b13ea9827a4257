"""Model-based quality filter (operators/qualityclf.py): the DCLM-style
learned keep/drop signal next to the heuristic rule battery. The gate
(`quality_classifier`) hash-verifies the corpus-scale scoring; these tests
pin the trainer's determinism/capacity and the scoring plan's shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from language_identification_spark.operators.qualityclf import (
    export_sql,
    label_heuristic,
    score_plan,
    train_quality_classifier,
)


def _toy_sample():
    # keep = long docs of "good" words; drop = short or junk-word docs —
    # a linearly separable toy the classifier must nail
    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    junk = "zzz yyy xxx www".split()
    sample = []
    for i in range(40):
        n = 45 + (i % 10)
        words = [good[(i + j) % len(good)] for j in range(n)]
        sample.append((True, " ".join(words)))
    for i in range(40):
        n = 5 + (i % 10)
        words = [junk[(i + j) % len(junk)] for j in range(n)]
        sample.append((False, " ".join(words)))
    return sample


def test_trainer_deterministic_and_learns():
    m1 = train_quality_classifier(_toy_sample())
    m2 = train_quality_classifier(_toy_sample())
    assert m1["words"] == m2["words"]
    assert np.array_equal(m1["vecs"], m2["vecs"])
    assert np.array_equal(m1["diff"], m2["diff"])
    # integer-exported model must classify its separable training set
    assert m1["train_acc"] >= 0.95


def test_label_heuristic():
    assert label_heuristic(" ".join(["w"] * 40)) is True
    assert label_heuristic(" ".join(["w"] * 39)) is False
    assert label_heuristic("") is False
    assert label_heuristic(None) is False


def test_score_plan_matches_driver_math_and_handles_nulls(spark):
    sample = _toy_sample()
    model = train_quality_classifier(sample)
    rows = [(i, t) for i, (_, t) in enumerate(sample)]
    rows.append((900, None))  # NULL text -> NULL outputs
    rows.append((901, "totally oov words only"))  # OOV -> EOS-only margin
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in score_plan(df, model).collect()}

    wid = {w: i for i, w in enumerate(model["words"])}
    for doc_id, text in rows:
        r = got[doc_id]
        if text is None:
            assert r["q_label"] is None and r["margin"] is None
            continue
        hidden = np.array(model["eos"], dtype=np.int64)
        hits = 0
        for w in text.split(" "):
            if w and w in wid:
                hidden = hidden + model["vecs"][wid[w]]
                hits += 1
        margin = int(np.dot(np.asarray(model["diff"], dtype=np.int64), hidden))
        assert r["margin"] == margin, doc_id
        assert r["n_hits"] == hits
        assert r["q_label"] == ("keep" if margin > 0 else "drop")


def test_scoring_plan_is_pure_jvm(spark):
    """No Python stage and no floats anywhere in the scoring plan: the
    margin must be whole-stage-codegen integer arithmetic over a broadcast
    vocab join."""
    model = train_quality_classifier(_toy_sample())
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    plan = score_plan(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # zero Python in the scoring path
    assert "BroadcastHashJoin" in plan  # vocab enters via broadcast


def test_export_sql_replays_exactly(spark, tmp_path):
    """DuckDB replay of the exported model over the same rows — exact
    integer equality, not approximate."""
    duckdb = pytest.importorskip("duckdb")
    sample = _toy_sample()
    model = train_quality_classifier(sample)
    rows = [(i, t) for i, (_, t) in enumerate(sample)] + [(900, None)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    pq = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(pq)

    spark_rows = {
        r["doc_id"]: (r["n_hits"], r["margin"], r["q_label"])
        for r in score_plan(df, model).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    duck_rows = {
        int(d): (None if h is None else int(h), None if m is None else int(m), q)
        for d, h, m, q in con.execute(export_sql(model)).fetchall()
    }
    assert spark_rows == duck_rows
