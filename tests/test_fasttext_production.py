"""Production-shaped .ftz end-to-end (round-3 verdict item 3).

Builds a ``.ftz`` with the published lid.176.ftz's SHAPE — 176 labels,
dim 16, minn 2 / maxn 4, bucket 2,000,000, pruned dictionary with a
100,000-entry pruneidx (``quantize -cutoff 100000``), 200k-word vocabulary,
2-byte-dsub product quantizer with quantized row norms (``-qnorm``) — whose
weights are TRAINED on the 11-language fixture corpus (softmax SGD,
operators/fasttext_train.py), then drives it through the numpy engine and
the flagship pipeline's fused Arrow pass in real Python workers.

The real published weights still need network (sources/fetch.py
``ensure_model`` pins their URL/sha256 — reference fasttext_wrapper.py:13-33);
this closes the synthetic-only caveat as far as the sandbox allows.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

from language_identification_spark.fixtures import (
    pages_df,
    training_corpus,
)
from language_identification_spark.operators.fasttext_np import load_model
from language_identification_spark.operators.fasttext_train import (
    build_production_ftz,
)
from language_identification_spark.oracle.langid import NgramNBModel


@pytest.fixture(scope="module")
def ftz(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ftz") / "prod_lid.ftz")
    trained = build_production_ftz(path, training_corpus())
    return path, trained


def test_production_shape(ftz):
    path, _ = ftz
    m = load_model(path)
    assert len(m.labels) == 176
    assert all(l.startswith("__label__") for l in m.labels)
    assert len(m.words) == 200_000
    assert m.input.shape == (300_000, 16)  # nwords + 100k kept buckets
    assert m.output.shape == (176, 16)
    assert m.pruneidx is not None and len(m.pruneidx) == 100_000
    assert m.args.bucket == 2_000_000
    assert (m.args.minn, m.args.maxn) == (2, 4)
    # same order of magnitude as the published lid.176.ftz (917 KB); ours
    # carries a bigger dict (200k entries) so a few MB is the honest size
    assert os.path.getsize(path) < 12_000_000


def test_build_is_deterministic(ftz, tmp_path):
    path, _ = ftz
    path2 = str(tmp_path / "again.ftz")
    build_production_ftz(path2, training_corpus())
    h1 = hashlib.sha256(open(path, "rb").read()).hexdigest()
    h2 = hashlib.sha256(open(path2, "rb").read()).hexdigest()
    assert h1 == h2


def test_quantized_accuracy_on_training_corpus(ftz):
    """The PQ round trip must preserve the trained signal: >= 0.95 top-1 on
    the training corpus (measured 1.0 — including the ms/id near-identical
    pair), and quantization never flips a prediction vs the dense model."""
    path, trained = ftz
    m = load_model(path)
    corpus = training_corpus()
    ok = agree = 0
    for lang, text in corpus:
        p = m.predict(text, k=1)
        pd_ = trained.predict(text, k=1)
        ok += bool(p and p[0][0] == f"__label__{lang}")
        agree += bool(p and pd_ and p[0][0] == pd_[0][0])
    assert ok / len(corpus) >= 0.95
    assert agree / len(corpus) >= 0.99


def test_pipeline_fused_pass_with_ftz(spark, ftz):
    """The flagship pipeline scores with the production .ftz in real
    workers, stays ONE ArrowEvalPython node, and its language calls agree
    with the NB path on the clean fixture pages. The native lib is absent;
    when the plumbing test's addPyFile'd stand-in is importable it
    delegates real model files to the numpy engine, and
    test_ftz_agreement_udf_vs_direct proves worker scoring is numpy-engine
    byte-identical either way."""
    path, _ = ftz
    from language_identification_spark.plans.pipeline import (
        quality_filter_plan,
    )

    model = NgramNBModel.train(training_corpus())
    pages = pages_df(spark, 250)
    ft_plan = quality_filter_plan(pages, model, fasttext_model_path=path)
    nb_plan = quality_filter_plan(pages, model)
    # fastText scoring fuses into the SAME enrichment pass: its plan has
    # exactly as many Python nodes as the NB plan (extract + enrich — the
    # text-col variant is pinned to 1 node by test_plans)
    n_ft = (
        ft_plan._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("ArrowEvalPython")
    )
    n_nb = (
        nb_plan._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("ArrowEvalPython")
    )
    assert n_ft == n_nb == 2
    ft = {
        r["url"]: r["lang_pred"]
        for r in ft_plan.select("url", "lang_pred").collect()
    }
    nb = {
        r["url"]: (r["lang_pred"], r["extracted_text"])
        for r in nb_plan.select(
            "url", "lang_pred", "extracted_text"
        ).collect()
    }
    assert set(ft) == set(nb)
    scored = [u for u, (l, t) in nb.items() if t and l is not None]
    agree = sum(ft[u] == nb[u][0] for u in scored)
    # both models are trained on the same 11-language corpus; the fixture's
    # adversarial 40% (mixed-lang, boilerplate, mojibake docs) is where
    # they may legitimately differ
    assert agree / len(scored) >= 0.8, agree / len(scored)


def test_ftz_agreement_udf_vs_direct(spark, ftz):
    """Worker-side scoring == driver-side scoring for the same file: the
    lazy per-executor load path introduces no drift."""
    path, _ = ftz
    from language_identification_spark.operators import lid

    m = load_model(path)
    texts = [t for _, t in training_corpus()[:40]]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = (
        df.repartition(4)
        .select("text", lid.fasttext_lid_udf(path)(F.col("text")).alias("r"))
        .collect()
    )
    got = {r["text"]: (r["r"]["lang"], round(r["r"]["conf"], 10)) for r in rows}
    for t in texts:
        lbl, prob = m.predict(t.replace("\n", " "), k=1)[0]
        assert got[t] == (lbl.removeprefix("__label__"), round(prob, 10))
