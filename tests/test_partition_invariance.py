"""Partition-count invariance: the correctness half of the N->4N scaling claim.

BENCH/BASELINE.md evidences that the flagship pipeline scales from N to 4N
cores at >= 0.8 efficiency. This module pins the other half of that claim:
moving to 4N executors changes the PARTITIONING (more shuffle partitions,
different input splits, different partial-aggregation grouping) — and the
output must not change AT ALL. Every row, including the float ppl column and
the drop_reasons arrays, must be identical whether the job ran over 2 input
splits with 3 shuffle partitions or 32 splits with 31 shuffle partitions.

Why this holds structurally (and what the test would catch if it stopped
holding): the enrichment UDF computes stats/langid/ppl PER DOCUMENT inside
one Arrow batch — no cross-document float accumulation — and every
cross-document aggregate in the pipeline (metrics, langdist) is an integer
count. A refactor that, say, normalised ppl by a corpus-level float mean
would silently break 4N-vs-N reproducibility; this test is the tripwire.

Battery queries with float aggregates (doc_perplexity's avg(logp),
tfidf/dsir log-weights) are exercised the same way via their emitted
(already-rounded) columns — the same values the DuckDB gate hashes.
"""

from __future__ import annotations

import pytest

from language_identification_spark.fixtures import pages_df, training_corpus
from language_identification_spark.operators.lid import train_ngram_model_spark
from language_identification_spark.operators.perplexity import train_kn_spark
from language_identification_spark.oracle.quality import QualityConfig
from language_identification_spark.plans.pipeline import (
    langdist_plan,
    metrics_plan,
    quality_filter_plan,
)
SF = "/root/testdata/sf0.001"

# battery queries chosen for float-aggregation exposure + shuffle diversity:
# per-doc float avg (doc_perplexity), corpus-level idf logs (tfidf_keywords),
# importance-ratio logs (dsir_select), fused-UDF pipeline (quality_pipeline),
# salted two-phase agg (host_stats_salted)
INVARIANCE_QUERIES = [
    "doc_perplexity",
    "tfidf_keywords",
    "dsir_select",
    "quality_pipeline",
    "host_stats_salted",
]


def _rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def _with_partitioning(spark, n_shuffle: int):
    """Set a runtime shuffle-partition count (AQE still coalesces on top,
    which is itself part of what must not affect values)."""
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))


def test_pipeline_output_invariant_to_partitioning(spark):
    corpus = spark.createDataFrame(training_corpus(), schema="lang string, text string")
    model = train_ngram_model_spark(spark, corpus)
    kn = train_kn_spark(corpus)
    pages = pages_df(spark, 250)
    cfg = QualityConfig(max_ppl=40.0)

    outs = []
    for splits, shuffles in ((2, 3), (32, 31)):
        _with_partitioning(spark, shuffles)
        try:
            res = quality_filter_plan(
                pages.repartition(splits), model, config=cfg, kn_models=kn
            )
            outs.append(
                (
                    _rows(res, ["url"]),
                    _rows(metrics_plan(res), ["rule"]),
                    _rows(langdist_plan(res), ["lang_pred"]),
                )
            )
        finally:
            _with_partitioning(spark, 8)  # conftest default
    (rows_a, met_a, lang_a), (rows_b, met_b, lang_b) = outs
    assert len(rows_a) == 250 and rows_a == rows_b  # bit-equal incl. float ppl
    assert met_a == met_b
    assert lang_a == lang_b


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_battery_query_invariant_to_partitioning(spark, name):
    # the driver-facing registry (quality_pipeline and friends live there,
    # composed on top of the core QUERIES map)
    import __spark_entry__ as entry

    qs = entry.queries()
    outs = []
    for shuffles in (3, 31):
        _with_partitioning(spark, shuffles)
        try:
            df = qs[name](spark, SF)
            outs.append(_rows(df, df.columns))
        finally:
            _with_partitioning(spark, 8)
    assert outs[0], name  # non-empty — an empty/empty match proves nothing
    assert outs[0] == outs[1], name
