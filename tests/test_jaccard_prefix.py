"""Exactness + plan shape of the prefix-filtered Jaccard self-join.

The prefix filter (AllPairs / SSJoin family) must lose NO qualifying pair:
q_jaccard_join_prefix at threshold 0.8 must return exactly the pairs the
brute-force quadratic join finds at >= 0.8, on a corpus engineered to stress
the filter (near-identical clones just at/below the threshold, shared
boilerplate shingles that would dominate a naive join, size-mismatched
supersets the length filter must prune without dropping true pairs).
"""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from language_identification_spark.queries import (
    JACCARD_PREFIX_T_DEN,
    JACCARD_PREFIX_T_NUM,
    q_jaccard_join_prefix,
)


def _shingles(text: str, k: int = 3) -> set[str]:
    ws = text.split(" ")
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def _brute_force(docs: list[tuple[int, str]]) -> list[tuple[int, int, float]]:
    tn, td = JACCARD_PREFIX_T_NUM, JACCARD_PREFIX_T_DEN
    sets = {i: _shingles(t) for i, t in docs if _shingles(t)}
    out = []
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and td * inter >= tn * union:
            out.append((a, b, round(inter / union, 6)))
    return out


BOILER = "all rights reserved contact us terms of service apply here"


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    base = (
        "the quick brown fox jumps over the lazy dog near the riverbank "
        "while autumn leaves drift slowly past the old stone bridge"
    )
    words = base.split(" ")
    docs = []
    # ten exact/near clones of the base doc: single-word edits at varying
    # positions -> jaccard just above and just below 0.8
    for i in range(10):
        w = list(words)
        for j in range(i):
            w[2 * j + 1] = f"edit{i}_{j}"
        docs.append((i, " ".join(w)))
    # shared boilerplate tail on unrelated bodies: common shingles with high
    # doc-frequency that the prefix filter must exclude from the join key
    for i in range(10, 30):
        body = " ".join(f"unique{i}_{j}" for j in range(15))
        docs.append((i, body + " " + BOILER))
    # a superset doc (base + long tail) the length filter prunes vs base
    docs.append((30, base + " " + " ".join(f"tail{j}" for j in range(40))))
    # short docs below shingle width
    docs.append((31, "too short"))
    docs.append((32, ""))
    d = tmp_path_factory.mktemp("jacc")
    spark.createDataFrame(docs, schema="doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d), docs


def test_prefix_join_equals_brute_force(spark, corpus_dir):
    sf_dir, docs = corpus_dir
    got = [
        (r["a"], r["b"], r["jaccard"])
        for r in q_jaccard_join_prefix(spark, sf_dir).collect()
    ]
    want = _brute_force(docs)
    assert want, "fixture must produce at least one qualifying pair"
    # the boilerplate-only overlaps must NOT qualify (they share shingles but
    # sit far below the threshold) — proves the fixture stresses the filter
    assert any(a >= 10 for a, _, _ in want) is False
    assert got == want


def test_prefix_join_no_cartesian_and_bounded_windows(spark, corpus_dir):
    sf_dir, _ = corpus_dir
    plan = q_jaccard_join_prefix(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    # the ranking window partitions by doc_id — never a single-partition
    # global exchange (the battery-wide discipline from test_plans)
    assert "SinglePartition" not in plan


def test_prefix_length_never_empty():
    # sz - ceil(t*sz) + 1 >= 1 for every sz >= 1 at t = 4/5
    tn, td = JACCARD_PREFIX_T_NUM, JACCARD_PREFIX_T_DEN
    for sz in range(1, 2000):
        assert sz - ((tn * sz + tn) // td) + 1 >= 1
