"""Fuzzy matcher (J7/J8): grouped-map applyInPandas == row-wise oracle."""

from language_identification_spark.operators.fuzzy import (
    fuzzy_topk_dfs,
    fuzzy_topk_oracle,
)

VOCAB = [
    "schwarzenegger", "schwartz", "sandwich", "swatch", "water",
    "waterfall", "watermelon", "morning", "mourning", "running",
    "cunning", "hello", "yellow", "mellow",
]
# misspelling-style queries (the reference's Schwarzenegger eval set pattern,
# dictionary_langid/datatypes.py ~710-790)
QUERIES = ["schwarzeneger", "watter", "morninng", "helo", "xyzzy"]


def test_fuzzy_matches_oracle(spark):
    got = {}
    for r in fuzzy_topk_dfs(spark, VOCAB, QUERIES, k=3).collect():
        got.setdefault(r["query"], []).append((r["rank"], r["word"], r["dist"]))
    oracle = fuzzy_topk_oracle(VOCAB, QUERIES, k=3)
    for q in QUERIES:
        want = [(i + 1, w, d) for i, (w, d) in enumerate(oracle[q])]
        assert sorted(got.get(q, [])) == want, q


def test_fuzzy_top1_is_correction(spark):
    rows = fuzzy_topk_dfs(spark, VOCAB, QUERIES, k=1).collect()
    top1 = {r["query"]: r["word"] for r in rows}
    assert top1["schwarzeneger"] == "schwarzenegger"
    assert top1["watter"] == "water"
    assert top1["morninng"] == "morning"
    assert top1["helo"] == "hello"


def test_fuzzy_no_shared_bigram_no_rows(spark):
    rows = fuzzy_topk_dfs(spark, ["abc"], ["xyz"], k=3).collect()
    assert rows == []


# ---------------------------------------------------------------------------
# J8/F12: positional-EMD matcher (ApproxWordList3, datatypes.py:477-617)
# ---------------------------------------------------------------------------


def test_emd_fast_equals_slow_property():
    """The reference's dual-implementation cross-check as a property test:
    the alignment DP equals the defining recursion on random location sets."""
    import random

    from language_identification_spark.oracle.emd import emd_1d_fast, emd_1d_slow

    rng = random.Random(13)
    grid = [i / 20 for i in range(21)]
    for _ in range(400):
        xs = rng.sample(grid, rng.randint(0, 5))
        ys = rng.sample(grid, rng.randint(0, 5))
        assert abs(emd_1d_fast(xs, ys) - emd_1d_slow(xs, ys)) < 1e-9, (xs, ys)


def test_emd_basics():
    from language_identification_spark.oracle.emd import emd_1d

    assert emd_1d([], []) == 0.0
    assert emd_1d([0.5], []) == 1.0
    assert emd_1d([0.0, 1.0], [0.0, 1.0]) == 0.0
    assert emd_1d([0.0], [0.25]) == 0.25
    # one unmatched point costs 1 + best match for the rest
    assert emd_1d([0.0, 1.0], [0.0]) == 1.0


EMD_VOCAB = [
    "schwarzenegger", "schwartz", "sandwich", "water", "waterfall",
    "morning", "mourning", "running", "hello", "yellow", "banana", "bandana",
]


def test_emd_oracle_reference_golden():
    """Captured reference ApproxWordList3((2,4)).lookup outputs (score 3dp,
    Damerau-Levenshtein): the 0.9*top cutoff drops every non-correction."""
    from language_identification_spark.operators.fuzzy import emd_fuzzy_oracle

    got = emd_fuzzy_oracle(
        EMD_VOCAB, ["schwarzeneger", "watter", "bananna"], top_k=3
    )
    assert got["schwarzeneger"] == [("schwarzenegger", 0.894, 1, 1)]
    assert got["watter"] == [("water", 0.614, 1, 1)]
    assert got["bananna"] == [("banana", 0.659, 1, 1)]


def test_emd_spark_matches_oracle(spark):
    from language_identification_spark.operators.fuzzy import (
        emd_fuzzy_oracle,
        emd_fuzzy_topk,
    )

    queries = ["schwarzeneger", "watter", "morninng", "helo", "bananna", "Water"]
    vdf = spark.createDataFrame([(w,) for w in EMD_VOCAB], "word string")
    qdf = spark.createDataFrame([(q,) for q in queries], "query string")
    got: dict = {}
    for r in emd_fuzzy_topk(vdf, qdf, top_k=5).collect():
        got.setdefault(r["query"], []).append(
            (r["word"], r["score"], r["dl"], r["rank"])
        )
    oracle = emd_fuzzy_oracle(EMD_VOCAB, queries, top_k=5)
    for q in queries:
        assert sorted(got.get(q, [])) == sorted(oracle[q]), q
    # exact-word query: score 1.0, rank 1, case-insensitive
    assert got["Water"][0][0] == "water" and got["Water"][0][1] == 1.0


def test_emd_short_query_no_crash():
    """A 1-char query has zero n=4 grams; the reference divides by that gram
    count and raises ZeroDivisionError — we define the contribution as 0.0
    so one short query cannot kill a distributed rescore task."""
    from language_identification_spark.operators.fuzzy import emd_fuzzy_oracle

    got = emd_fuzzy_oracle(["a", "apple", "banana"], ["a"], top_k=3)
    assert got["a"], got
    assert got["a"][0][0] == "a" and got["a"][0][3] == 1  # exact match first
