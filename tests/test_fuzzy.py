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
