"""Duplicated-substring removal (operators/spandedup.py): span semantics
at k=3 on a hand corpus, plus DuckDB gate parity including the
fully-covered -> '' edge the sf testdata may not contain."""

from __future__ import annotations

import duckdb

from language_identification_spark.operators.spandedup import (
    exact_substring_dedup,
)
from language_identification_spark.queries import SQL_SPAN_DEDUP, q_span_dedup

DOCS_K3 = [
    (0, "a b c d e"),
    (1, "x a b c y"),  # shares 'a b c' with doc 0
    (2, "p q r p q r p q"),  # every 3-gram repeats WITHIN the doc
    (3, "u v"),  # fewer than k tokens: no grams, untouched
    (4, None),
]


def test_span_semantics_k3(spark):
    docs = spark.createDataFrame(DOCS_K3, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.dedup_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(docs, k=3).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    # 'a b c' occurs twice corpus-wide: positions 0-2 covered in doc 0,
    # 1-3 in doc 1; remove-all contract drops BOTH copies
    assert got[0] == ("d e", 5, 3)
    assert got[1] == ("x y", 5, 3)
    # within-doc repetition counts toward the >=2 threshold
    assert got[2] == ("", 8, 8)
    assert got[3] == ("u v", 2, 0)


def test_gate_parity_with_full_coverage(spark):
    import os
    import tempfile

    ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = [
        (1, ten),  # identical 10-token docs: fully covered at k=8
        (2, ten),
        (3, "only one copy of this particular sentence exists here today"),
        # %6==0 pair: the injected boiler itself duplicates across them,
        # so its spans are removed from both (engines must agree on the
        # injection + the removal)
        (6, "short text"),
        (12, ten + " trailing unique suffix tokens here"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    odf = (
        con.execute(SQL_SPAN_DEDUP).df().sort_values("doc_id").reset_index(drop=True)
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(os.path.join(d, "documents.parquet"))
        sdf = (
            q_span_dedup(spark, d)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert len(sdf) == len(odf) == len(docs)
    for i in range(len(sdf)):
        s, o = sdf.iloc[i], odf.iloc[i]
        assert int(s.doc_id) == int(o.doc_id)
        assert s.dedup_text == o.dedup_text, (s.doc_id, s.dedup_text, o.dedup_text)
        assert int(s.n_tokens) == int(o.n_tokens)
        assert int(s.n_removed) == int(o.n_removed)
    by = {int(r.doc_id): r for _, r in sdf.iterrows()}
    # docs 1/2 fully covered -> empty reconstruction on BOTH engines
    assert by[1].dedup_text == "" and int(by[1].n_removed) == 10
    assert by[2].dedup_text == ""
    # doc 12: ten-token prefix (shared with 1/2) AND the injected boiler
    # (shared with doc 6) both removed; only the unique middle survives
    assert by[12].dedup_text == "trailing unique suffix tokens here"
    assert int(by[12].n_removed) == 10 + 12
    # truly unique doc untouched
    assert int(by[3].n_removed) == 0


def test_keep_first_semantics_k3(spark):
    """keep_first=True: per duplicated gram the (min doc_id, min pos)
    occurrence keeps its tokens; all other occurrences are scrubbed."""
    docs = spark.createDataFrame(DOCS_K3, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.dedup_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(docs, k=3, keep_first=True).collect()
    }
    # 'a b c' duplicated across docs 0/1: doc 0 holds the elected first
    # occurrence and keeps EVERYTHING; doc 1's copy is scrubbed
    assert got[0] == ("a b c d e", 5, 0)
    assert got[1] == ("x y", 5, 3)
    # within-doc repeats: each duplicated 3-gram keeps its FIRST position.
    # 'p q r' at pos 0/3, 'q r p' at 1/4, 'r p q' at 2/5: elected firsts
    # cover 0..4 as kept; non-elected occurrences cover 3..7. Overlap
    # means elected copies still lose tokens where a DIFFERENT gram's
    # non-elected occurrence lands — positions 3..7 are covered, 0..2
    # survive (the gram-granular semantics the docstring pins)
    assert got[2] == ("p q r", 8, 5)
    assert got[3] == ("u v", 2, 0)
    # superset property: keep_first never removes MORE than remove-all
    all_rm = {
        r.doc_id: r.n_removed for r in exact_substring_dedup(docs, k=3).collect()
    }
    assert all(got[d][2] <= all_rm[d] for d in got)


def test_keep_first_brute_force_equality(spark):
    """Implementation == a pure-Python replay of the contract on a corpus
    with cross-doc dups, within-doc dups, overlap chains, and a tie on pos
    across docs (doc_id breaks it)."""
    corpus = [
        (10, "a b c d e f"),
        (11, "z a b c d w"),
        (12, "a b c a b c a b"),
        (13, "m n o"),
        (14, "z a b c d w"),  # doc 11 is the elected copy of every gram
    ]
    k = 3

    def toks(t):
        return [w for w in t.split() if w]

    grams = {}  # gram -> [(doc, pos)]
    for d, t in corpus:
        ws = toks(t)
        for p in range(len(ws) - k + 1):
            grams.setdefault(" ".join(ws[p : p + k]), []).append((d, p))
    expected = {}
    cov = {d: set() for d, _ in corpus}
    for occs in grams.values():
        if len(occs) < 2:
            continue
        first = min(occs)
        for d, p in occs:
            if (d, p) != first:
                cov[d].update(range(p, p + k))
    for d, t in corpus:
        ws = toks(t)
        kept = [w for i, w in enumerate(ws) if i not in cov[d]]
        expected[d] = (" ".join(kept), len(ws), len(cov[d]))

    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.dedup_text, r.n_tokens, r.n_removed)
        for r in exact_substring_dedup(docs, k=k, keep_first=True).collect()
    }
    assert got == expected
    # spot the election: every duplicated gram doc 10 carries is elected AT
    # doc 10 (lowest id), so it keeps its text intact; doc 14's four gram
    # windows are all non-elected copies (of docs 10/11), covering every
    # position
    assert got[10] == ("a b c d e f", 6, 0)
    assert got[14] == ("", 6, 6)


def test_lang_mix_sample_monotone_and_calibrated(spark):
    """Raising a weight only ADDS documents (monotone in weight — mix
    ablations share their common subset), and achieved rates track the
    weights on the sf0.01 corpus."""
    from language_identification_spark.operators.mixer import lang_mix_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    low = lang_mix_sample(docs, {"en": 0.25})
    high = lang_mix_sample(docs, {"en": 0.75})
    kept_low = {r.doc_id for r in low.filter("mix_keep").collect()}
    kept_high = {r.doc_id for r in high.filter("mix_keep").collect()}
    assert kept_low < kept_high  # strict superset: monotone, and 25% < 75%

    en = low.filter("lang = 'en'")
    rate = en.filter("mix_keep").count() / en.count()
    assert 0.13 < rate < 0.37  # 218 docs: loose binomial band around 0.25
    # non-weighted languages untouched
    other = low.filter("lang <> 'en'")
    assert other.filter("mix_keep").count() == other.count()


def test_temperature_mix_sample_flattens_toward_alpha(spark):
    """alpha=0.5 temperature sampling: the smallest language is kept whole
    (threshold == denom), every larger language's integer threshold is
    exactly floor(sqrt(n_min/n)*denom), and achieved keep counts track the
    flattened targets within a loose binomial band."""
    import math

    from language_identification_spark.operators.mixer import (
        MIX_DENOM,
        temperature_mix_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = temperature_mix_sample(docs, alpha=0.5)
    rows = out.groupBy("lang", "n_docs", "mix_thr").count().collect()
    n_min = min(r.n_docs for r in rows)
    for r in rows:
        assert r.mix_thr == math.floor(
            math.sqrt(n_min / r.n_docs) * MIX_DENOM
        )
    smallest = [r for r in rows if r.n_docs == n_min]
    assert all(r.mix_thr == MIX_DENOM for r in smallest)
    # head language (en, 218 docs vs min 64) downsampled near sqrt ratio
    kept = {
        r.lang: r["count"]
        for r in out.filter("mix_keep").groupBy("lang").count().collect()
    }
    en_total = next(r.n_docs for r in rows if r.lang == "en")
    target = math.sqrt(n_min / en_total)
    assert abs(kept["en"] / en_total - target) < 0.15
