"""C4 line-level cleaning (operators/c4.py): each rule pinned on a
hand-built corpus, plus Spark-vs-DuckDB parity of the gate query."""

from __future__ import annotations

import duckdb

from language_identification_spark.operators.c4 import c4_line_filter
from language_identification_spark.queries import (
    SQL_C4_LINE_FILTER,
    q_c4_line_filter,
)

GOOD = "this line has more than enough words to survive."

DOCS = [
    # doc 0: three good sentences -> page kept
    (0, f"{GOOD}\nanother perfectly ordinary sentence with many words here.\n"
        f"a third ordinary sentence keeps the page alive!"),
    # doc 1: line rules — no terminal punct / short / ellipsis / javascript /
    # policy phrase all dropped; the one good line survives but 1 < 3
    # sentences -> page dropped
    (1, "unpunctuated line with plenty of words inside\n"
        "too short.\n"
        "this one trails off into the distance somehow...\n"
        "please enable javascript to view this fancy page.\n"
        "we explain our privacy policy in excruciating detail here.\n"
        f"{GOOD}"),
    # doc 2: page vetoes — lorem ipsum anywhere kills the page even with
    # three good sentences
    (2, f"{GOOD}\n{GOOD}\n{GOOD}\nlorem ipsum dolor sit amet."),
    # doc 3: curly bracket veto (in a DROPPED line — raw-text rule)
    (3, f"{GOOD}\n{GOOD}\n{GOOD}\nvar x = {{}}"),
    # doc 4: badword veto, word-bounded (raw-text rule)
    (4, f"{GOOD}\n{GOOD}\nsomeone wrote slurword in the comments today."),
    # doc 5: 'badwordish' does NOT match the word-bounded pattern
    (5, f"{GOOD}\n{GOOD}\nbadwordish terms are fine and stay untouched!"),
    # doc 6: every line fails -> empty reconstruction, keep=false
    (6, "nothing here ends with punctuation\nok."),
    (7, None),
    # doc 8: exactly 5 words passes the word rule; quote-terminated line ok
    (8, 'five words are just enough."\nfive words are just enough."\n'
        'five words are just enough."'),
]


def test_rule_semantics(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r.doc_id: r.asDict() for r in c4_line_filter(docs).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5, 6, 8}  # null text excluded

    assert got[0]["n_kept"] == 3 and got[0]["keep"] is True
    assert got[0]["n_sentences"] == 3

    # doc 1: only GOOD survives; page fails the 3-sentence rule
    assert got[1]["clean_text"] == GOOD
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (1, 5)
    assert got[1]["keep"] is False

    # page vetoes fire on raw text even when kept lines look fine
    assert got[2]["n_sentences"] >= 3 and got[2]["keep"] is False
    assert got[3]["keep"] is False
    assert got[4]["keep"] is False
    # word boundary: 'badwordish' is not a badword; 3 sentences kept
    assert got[5]["keep"] is True

    assert got[6] == {
        "doc_id": 6, "clean_text": "", "n_kept": 0, "n_dropped": 2,
        "n_sentences": 0, "keep": False,
    }
    # quote-terminated lines count as sentence ends via their '.'
    assert got[8]["n_kept"] == 3 and got[8]["keep"] is True


def test_gate_parity(spark):
    import os
    import tempfile

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    odf = (
        con.execute(SQL_C4_LINE_FILTER)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(DOCS, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(os.path.join(d, "documents.parquet"))
        sdf = (
            q_c4_line_filter(spark, d)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert len(sdf) == len(odf)
    for i in range(len(sdf)):
        s, o = sdf.iloc[i], odf.iloc[i]
        for col in ("doc_id", "n_kept", "n_dropped", "n_sentences"):
            assert int(s[col]) == int(o[col]), (col, s.doc_id)
        assert s.clean_text == o.clean_text, s.doc_id
        assert bool(s.keep) == bool(o.keep), s.doc_id


def test_ccnet_lang_buckets_exact_thirds(spark):
    """7 docs in one lang -> head {rn 1,2}, middle {3,4}, tail {5,6,7};
    ties broken by doc_id so the cut is deterministic."""
    from language_identification_spark.operators.quality import (
        ccnet_lang_buckets,
    )

    rows = [(i, "en", float(s)) for i, s in enumerate([5, 5, 5, 2, 9, 9, 7])]
    rows += [(100, "my", 4.0), (101, "my", 3.0)]  # n=2: head, tail (no middle)
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, score double")
    got = {r.doc_id: (r.lang_rank, r.bucket) for r in
           ccnet_lang_buckets(df, "score").collect()}
    # en ranking by (score, doc_id): 3(2.0) 0 1 2(5.0s by id) 6(7.0) 4 5(9.0s)
    assert got[3] == (1, "head") and got[0] == (2, "head")
    assert got[1] == (3, "middle") and got[2] == (4, "middle")
    assert got[6] == (5, "tail") and got[4] == (6, "tail") and got[5] == (7, "tail")
    # my (n=2): rn=1 -> 3 > 2 so not head, 3 <= 4 so middle; rn=2 -> tail.
    # Tiny groups legitimately have no head — the integer cut never
    # over-promotes when n < 3.
    assert got[101] == (1, "middle") and got[100] == (2, "tail")


def test_ccnet_histogram_variant_matches_exact_up_to_bin_granularity(spark):
    """The 10^12-doc histogram form (ccnet_buckets_histogram): cut bins
    cover >= 1/3 and >= 2/3 of each language; on scores with distinct bins
    per rank position it agrees with the exact-rank form; and its plan
    contains NO corpus sort on the language key (the whole point)."""
    from language_identification_spark.operators.quality import (
        ccnet_buckets_histogram,
        ccnet_lang_buckets,
    )

    # 9 docs, all-distinct bins -> histogram cuts == exact thirds
    rows = [(i, "en", 1.0 + i) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, score double")
    exact = {r.doc_id: r.bucket for r in ccnet_lang_buckets(df, "score").collect()}
    approx = {
        r.doc_id: r.bucket for r in ccnet_buckets_histogram(df, "score").collect()
    }
    assert exact == approx
    # tied scores share a bin and land in ONE bucket wholesale (the
    # documented granularity semantics): 6 docs of score 2.0 + 3 of 9.0 —
    # the 2.0 bin alone reaches 2/3, so all six are 'head', rest 'tail'
    rows = [(i, "en", 2.0) for i in range(6)] + [(i, "en", 9.0) for i in range(6, 9)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, score double")
    got = {r.doc_id: r.bucket for r in ccnet_buckets_histogram(df, "score").collect()}
    assert all(got[i] == "head" for i in range(6))
    assert all(got[i] == "tail" for i in range(6, 9))
    # plan: the only Sort is inside the window over the HISTOGRAM (post
    # partial-agg); assert no sort-merge join and no global sort of the
    # input relation — the scored side reaches the cuts via BroadcastHashJoin
    plan = (
        ccnet_buckets_histogram(df, "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
