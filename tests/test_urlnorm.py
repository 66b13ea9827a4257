"""URL canonicalization + dedup (operators/urlnorm.py): the 6-step chain
pinned case by case, group semantics, and DuckDB parity of the gate."""

from __future__ import annotations

import duckdb
import pytest

from language_identification_spark.operators.urlnorm import url_dedup
from language_identification_spark.queries import SQL_URL_DEDUP, q_url_dedup

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM/Path", "http://example.com/Path"),  # case: prefix only
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80", "http://example.com"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # non-default kept
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/a#frag?fake=1", "http://example.com/a"),
    # tracking params: leading, middle, trailing, debris collapse
    ("http://e.com/a?utm_source=x", "http://e.com/a"),
    ("http://e.com/a?utm_source=x&id=2", "http://e.com/a?id=2"),
    ("http://e.com/a?id=2&fbclid=y", "http://e.com/a?id=2"),
    ("http://e.com/a?utm_a=1&utm_b=2&id=3", "http://e.com/a?id=3"),
    ("http://e.com/a?gclid=1&utm_x=2", "http://e.com/a"),
    # query/path case preserved; only the prefix is lowered
    ("HTTPS://Host.COM/QueryCase?Q=Mixed", "https://host.com/QueryCase?Q=Mixed"),
    # www inside the path is untouched
    ("http://e.com/www.other.com", "http://e.com/www.other.com"),
]


def test_canonicalization_cases(spark):
    rows = [(i, raw) for i, (raw, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r.doc_id: r.canon_url for r in url_dedup(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_dedup_groups(spark):
    rows = [
        (10, "http://www.e.com/a?utm_source=x"),
        (7, "HTTP://E.com/a/"),
        (3, "http://e.com/a"),
        (5, "http://other.com/b"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = {r.doc_id: r for r in url_dedup(df).collect()}
    assert set(out) == {10, 7, 3, 5}  # null url excluded
    # 10, 7, 3 all canonicalize to http://e.com/a; winner = min doc_id = 3
    assert all(out[i].canon_url == "http://e.com/a" for i in (10, 7, 3))
    assert [out[i].is_canonical for i in (3, 7, 10)] == [True, False, False]
    assert all(out[i].n_copies == 3 for i in (10, 7, 3))
    assert out[5].is_canonical is True and out[5].n_copies == 1


def test_gate_parity(spark):
    import os
    import tempfile

    # the gate synthesizes urls from doc_id alone; replay both engines on a
    # doc_id range crossing the mod-300 collision boundary
    ids = list(range(0, 350)) + [600, 601, 900]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, "t") for i in ids]
    )
    odf = (
        con.execute(SQL_URL_DEDUP)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, "t") for i in ids], "doc_id bigint, text string"
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        sdf = (
            q_url_dedup(spark, d)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert len(sdf) == len(odf) == len(ids)
    for i in range(len(sdf)):
        s, o = sdf.iloc[i], odf.iloc[i]
        assert int(s.doc_id) == int(o.doc_id)
        assert s.url == o.url and s.canon_url == o.canon_url, s.doc_id
        assert bool(s.is_canonical) == bool(o.is_canonical), s.doc_id
        assert int(s.n_copies) == int(o.n_copies), s.doc_id
    # collision design holds: 0 and 300, 1 and 301 share a canonical url
    by_id = {int(r.doc_id): r for _, r in sdf.iterrows()}
    assert by_id[0].canon_url == by_id[300].canon_url
    assert bool(by_id[0].is_canonical) and not bool(by_id[300].is_canonical)
    assert by_id[600].canon_url == by_id[0].canon_url
    assert by_id[299].canon_url != by_id[0].canon_url


def test_domain_blocked_suffix_rule(spark):
    """Dot-suffix semantics: entry and subdomains block; lookalike
    ('notbad.example.com') and unrelated hosts do not."""
    from pyspark.sql import functions as F

    from language_identification_spark.operators.urlnorm import (
        domain_blocked,
    )

    cases = [
        ("bad.example.com", True),
        ("ads.bad.example.com", True),
        ("deep.ads.bad.example.com", True),
        ("notbad.example.com", False),
        ("bad.example.com.evil.net", False),
        ("good.example.net", False),
        ("x.example.org", True),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r.host: r.b
        for r in df.select(
            "host",
            domain_blocked(
                F.col("host"), ["bad.example.com", "example.org"]
            ).alias("b"),
        ).collect()
    }
    for host, want in cases:
        assert got[host] == want, host


def test_domain_blocked_is_zero_shuffle(spark):
    from pyspark.sql import functions as F

    from language_identification_spark.operators.urlnorm import (
        domain_blocked,
    )

    df = spark.createDataFrame([("a.example.org",)], "host string")
    plan = (
        df.select(domain_blocked(F.col("host"), ["example.org"]).alias("b"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_url_word_score_semantics(spark):
    from pyspark.sql import functions as F

    from language_identification_spark.operators.urlnorm import (
        url_word_score,
    )

    cases = [
        # (url, strict_hit, score, blocked)
        ("http://x.com/phishing/login", True, 0, True),     # strict blocks
        ("http://casino.x.com/pills", False, 5, True),      # 3+2 >= 4
        ("http://x.com/free-deal", False, 2, False),        # 1+1 < 4
        ("http://FREE.x.com/Free/fReE/free", False, 4, True),  # repeats + case
        ("http://clean.example.com/news/1", False, 0, False),
        ("http://x.com/freestyle", False, 0, False),        # token, not substring
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    s = url_word_score(
        F.col("url"),
        ["blockme", "phishing"],
        {"casino": 3, "pills": 2, "deal": 1, "free": 1},
        4,
    )
    got = {
        r.url: (r.s.strict_hit, r.s.score, r.s.blocked)
        for r in df.select("url", s.alias("s")).collect()
    }
    for u, hit, score, blocked in cases:
        assert got[u] == (hit, score, blocked), u


def test_url_word_score_is_zero_shuffle(spark):
    from pyspark.sql import functions as F

    from language_identification_spark.operators.urlnorm import (
        url_word_score,
    )

    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        df.select(url_word_score(F.col("url"), ["a"], {"b": 1}, 2).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
