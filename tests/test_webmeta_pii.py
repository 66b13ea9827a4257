"""Unit tests for operators/htmlmeta.py and operators/pii.py — the edge
cases the sf-corpus gates exercise only statistically: nested-substring
pseudonymization, shared-placeholder coreference, ISO 13616 mod-97
arithmetic, all-noindex canonical clusters, absent-tag extraction."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from language_identification_spark.operators.htmlmeta import (
    canonical_dedup,
    extract_html_meta,
)
from language_identification_spark.operators.pii import (
    EMAIL_PATTERN,
    IBAN_DIM,
    PHONE_PATTERN,
    _corrupt,
    iban_valid_expr,
    make_iban,
    pseudonymize_expr,
    scrub_iban_expr,
)


def _pseudo(spark, text, pattern=EMAIL_PATTERN, tag="EMAIL"):
    df = spark.createDataFrame([Row(text=text)])
    out_col, n_col = pseudonymize_expr(F.col("text"), pattern, tag)
    return df.select(out_col.alias("t"), n_col.alias("n")).first()


def test_pseudonymize_repeats_share_placeholder(spark):
    r = _pseudo(spark, "write a@x.com then again a@x.com and b@x.com")
    # sorted distinct: a@x.com -> 0, b@x.com -> 1
    assert r.t == "write <EMAIL_0> then again <EMAIL_0> and <EMAIL_1>"
    assert r.n == 2


def test_pseudonymize_nested_substring_matches(spark):
    # masking a@b.co first would corrupt the later a@b.com under iterated
    # replace; split-and-reassemble must keep both spans exact.
    r = _pseudo(spark, "short a@b.co long a@b.com end")
    assert r.t == "short <EMAIL_0> long <EMAIL_1> end"
    assert r.n == 2


def test_pseudonymize_no_matches_is_identity(spark):
    r = _pseudo(spark, "no addresses here")
    assert r.t == "no addresses here"
    assert r.n == 0


def test_pseudonymize_match_at_both_ends(spark):
    r = _pseudo(spark, "a@x.com middle z@x.com")
    assert r.t == "<EMAIL_0> middle <EMAIL_1>"


def test_pseudonymize_phone(spark):
    r = _pseudo(spark, "call +1-555-1234 or +44-200-79460000 now",
                PHONE_PATTERN, "PHONE")
    assert r.t == "call <PHONE_0> or <PHONE_1> now"
    assert r.n == 2


_REAL_IBANS = [
    "DE89370400440532013000",  # published ISO 13616 example
    "GB29NWBK60161331926819",
    "FR1420041010050500013M02606",
]


def _py_mod97(iban: str) -> bool:
    r = iban[4:] + iban[:4]
    return int("".join(str(int(c, 36)) for c in r)) % 97 == 1


@pytest.mark.parametrize("iban", _REAL_IBANS)
def test_make_iban_reproduces_published_check_digits(iban):
    cc, bban = iban[:2], iban[4:]
    assert make_iban(cc, bban) == iban
    assert _py_mod97(iban)


def test_iban_dim_alternates_valid_invalid():
    assert len(IBAN_DIM) == 16
    for i, s in enumerate(IBAN_DIM):
        assert _py_mod97(s) == (i % 2 == 0)


def test_iban_valid_expr_matches_python_fold(spark):
    rows = [Row(c=s) for s in IBAN_DIM]
    got = (
        spark.createDataFrame(rows)
        .select(iban_valid_expr(F.col("c")).alias("ok"))
        .collect()
    )
    assert [r.ok for r in got] == [_py_mod97(s) for s in IBAN_DIM]


def test_scrub_iban_masks_only_checksum_valid(spark):
    good, bad = IBAN_DIM[0], _corrupt(IBAN_DIM[0])
    df = spark.createDataFrame([Row(text=f"pay {good} not {bad} end")])
    masked, n_cands, n_valid = scrub_iban_expr(F.col("text"))
    r = df.select(masked.alias("t"), n_cands.alias("c"),
                  n_valid.alias("v")).first()
    assert r.t == f"pay <IBAN> not {bad} end"
    assert (r.c, r.v) == (2, 1)


# --- htmlmeta -------------------------------------------------------------


def _meta(spark, rows):
    return extract_html_meta(spark.createDataFrame(rows))


def test_extract_absent_tags_are_empty(spark):
    r = _meta(
        spark,
        [Row(doc_id=1, url="u", html="<html><head></head><body>x</body></html>")],
    ).first()
    assert (r.title, r.robots, r.canonical, r.hreflang) == ("", "", "", "")
    assert r.noindex is False


def test_extract_all_tags(spark):
    html = (
        '<html><head><title>T</title>'
        '<meta name="robots" content="noindex,nofollow">'
        '<link rel="canonical" href="http://h/c">'
        '<link rel="alternate" hreflang="de" href="http://h/p">'
        "</head></html>"
    )
    r = _meta(spark, [Row(doc_id=1, url="http://h/p", html=html)]).first()
    assert r.title == "T"
    assert r.robots == "noindex,nofollow"
    assert r.noindex is True
    assert r.canonical == "http://h/c"
    assert r.hreflang == "de"


def _canon_rows(spark, rows):
    meta = spark.createDataFrame(rows)
    return {r.canon_url: r for r in canonical_dedup(meta).collect()}


def test_canonical_dedup_prefers_self_canonical(spark):
    rows = [
        Row(doc_id=5, url="http://h/c", canonical="", noindex=False),
        Row(doc_id=1, url="http://h/a", canonical="http://h/c", noindex=False),
        Row(doc_id=2, url="http://h/b", canonical="http://h/c", noindex=False),
    ]
    out = _canon_rows(spark, rows)["http://h/c"]
    # min doc_id is 1, but the self-canonical page (5) wins
    assert out.kept_doc_id == 5
    assert (out.n_pages, out.n_noindex) == (3, 0)


def test_canonical_dedup_min_id_when_leader_missing(spark):
    rows = [
        Row(doc_id=9, url="http://h/a", canonical="http://h/gone", noindex=False),
        Row(doc_id=4, url="http://h/b", canonical="http://h/gone", noindex=False),
    ]
    out = _canon_rows(spark, rows)["http://h/gone"]
    assert out.kept_doc_id == 4


def test_canonical_dedup_all_noindex_cluster_drops(spark):
    rows = [
        Row(doc_id=1, url="http://h/a", canonical="http://h/c", noindex=True),
        Row(doc_id=2, url="http://h/c", canonical="", noindex=True),
    ]
    out = _canon_rows(spark, rows)["http://h/c"]
    assert out.kept_doc_id is None
    assert (out.n_pages, out.n_noindex) == (0, 2)


def test_canonical_dedup_noindex_member_never_elected(spark):
    rows = [
        Row(doc_id=1, url="http://h/c", canonical="", noindex=True),
        Row(doc_id=7, url="http://h/a", canonical="http://h/c", noindex=False),
    ]
    out = _canon_rows(spark, rows)["http://h/c"]
    assert out.kept_doc_id == 7
