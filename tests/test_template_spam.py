"""Cross-language template spam via punctuation skeletons
(operators/templates.py: text_skeleton / template_spam_groups): same
scaffold + translated fill = one group across languages; plain prose
(no structure) is excluded rather than fused into a mega-group; words
of ANY script vanish from the skeleton."""

from __future__ import annotations

from pyspark.sql import functions as F

from language_identification_spark.operators.templates import (
    template_spam_groups,
    text_skeleton,
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_translated_fill_shares_skeleton_across_scripts(spark):
    df = _rows(
        spark,
        [
            (1, "en", "[3] special offer today (c) 2024, id=21; call now !"),
            (2, "zh", "[3] 今日特别优惠 (c) 2024, id=21; 立即致电 !"),
            (3, "ar", "[3] عرض خاص اليوم (c) 2024, id=21; اتصل الآن !"),
            # different template -> different group
            (4, "en", "[9] other scaffold (c) 2024, id=63; ok !"),
            (5, "de", "[9] anderes geruest (c) 2024, id=63; gut !"),
        ],
    )
    out = {r["langs"]: r.asDict() for r in template_spam_groups(df).collect()}
    assert set(out) == {"ar,en,zh", "de,en"}
    g = out["ar,en,zh"]
    assert (g["n_docs"], g["n_langs"], g["cross_lang"], g["keep_doc_id"]) == (
        3, 3, True, 1,
    )


def test_plain_prose_is_excluded_not_fused(spark):
    # prose with no structure all collapses to the same tiny skeleton;
    # min_skeleton_len must drop it instead of emitting one mega-group
    df = _rows(
        spark,
        [(i, "en", f"just some words number {'x' * i} here.") for i in range(1, 6)],
    )
    assert template_spam_groups(df).count() == 0


def test_monolingual_template_is_not_cross_lang(spark):
    df = _rows(
        spark,
        [
            (1, "en", "[1] aaa (c) 2024, id=7; bbb !"),
            (2, "en", "[1] ccc (c) 2024, id=7; ddd !"),
        ],
    )
    rows = template_spam_groups(df).collect()
    assert len(rows) == 1 and rows[0]["cross_lang"] is False


def test_skeleton_is_script_independent(spark):
    df = spark.createDataFrame(
        [("ab [1] cd; ef!",), ("漢字 [1] ひらがな; καλημέρα!",)], "text string"
    )
    skels = {r["s"] for r in df.select(text_skeleton(F.col("text")).alias("s")).collect()}
    assert skels == {"[1] ; !"}
