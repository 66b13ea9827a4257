"""Bilingual dictionary ingestion + lookup (J5/J6) vs the row-wise oracle.

CSV fixtures replicate the reference's exact file shape
(dictionary_langid/'[ind] english-indonesian.csv': header English,Other;
filename '[lang] X-Y.csv')."""

import pytest

from language_identification_spark.operators.dictionary import (
    DictionaryOracle,
    lookup_terms,
    read_bilingual_dictionaries,
    read_bilingual_dictionary,
)

IND_ROWS = [
    ("good morning", "selamat pagi"),
    ("good night", "selamat malam"),
    ("The morning sun", "matahari pagi"),
    ("water", "air"),
    ("The Water buffalo", "kerbau"),
    # punctuation/apostrophe shapes: the reference tokenizer emits each
    # punctuation char as its own indexed token and does NOT merge
    # apostrophes ("don't" -> don / ' / t) — verified against the reference
    ("don't worry", "jangan risau"),
    ("self-taught person", "orang belajar sendiri"),
]

MSA_ROWS = [
    ("good evening", "selamat petang"),
    ("thank you", "terima kasih"),
    ("morning dew", "embun pagi"),
]


@pytest.fixture(scope="module")
def dict_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("dicts")
    for name, rows in [
        ("[ind] english-indonesian.csv", IND_ROWS),
        ("[msa] english-malaysian.csv", MSA_ROWS),
    ]:
        with open(d / name, "w", encoding="utf-8") as f:
            f.write("English,Other\n")
            for term, definition in rows:
                f.write(f"{term},{definition}\n")
    return [str(d / "[ind] english-indonesian.csv"), str(d / "[msa] english-malaysian.csv")]


def test_reader_shape(spark, dict_files):
    df = read_bilingual_dictionary(spark, dict_files[0])
    rows = {r["entry_id"]: r for r in df.collect()}
    assert len(rows) == len(IND_ROWS)
    assert rows[0]["term"] == "good morning"
    assert rows[0]["term_lang"] == "english"
    assert rows[0]["def_lang"] == "indonesian"
    assert rows[0]["dict_id"] == "[ind] english-indonesian.csv"
    with pytest.raises(ValueError):
        read_bilingual_dictionary(spark, "not-a-dictionary.csv")


def test_lookup_matches_rowwise_oracle(spark, dict_files):
    """Spark join-based lookup == reference Counter semantics, including the
    case-variant multiplicity quirk ('The'/'the' both counted) and the
    repeated-query-token multiplicity ('morning morning' scores double)."""
    entries = read_bilingual_dictionaries(spark, dict_files)
    queries = [
        (0, "good morning, how are you"),
        (1, "the water in the morning"),
        (2, "morning morning"),
        (3, "thank you for the evening dew"),
        (4, "zzz nothing matches"),
        (5, "don't"),  # matches via don, ', t
        (6, "a - b"),  # the '-' token alone reaches 'self-taught'
    ]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = sorted(
        tuple(r)
        for r in lookup_terms(entries, qdf, k=5).collect()
    )

    oracle = DictionaryOracle()
    for e in entries.collect():
        oracle.add(e["dict_id"], e["entry_id"], e["term"], e["definition"])
    expected = sorted(
        t for qid, text in queries for t in oracle.lookup(qid, text, k=5)
    )
    assert got == expected
    # routing: query 3's terms live in the msa dictionary ('thank you',
    # 'good evening', 'morning dew' all share words with it)
    msa_hits = [t for t in got if t[0] == 3]
    assert msa_hits and any(t[1].startswith("[msa]") for t in msa_hits)
    # nothing matches -> no rows at all (the join prunes, like the
    # reference's casefold routing index)
    assert not [t for t in got if t[0] == 4]
    # the 'The Water buffalo' entry must be reachable via lowercase query
    water_hits = [t for t in got if t[0] == 1]
    assert any("Water" in t[3] for t in water_hits)
