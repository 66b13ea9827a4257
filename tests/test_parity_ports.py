"""Round-2 parity ports pinned against reference-observed behavior:

- truncate_text exact contract (utils.py:91-132): char-length bisection,
  whitespace backoff limited to the LAST 1% of the window, final strip —
  expectations below were captured by running the reference function.
- detwingle (utils.py:26-27 / the public bs4 UnicodeDammit.detwingle
  algorithm): mixed utf-8 + cp1252 smart-quote bytes repair.
- get_comments (remove_html_tags.py:167-168): greedy, newline-blind —
  reference-exact including the one-comment-spans-two quirk.
- check_languages (preprocessing.py:30-46).
"""

import pytest

from language_identification_spark.oracle.extract import (
    check_languages,
    decode_html,
    detwingle,
    get_comments,
    truncate_text,
)


# (text, limit, expected) — expected captured from the reference function
TRUNC_CASES = [
    # window 10 < 100: backoff range is empty -> hard cut + strip
    ("hello world again", 10, "hello worl"),
    ("hello world again", 5, "hello"),
    ("ab cd ef gh", 7, "ab cd e"),
    # short input within limit: returned stripped, never cut
    ("  padded  ", 100, "padded"),
    ("", 10, ""),
]


@pytest.mark.parametrize("text,limit,expected", TRUNC_CASES)
def test_truncate_reference_contract(text, limit, expected):
    assert truncate_text(text, limit) == expected


def test_truncate_last_one_percent_window():
    """Backoff only scans the last window//100 chars: a space 99 chars back
    is NOT found (hard cut), a space inside the window is."""
    t = "a" * 99 + " " + "b" * 200
    out = truncate_text(t, 150)
    assert out == t[:150]  # space at index 99 is outside the 1% window
    # window of 333//100 = 3 chars misses the space 4 back -> hard cut 'wor'
    t2 = "word " * 100
    out2 = truncate_text(t2, 333)
    assert out2.endswith("wor") and len(out2) == 333
    # a space INSIDE the window is found: limit 504 -> window 5; text[504]
    # is the space right after the cut, so the cut lands on a word boundary
    t3 = "word " * 101
    out3 = truncate_text(t3, 504)
    assert out3.endswith("word") and len(out3) == 504


def test_truncate_multibyte_boundary():
    """UTF-8 boundary never splits a char; result is within the byte budget."""
    t = "日本語のテキストです " * 30
    out = truncate_text(t, 200)
    assert len(out.encode("utf-8")) <= 200
    out.encode("utf-8")  # must be valid text (would raise on a split char)
    t2 = "ß" * 300
    assert len(truncate_text(t2, 250).encode()) <= 250


def test_detwingle_mixed_utf8_cp1252():
    """The reference's every-bytes-input detwingle step: cp1252 smart quotes
    (0x93/0x94/0x92) embedded in valid UTF-8 text decode to their intended
    characters instead of failing the whole page over to cp1252."""
    mixed = "日本".encode() + b"\x93quoted\x94 it\x92s" + " näive".encode()
    out = decode_html(mixed)
    assert out == "日本“quoted” it’s näive"
    # pure utf-8 passes through untouched
    pure = "héllo 世界".encode()
    assert detwingle(pure) == pure
    # undefined cp1252 bytes are copied raw (and the cascade still decodes)
    assert decode_html(b"ok\x81ok") is not None


def test_fix_mojibake_double_encoded():
    """The ftfy.fix_text step of ensure_unicode (utils.py:33), minimal port:
    utf8-bytes-read-as-cp1252 mojibake is unwound, including doubly-encoded
    text; legitimate accented text is never touched (the conservative
    whole-string-decode acceptance bar)."""
    from language_identification_spark.oracle.extract import fix_mojibake

    assert fix_mojibake("cafÃ©") == "café"
    # curly-quote class ('â€™'): utf-8 of U+2019 read as cp1252
    assert fix_mojibake("it" + "’".encode("utf-8").decode("cp1252")) == "it’"
    # doubly-encoded
    twice = "é".encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
    assert fix_mojibake(twice) == "é"
    # legitimate Latin-1-range text passes through untouched
    for clean in ("café", "À demain", "naïve straße", "plain ascii"):
        assert fix_mojibake(clean) == clean
    # non-Latin text untouched
    assert fix_mojibake("日本語") == "日本語"
    # end-to-end through decode_html: double-encoded page bytes repair
    raw = "<p>café</p>".encode("utf-8").decode("cp1252").encode("utf-8")
    assert decode_html(raw) == "<p>café</p>"


def test_fix_mojibake_utf8_as_latin1_class():
    """Round-4 widening: UTF-8 bytes mis-decoded as latin-1 (C1 gap
    codepoints instead of cp1252 punctuation) repair through the same
    sloppy inverse — including chars whose UTF-8 bytes land in 0x80-0x9F
    ('€' = E2 82 AC) and doubly-encoded variants."""
    from language_identification_spark.oracle.extract import fix_mojibake

    euro = "€".encode("utf-8").decode("latin-1")  # 'â\x82¬'
    assert fix_mojibake(euro) == "€"
    mixed = "héllo wörld €5".encode("utf-8").decode("latin-1")
    assert fix_mojibake(mixed) == "héllo wörld €5"
    twice = mixed.encode("utf-8").decode("latin-1")
    assert fix_mojibake(twice) == "héllo wörld €5"
    # latin1-read and cp1252-read of the same text both repair ('”' has a
    # cp1252-undefined byte 0x9D, so only latin-1 can mis-decode it at all)
    assert fix_mojibake("“quoted”".encode("utf-8").decode("latin-1")) == "“quoted”"
    assert fix_mojibake("“open".encode("utf-8").decode("cp1252")) == "“open"


def test_fix_mojibake_utf8_as_cp1251_class():
    """Round-4 widening #2: UTF-8 bytes mis-decoded as windows-1251 — the
    dominant Cyrillic-web mojibake class (ftfy sloppy-windows-1251) — is
    unwound under the same whole-string strict-UTF-8 accept bar; clean
    Cyrillic text is never touched (real cp1251 word bytes are not valid
    UTF-8 continuation runs)."""
    from language_identification_spark.oracle.extract import fix_mojibake

    def sloppy1251(data: bytes) -> str:
        # how real systems mis-decode: cp1251 with the one undefined byte
        # (0x98) passed through raw — ftfy's sloppy-windows-1251
        return "".join(
            "\x98" if b == 0x98 else bytes([b]).decode("cp1251") for b in data
        )

    moji = sloppy1251("привет мир".encode("utf-8"))  # 'РїСЂРёРІРµС‚ ...'
    assert fix_mojibake(moji) == "привет мир"
    # doubly-encoded (second mis-decode hits the 0x98 gap -> sloppy)
    twice = sloppy1251(moji.encode("utf-8"))
    assert fix_mojibake(twice) == "привет мир"
    # sentence-shaped, with ASCII interleaved
    s = "Это test страница 2024".encode("utf-8").decode("cp1251")
    assert fix_mojibake(s) == "Это test страница 2024"
    # clean Cyrillic passes through untouched (incl. short words and the
    # chars whose cp1251 bytes sit in the UTF-8 continuation range)
    for clean in ("привет мир", "Вы", "Ђђ", "москва", "ASCII only"):
        assert fix_mojibake(clean) == clean
    # cp1252 class still takes precedence and repairs as before
    assert fix_mojibake("cafÃ©") == "café"


def test_fix_mojibake_utf8_as_koi8r_class():
    """Round-4 widening #3: UTF-8 bytes mis-decoded as koi8-r — the older
    Unix-Cyrillic mojibake class (box-drawing chars interleaved with
    lowercase Cyrillic are its signature) — repairs under the same
    whole-string strict-UTF-8 accept bar."""
    from language_identification_spark.oracle.extract import fix_mojibake

    moji = "привет".encode("utf-8").decode("koi8_r")  # 'п©я─п╦п╡п╣я┌'
    assert fix_mojibake(moji) == "привет"
    assert (
        fix_mojibake("Москва 2024".encode("utf-8").decode("koi8_r"))
        == "Москва 2024"
    )
    # clean Cyrillic still passes through; the cp1251 class still wins its
    # own inputs (preference order is documented and load-bearing)
    assert fix_mojibake("привет мир") == "привет мир"
    assert (
        fix_mojibake("привет".encode("utf-8").decode("cp1251")) == "привет"
    )


def test_fix_mojibake_utf8_as_macroman_class():
    """Round-4 widening #4: UTF-8 bytes mis-decoded as MacRoman — the
    classic Mac-origin class ('√©' for 'é', '‚Äú' for '“') — repairs
    under the same accept bar; the cp1252 inverse must keep winning
    cp1252-shaped inputs (its macroman re-encode is also valid UTF-8 but
    a WRONG repair)."""
    from language_identification_spark.oracle.extract import fix_mojibake

    assert fix_mojibake("caf√©") == "café"
    moji = "“quoted” – dash".encode("utf-8").decode("mac_roman")
    assert fix_mojibake(moji) == "“quoted” – dash"
    # doubly-encoded macroman unwinds too
    twice = moji.encode("utf-8").decode("mac_roman")
    assert fix_mojibake(twice) == "“quoted” – dash"
    # preference pin: cp1252 mojibake repairs via cp1252, not macroman
    assert fix_mojibake("cafÃ©") == "café"
    # clean text with macroman-encodable accents is untouched
    for clean in ("café à demain", "schön größer", "√2 = 1.41"):
        assert fix_mojibake(clean) == clean


def test_fix_mojibake_double_entity_class():
    """Round-4 widening: stray/double HTML entities unescape per pass
    (ftfy fix_entities='auto'), but NEVER inside text that looks like real
    markup — decode_html must not pre-unescape pages before strip_html."""
    from language_identification_spark.oracle.extract import (
        decode_html,
        fix_mojibake,
        strip_html,
    )

    assert fix_mojibake("caf&eacute;") == "café"
    assert fix_mojibake("&amp;eacute;") == "é"  # double-escaped
    assert fix_mojibake("A &amp;amp; B") == "A & B"
    # entities that decode INTO mojibake then repair in the same loop
    assert fix_mojibake("caf&Atilde;&copy;") == "café"
    # markup guard: real HTML passes through decode_html untouched so
    # strip_html's single unescape produces the literal text the page meant
    page = b"<p>5 &lt; 6 &amp;amp; x</p>"
    decoded = decode_html(page)
    assert decoded == "<p>5 &lt; 6 &amp;amp; x</p>"
    assert strip_html(decoded).strip() == "5 < 6 &amp; x"
    # plain ampersand text untouched
    assert fix_mojibake("AT&T and R&D") == "AT&T and R&D"


def test_fix_mojibake_curly_quote_mangled_class():
    """Round-5 widening (VERDICT r4 missing #2): utf8-as-cp1252 mojibake
    that subsequently passed through Windows smart-quote autocorrect.
    Straight quotes in mojibake are always original text (ASCII bytes
    never occur inside UTF-8 multibyte sequences), so a curled quote
    re-encodes to 0x91-0x94 instead of 0x27/0x22 and blocks the
    whole-string repair — un-curl and retry, accepted only when the
    repair changes something beyond the un-curling."""
    from language_identification_spark.oracle.extract import fix_mojibake

    # apostrophe curled inside mojibake: repaired AND un-curled
    assert fix_mojibake("it’s cafÃ©") == "it's café"
    # double quotes curled around a mojibake span
    assert fix_mojibake("“cafÃ© au lait”") == '"café au lait"'
    # both quote kinds + multiple mojibake spans: mis-decode REAL utf-8
    # as cp1252, then smart-quote the straight quotes the original had
    raw = 'sie sagte "schön" und \'größer\''.encode("utf-8").decode("cp1252")
    moji = (
        raw.replace('"', "“", 1).replace('"', "”", 1)
        .replace("'", "‘", 1).replace("'", "’", 1)
    )
    assert fix_mojibake(moji) == 'sie sagte "schön" und \'größer\''
    # clean curly-quote text is NEVER straightened (the accept bar
    # requires a repair beyond the un-curling)
    for clean in ("“hello”", "it’s normal", "‘single’ and “double”"):
        assert fix_mojibake(clean) == clean
    # plain cp1252 class still wins when no quote blocks it
    assert fix_mojibake("cafÃ©") == "café"
    # curly quotes NOT adjacent to mojibake in an otherwise-clean string
    # with other non-ASCII stay curly (whole-string bar still fails)
    assert fix_mojibake("“hello” café") == "“hello” café"


def test_get_comments_reference_quirks():
    """Greedy + newline-blind, exactly like RE_COMMENT
    (remove_html_tags.py:155)."""
    assert get_comments("a<!--x-->b") == ["x"]
    # greedy: two comments on one line merge into one capture
    assert get_comments("a<!--x-->b<!--y-->c") == ["x-->b<!--y"]
    # newline-blind: multi-line comments are not matched
    assert get_comments("<!-- multi\nline -->") == []
    assert get_comments("no comments") == []
    assert get_comments(None) == []


def test_check_languages_port():
    sup = ["en", "zh", "ar"]
    assert check_languages(None, sup) == ["ar", "en", "zh"]
    assert check_languages([], sup) == ["ar", "en", "zh"]
    assert check_languages(["en", "xx"], sup) == {"en"}
    assert check_languages(["xx"], sup) == set()
    with pytest.raises(TypeError):
        check_languages([42], sup)


def test_split_filename_f9():
    """F9 (utils.py:50-88): suffix keeping, long-ext foldback, htm/jpeg
    normalization — expectations captured from the reference function."""
    from language_identification_spark.oracle.extract import split_filename

    assert split_filename("a.txt") == ("a", ".txt")
    assert split_filename("dir/b.TAR.GZ") == ("b", ".tar.gz")
    assert split_filename("photo.JPEG") == ("photo", ".jpg")
    assert split_filename("page.htm") == ("page", ".html")
    assert split_filename("data.tar.001") == ("data", ".tar.001")
    # bare numbered part with no inner dot nearby keeps the suffix as ext
    assert split_filename("archive.001") == ("archive", ".001")
    # extension longer than 6 chars folds back into the stem
    assert split_filename("weird.verylongext") == ("weird.verylongext", "")
    assert split_filename(" spaced .txt") == ("spaced", ".txt")


def test_norvig_spell_f13(spark):
    """F13: the reference's 9 inline assert cases (pdfs/spellcheck/
    spell.py:67-93) over a corpus containing the target words; the
    Spark-trained model must equal the text-trained one."""
    from language_identification_spark.oracle.spell import (
        SpellModel,
        train_spell_spark,
    )

    corpus_text = (
        "spelling is hard but spelling can be arranged "
        "the poetry of the bicycle is quintessential word use "
        "corrected and inconvenient words are corrected poetry "
        "naïve readers read naïve words"
    )
    m = SpellModel.train_text(corpus_text)
    assert m.correction("word") == "word"  # known
    assert m.correction("quintessential") == "quintessential"
    assert m.correction("speling") == "spelling"  # insert
    assert m.correction("inconvient") == "inconvenient"  # insert 2
    assert m.correction("bycycle") == "bicycle"  # replace
    assert m.correction("korrectud") == "corrected"  # replace 2
    assert m.correction("arrainged") == "arranged"  # delete
    assert m.correction("peotry") == "poetry"  # transpose
    assert m.correction("peotryy") == "poetry"  # transpose + delete
    assert m.correction("zzzzzz") == "zzzzzz"  # unknown stays

    df = spark.createDataFrame([(corpus_text,)], "text string")
    ms = train_spell_spark(df)
    # unicode \w parity: Java (?U)\w+ must keep 'naïve' whole like Python re
    assert ms.counts == m.counts
    assert ms.correction("speling") == "spelling"


def test_spell_tie_break_word_asc():
    """Probability ties break by word ASC (the documented total order)."""
    from collections import Counter

    from language_identification_spark.oracle.spell import SpellModel

    m = SpellModel(Counter({"aa": 1, "ab": 1}))
    assert m.correction("az") == "aa"
