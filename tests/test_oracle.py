"""Unit tests for the pure-Python oracle (reference semantics, SURVEY.md §5)."""

from language_identification_spark.oracle.extract import (
    clean_text,
    decode_html,
    extract_text,
    strip_html,
    truncate_text,
)
from language_identification_spark.oracle.langid import (
    NgramNBModel,
    detect_script,
    script_langid,
)
from language_identification_spark.oracle.quality import (
    QualityConfig,
    apply_rules,
    doc_stats,
)
from language_identification_spark.oracle.scrub import scrub_text
from language_identification_spark.oracle.tokenize import (
    char_ngrams,
    sentence_split,
    unicode_tokenize,
    word_ngrams,
)


class TestExtract:
    def test_decode_utf8(self):
        assert decode_html("héllo".encode()) == "héllo"

    def test_decode_cp1252_fallback(self):
        assert decode_html("café".encode("cp1252")) == "café"

    def test_decode_str_passthrough(self):
        assert decode_html("x") == "x"

    def test_strip_comment_containing_script(self):
        # ordering contract: comments removed before script blocks
        # (remove_html_tags.py:160-164)
        s = "<html><!-- <script>a</script> --><p>keep</p></html>"
        assert strip_html(s).split() == ["keep"]

    def test_strip_script_block(self):
        s = "<body><script>var x = '<p>no</p>';</script>yes</body>"
        assert strip_html(s).split() == ["yes"]

    def test_entities(self):
        assert strip_html("<p>&amp;&nbsp;x</p>").strip() == "&\xa0x"

    def test_clean_text_digits(self):
        # standalone digits stripped, embedded digits kept
        # (preprocessing.py:16-27)
        assert clean_text("a 123 b4c 5") == "a b4c"

    def test_clean_text_digit_adjacent_punct(self):
        # reference re.sub(r'\b\d+\b', '', ...) replaces with EMPTY, so no
        # space appears between the exposed brackets (found in review)
        assert clean_text("a(1)b") == "a()b"
        # '.' is a \b boundary: the standalone 2 and 3 go, 1 stays (b4c-style
        # digits inside a word have no boundary around them)
        assert clean_text("v1.2.3") == "v1.."
        assert clean_text("price: 42, ok") == "price: , ok"

    def test_clean_text_empty_none(self):
        assert clean_text("  42  ") is None
        assert clean_text("") is None

    def test_truncate_byte_limit(self):
        text = "aaaa bbbb " * 10
        out = truncate_text(text, limit=25)
        assert len(out.encode()) <= 25
        assert not out.endswith("bb")  # backed off to whitespace

    def test_truncate_multibyte_safe(self):
        out = truncate_text("日本語テキスト" * 100, limit=50)
        assert len(out.encode("utf-8")) <= 50
        out.encode("utf-8")  # must be valid unicode

    def test_extract_end_to_end(self):
        html = "<html><script>x=1</script><p>hello &amp; world 99</p></html>".encode()
        assert extract_text(html) == "hello & world"


class TestTokenize:
    def test_basic(self):
        assert unicode_tokenize("hello, world!") == ["hello", "world"]

    def test_apostrophe_merge(self):
        # tokenizer.py:181-251 docstring cases
        assert unicode_tokenize("don't stop") == ["don't", "stop"]
        assert unicode_tokenize("'quoted'") == ["quoted"]

    def test_marks_kept(self):
        assert unicode_tokenize("việt nam") == ["việt", "nam"]

    def test_digits_are_word_chars(self):
        assert unicode_tokenize("v2 engine") == ["v2", "engine"]

    def test_sentence_split(self):
        # full port: punctuation retained, boundary = closing punct followed
        # by whitespace (tokenizer.py:398-466)
        assert sentence_split("One. Two!\nThree") == ["One.", "Two!", "Three"]

    def test_sentence_split_unclosed(self):
        # word chars un-close: dotted quads never split (the reference
        # docstring's 192.168.1.1 case)
        assert sentence_split("ip 192.168.1.1 ok. done") == [
            "ip 192.168.1.1 ok.",
            "done",
        ]

    def test_sentence_split_bracket_passthrough(self):
        # closing quotes/brackets keep the sentence closed
        assert sentence_split('He left. "Bye." Next') == [
            "He left.",
            '"Bye."',
            "Next",
        ]

    def test_char_ngrams(self):
        assert char_ngrams("abcd", 2) == ["ab", "bc", "cd"]
        assert char_ngrams("ab", 3) == []

    def test_word_ngrams(self):
        assert word_ngrams(["a", "b", "c"], 2) == [("a", "b"), ("b", "c")]


class TestQuality:
    def test_empty(self):
        assert apply_rules(doc_stats(""), QualityConfig(), empty=True) == [
            "empty_text"
        ]

    def test_good_doc_keeps(self):
        text = (
            "the quick brown fox jumps over the lazy dog and that is fine. "
            "we have many good words to read with care today."
        )
        assert apply_rules(doc_stats(text), QualityConfig(), lang_conf=0.99, lang="en") == []

    def test_dup_lines_drop(self):
        text = "\n".join(["the same line again and that"] * 10)
        assert "dup_line_frac_high" in apply_rules(
            doc_stats(text), QualityConfig(), lang="en"
        )

    def test_repeated_char_drop(self):
        text = "the word is " + "a" * 50
        assert "repeated_char_high" in apply_rules(
            doc_stats(text), QualityConfig(), lang="en"
        )

    def test_word_len_rules_gated_by_lang(self):
        zh = "的 是 在 了 有 我 的 是 在 了 的 是 在 了 有"
        reasons = apply_rules(doc_stats(zh), QualityConfig(), lang="zh")
        assert "mean_word_len_low" not in reasons

    def test_stats_deterministic(self):
        t = "some text with words. and lines!"
        assert doc_stats(t) == doc_stats(t)


class TestScrub:
    def test_email(self):
        assert scrub_text("mail a.b+c@ex-1.org now") == "mail <EMAIL> now"

    def test_url_before_email(self):
        assert scrub_text("https://u@h.com/p?q=1 end") == "<URL> end"

    def test_ip_phone_handle_hashtag(self):
        assert (
            scrub_text("ip 10.0.0.1 tel +44 20 7946 0958 by @user #tag")
            == "ip <IP> tel <PHONE> by <USER> <HASHTAG>"
        )

    def test_badword(self):
        assert scrub_text("a BadWord b") == "a <BAD> b"

    def test_none(self):
        assert scrub_text(None) is None


class TestLangid:
    def test_script_unique(self):
        assert script_langid("مرحبا بالعالم")[0] == "ar"
        assert script_langid("สวัสดีชาวโลก")[0] == "th"
        assert script_langid("你好世界")[0] == "zh"
        assert script_langid("வணக்கம் உலகம்")[0] == "ta"

    def test_latin_defers(self):
        assert script_langid("hello world")[0] is None

    def test_detect_script_fracs(self):
        fr = detect_script("abc доб")
        assert abs(sum(fr.values()) - 1.0) < 1e-9

    def test_nb_train_detect(self):
        corpus = [("xx", "aaa bbb aab")] * 5 + [("yy", "ccc ddd ccd")] * 5
        m = NgramNBModel.train(corpus)
        assert m.detect("aaa bbb")[0] == "xx"
        assert m.detect("ccc ddd")[0] == "yy"

    def test_nb_table_roundtrip(self):
        corpus = [("xx", "abc abc"), ("yy", "xyz xyz")]
        m = NgramNBModel.train(corpus)
        m2 = NgramNBModel.from_table(m.table(), m.meta())
        assert m.scores("abc xyz") == m2.scores("abc xyz")

    def test_detect_batch_boundary_independence(self):
        """detect_batch must equal per-row detect for EVERY batch composition
        — Spark task retries re-batch rows, so batch-dependent output is
        nondeterminism. Regression: a document with zero in-vocabulary grams
        at the END of a batch corrupted the preceding document's segment sum
        (np.add.reduceat trailing-empty-segment handling)."""
        corpus = [("xx", "aaa bbb aab")] * 5 + [("yy", "ccc ddd ccd")] * 5
        m = NgramNBModel.train(corpus)
        nb_doc = "aaa bbb"         # in-vocabulary
        oov_doc = "#$% *@! #$%"    # zero in-vocabulary grams
        compositions = [
            [nb_doc, oov_doc],            # oov last (the regression)
            [oov_doc, nb_doc],
            [nb_doc, oov_doc, nb_doc],
            [oov_doc, oov_doc],
            [nb_doc],
            ["", nb_doc, None, oov_doc],  # empties/nulls interleaved
        ]
        for batch in compositions:
            assert m.detect_batch(batch) == [m.detect(t) for t in batch], batch

    def test_scores_sorted_desc(self):
        corpus = [("xx", "abc"), ("yy", "xyz")]
        s = NgramNBModel.train(corpus).scores("abc")
        assert s[0][1] >= s[1][1]
        assert abs(sum(p for _, p in s) - 1.0) < 1e-9
