"""Deterministic synthetic ``pages`` fixture — the north-rule input table.

Schema per BASELINE.json input_hint:
    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Content per FIXTURES.md: ~60% clean documents across the reference's
11-language set (language_identification_test.py:7-19: ar en hi id ms my tl ta
th vi zh), ~40% adversarial rows (empty, digits-only — clean_text fails at
preprocessing.py:24-25; repeated chars per README.md:149-153; boilerplate;
symbol soup; duplicate lines; encoding edge cases). HTML wrappers include
comments, <script> blocks and entities to exercise the extraction chain
(remove_html_tags.py:155-164, utils.py:15-37).

Everything is seeded — same (n, seed) always yields byte-identical rows — so
tests, the DuckDB oracle, and the scaling benchmark all see the same data with
no external downloads. URL hosts are deliberately skewed (one hot host gets
~40% of pages) so partition/salting behavior is exercised, mirroring real
Common-Crawl host skew (SURVEY.md §4.2).
"""

from __future__ import annotations

import datetime as dt
import random

# Per-language word banks. Everyday vocabulary; Latin-script languages get
# mostly-disjoint banks (with realistic id/ms overlap) so the n-gram model has
# signal, same role as the golden strings at scripts_langid.py:87-108.
WORD_BANKS: dict[str, list[str]] = {
    "en": "the quick brown fox jumps over lazy dog and with that have from this house day water good morning people time year work life world school be to of".split(),
    "id": "dan yang untuk dengan tidak ini itu dari saya mereka bisa akan sudah makan minum rumah jalan hari baik besar kecil sekarang juga sangat orang air tahun kerja hidup dunia sekolah".split(),
    "ms": "dan yang untuk dengan tidak ini itu dari saya mereka boleh akan sudah makan minum rumah jalan hari baik besar kecil awak sahaja amat orang air tahun kerja hidup dunia sekolah pula".split(),
    "tl": "ang ng mga ako ikaw siya kami tayo hindi salamat kumain bahay araw maganda malaki maliit tubig taon trabaho buhay mundo paaralan umaga tao oras".split(),
    "vi": "tôi bạn của và không có là người ngày đẹp lớn nhỏ ăn uống nhà đường nước năm việc đời sống thế giới trường học buổi sáng thời gian".split(),
    "ar": "في من على هذا الذي كان يكون البيت اليوم كبير صغير جميل ماء سنة عمل حياة عالم مدرسة صباح ناس وقت طعام شمس قمر".split(),
    "hi": "और है के में यह वह घर दिन बड़ा छोटा सुंदर खाना पानी साल काम जीवन दुनिया पाठशाला सुबह लोग समय सूरज चाँद अच्छा".split(),
    "ta": "மற்றும் இது அது வீடு நாள் பெரிய சிறிய அழகான உணவு தண்ணீர் ஆண்டு வேலை வாழ்க்கை உலகம் பள்ளி காலை மக்கள் நேரம் நல்ல".split(),
    "th": "และ ใน ของ บ้าน วัน ใหญ่ เล็ก สวย กิน น้ำ ปี งาน ชีวิต โลก โรงเรียน เช้า คน เวลา ดี อาหาร".split(),
    "my": "နှင့် တွင် အိမ် နေ့ ကြီး သေး လှ စား ရေ နှစ် အလုပ် ဘဝ ကမ္ဘာ ကျောင်း မနက် လူ အချိန် ကောင်း".split(),
    "zh": "的 是 在 了 有 我 他 这 那 家 天 大 小 美 吃 水 年 工作 生活 世界 学校 早上 人 时间 好".split(),
}

LANGS = sorted(WORD_BANKS)

_HTML_TEMPLATES = [
    "<html><head><title>t{i}</title><script>var x = {i};</script>"
    "<!-- comment {i} --></head><body><p>{text}</p></body></html>",
    "<html><!-- <script>hidden()</script> --><body><div class=\"a\">{text}"
    "</div><style>.a {{color: red}}</style></body></html>",
    "<html><body><h1>&amp; header</h1><p>{text}&nbsp;&copy;</p></body></html>",
    "<html><body>{text}</body></html>",
]

_BOILERPLATE = (
    "click here copyright page link subscribe cookie privacy policy terms "
    "conditions login signup menu navigation footer sitemap rss feed"
)
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    bank = WORD_BANKS[lang]
    return " ".join(rng.choice(bank) for _ in range(n_words))


def _clean_doc(rng: random.Random, lang: str) -> str:
    n_sent = rng.randint(2, 6)
    sep = "。" if lang == "zh" else ". "
    return sep.join(
        _sentence(rng, lang, rng.randint(8, 25)) for _ in range(n_sent)
    )


def _adversarial(rng: random.Random, i: int) -> tuple[str, str]:
    """(text, true_lang) for a quality-rule-violating page."""
    kind = i % 6
    if kind == 0:
        return "", "und"  # empty -> empty_text
    if kind == 1:
        return " ".join(str(rng.randint(0, 99999)) for _ in range(30)), "und"
    if kind == 2:  # repeated chars: "hellloooo" clamp case (README.md:149-153)
        base = _sentence(rng, "en", 6)
        return base + " " + "a" * rng.randint(20, 60) + "!!!!!!!!", "en"
    if kind == 3:  # boilerplate, no stopwords
        return _BOILERPLATE, "en"
    if kind == 4:  # symbol soup
        return " ".join("#$%&*@!" for _ in range(rng.randint(10, 30))), "und"
    # duplicate lines
    line = _sentence(rng, "en", 10)
    return "\n".join([line] * rng.randint(5, 10)), "en"


def build_pages(n: int = 200, seed: int = 42) -> list[dict]:
    """Deterministic list of page rows; ~60% clean, ~40% adversarial."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 5 < 3:  # clean
            lang = LANGS[i % len(LANGS)]
            text = _clean_doc(rng, lang)
        else:
            text, lang = _adversarial(rng, i)
        template = _HTML_TEMPLATES[i % len(_HTML_TEMPLATES)]
        html_str = template.format(i=i, text=text)
        # encoding edge case: every 17th page is cp1252-encoded (exercises the
        # decode fallback of utils.py:15-37)
        if i % 17 == 3 and html_str.isascii():
            html_bytes = (html_str + " café").encode("cp1252")
        else:
            html_bytes = html_str.encode("utf-8")
        # robustness case: every 23rd page has NULL html (fetch failure) —
        # must flow through extraction as null -> empty_text, never crash
        if i % 23 == 7:
            html_bytes = None
            text, lang = "", "und"
        # host skew: host-0 is hot (~40% of urls) — salting test bed
        host = "host-0" if i % 5 < 2 else f"host-{1 + i % 7}"
        rows.append(
            {
                "url": f"https://{host}.example/page/{i}",
                "warc_ts": EPOCH + dt.timedelta(seconds=i),
                "html": html_bytes,
                "text": text,
                "lang": lang,
            }
        )
    return rows


def training_corpus(
    docs_per_lang: int = 30, seed: int = 7
) -> list[tuple[str, str]]:
    """Labeled clean corpus for n-gram model training (disjoint seed from
    build_pages so train/test never share sentences)."""
    rng = random.Random(seed)
    return [
        (lang, _clean_doc(rng, lang))
        for lang in LANGS
        for _ in range(docs_per_lang)
    ]


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n: int = 200, seed: int = 42):
    """The pages fixture as a Spark DataFrame with the input_hint schema."""
    return spark.createDataFrame(build_pages(n, seed), schema=PAGES_SCHEMA)
