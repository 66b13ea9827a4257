"""C4/Gopher-style heuristic quality statistics and keep/drop rules.

The reference specifies these rules in prose (README.md:128-153: web-word /
boilerplate removal, repeated-char clamping per arXiv 1608.03030) and realizes
fragments of them in cleanup notebooks; the full rule set here follows the
public C4 (Raffel et al. 2020) and Gopher (Rae et al. 2021) heuristics, which
is what BASELINE.json's north_star names.

``doc_stats`` computes per-document raw statistics (pure function of the text);
``apply_rules`` turns stats into named drop reasons given a ``QualityConfig``.
Keeping stats and thresholds separate lets the Spark pipeline compute stats
once in a pandas UDF and evaluate the (cheap) threshold comparisons as native
JVM column expressions, so re-tuning thresholds never re-runs the UDF stage.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from language_identification_spark.oracle.tokenize import (
    is_punctuation_char,
    sentence_split,
    unicode_tokenize,
)

# Stopword probe sets for the Gopher "contains >= k stopwords" rule. The
# reference ships stopwords-iso.json (dictionaries/stopwords-iso.json, loaded
# at datatypes.py:752-754); we inline the classic Gopher 8-word English probe
# plus small function-word probes for the other supported languages. At
# deployment the full stopwords-iso sets drop in via the same broadcast-set
# mechanism. The probe is the UNION across languages — a document passing in
# any supported language counts, keeping the stat language-independent.
STOPWORDS_BY_LANG: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "be", "to", "of", "and", "that", "have", "with"}),
    "id": frozenset({"dan", "yang", "untuk", "dengan", "tidak", "ini", "itu", "dari"}),
    "ms": frozenset({"dan", "yang", "untuk", "dengan", "tidak", "ini", "itu", "dari"}),
    "tl": frozenset({"ang", "ng", "mga", "ako", "hindi", "siya", "kami", "tayo"}),
    "vi": frozenset({"của", "và", "không", "có", "là", "tôi", "người", "ngày"}),
    "ar": frozenset("في من على هذا الذي كان يكون اليوم".split()),
    "hi": frozenset("और है के में यह वह घर दिन".split()),
    "ta": frozenset("மற்றும் இது அது வீடு நாள்".split()),
    "th": frozenset("และ ใน ของ บ้าน วัน".split()),
    "my": frozenset("နှင့် တွင် အိမ် နေ့".split()),
    "zh": frozenset("的 是 在 了 有 我 他 这 那".split()),
}
GOPHER_STOPWORDS = frozenset().union(*STOPWORDS_BY_LANG.values())

# Languages whose orthography makes word-length statistics meaningful (space-
# delimited alphabetic scripts). Word-length rules are suppressed elsewhere —
# a CJK "word" is 1-2 chars, an agglutinative Tamil word is long; applying
# English thresholds would mass-drop valid text (C4/Gopher are English-only
# filters; this is the standard multilingual adaptation).
WORD_LENGTH_RULE_LANGS = frozenset({"en", "id", "ms", "tl", "vi", "fr", "es", "de"})

_RE_REPEATED_CHAR = re.compile(r"(.)\1{3,}")
_RE_BULLET = re.compile(r"^\s*[-*•●▪]")


@dataclass(frozen=True)
class QualityConfig:
    """Thresholds for the heuristic rules. Defaults are Gopher-flavored but
    scaled down for short fixture documents; production values in comments."""

    min_words: int = 5            # Gopher: 50
    max_words: int = 100_000      # Gopher: 100k
    min_mean_word_len: float = 2.0   # Gopher: 3
    max_mean_word_len: float = 12.0  # Gopher: 10
    max_symbol_word_ratio: float = 0.1
    max_digit_frac: float = 0.3      # fraction of word chars that are digits
    max_dup_line_frac: float = 0.3
    max_repeated_char_frac: float = 0.1
    min_stopwords: int = 1           # Gopher: 2 of the probe list
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_lang_conf: float = 0.5       # fastText-style confidence threshold
    max_ppl: float = 1e9             # LM perplexity gate (off by default)
    stopwords: frozenset[str] = field(default=GOPHER_STOPWORDS)

    def production(self) -> "QualityConfig":
        """Gopher-paper thresholds for real web corpora."""
        return QualityConfig(
            min_words=50,
            min_mean_word_len=3.0,
            max_mean_word_len=10.0,
            min_stopwords=2,
            min_lang_conf=self.min_lang_conf,
            max_ppl=self.max_ppl,
            stopwords=self.stopwords,
        )


STAT_FIELDS = [
    "word_count",
    "mean_word_len",
    "symbol_word_ratio",
    "digit_frac",
    "dup_line_frac",
    "repeated_char_frac",
    "stopword_count",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "line_count",
]


def doc_stats(text: str | None) -> dict[str, float]:
    """Raw quality statistics for one document (pure, deterministic)."""
    if not text:
        return {f: 0.0 for f in STAT_FIELDS}
    words = unicode_tokenize(text)
    wc = len(words)
    total_word_chars = sum(len(w) for w in words)
    mean_wl = (total_word_chars / wc) if wc else 0.0
    # classify DISTINCT chars (C-speed Counter), weight by multiplicity —
    # identical counts to per-char loops, ~10x fewer classifier calls
    char_counts = Counter(text)
    n_symbols = sum(
        n for ch, n in char_counts.items() if is_punctuation_char(ch)
    )
    word_char_counts = Counter("".join(words))
    n_digits = sum(n for ch, n in word_char_counts.items() if ch.isdigit())
    digit_frac = (n_digits / total_word_chars) if total_word_chars else 0.0

    lines = sentence_split(text)
    n_lines = len(lines)
    dup_line_frac = (
        1.0 - len(set(lines)) / n_lines if n_lines else 0.0
    )
    bullet_frac = (
        sum(1 for ln in lines if _RE_BULLET.match(ln)) / n_lines if n_lines else 0.0
    )
    ellipsis_frac = (
        sum(1 for ln in lines if ln.endswith("...") or ln.endswith("…")) / n_lines
        if n_lines
        else 0.0
    )
    repeated = sum(len(m.group(0)) for m in _RE_REPEATED_CHAR.finditer(text))
    repeated_frac = repeated / len(text) if text else 0.0
    stop_count = sum(1 for w in words if w.lower() in GOPHER_STOPWORDS)

    return {
        "word_count": float(wc),
        "mean_word_len": mean_wl,
        "symbol_word_ratio": (n_symbols / wc) if wc else 0.0,
        "digit_frac": digit_frac,
        "dup_line_frac": dup_line_frac,
        "repeated_char_frac": repeated_frac,
        "stopword_count": float(stop_count),
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "line_count": float(n_lines),
    }


# Rule name -> (stat, comparator, config attr, word_len_gated). Evaluated
# identically by the oracle here and by native Spark column expressions in
# operators/quality.py. ``word_len_gated`` rules only apply when the predicted
# language is in WORD_LENGTH_RULE_LANGS.
RULES: list[tuple[str, str, str, str, bool]] = [
    ("too_few_words", "word_count", "<", "min_words", False),
    ("too_many_words", "word_count", ">", "max_words", False),
    ("mean_word_len_low", "mean_word_len", "<", "min_mean_word_len", True),
    ("mean_word_len_high", "mean_word_len", ">", "max_mean_word_len", True),
    ("symbol_ratio_high", "symbol_word_ratio", ">", "max_symbol_word_ratio", False),
    ("digit_frac_high", "digit_frac", ">", "max_digit_frac", False),
    ("dup_line_frac_high", "dup_line_frac", ">", "max_dup_line_frac", False),
    ("repeated_char_high", "repeated_char_frac", ">", "max_repeated_char_frac", False),
    ("too_few_stopwords", "stopword_count", "<", "min_stopwords", False),
    ("bullet_frac_high", "bullet_line_frac", ">", "max_bullet_line_frac", False),
    ("ellipsis_frac_high", "ellipsis_line_frac", ">", "max_ellipsis_line_frac", False),
]


def apply_rules(
    stats: dict[str, float],
    config: QualityConfig,
    lang_conf: float | None = None,
    ppl: float | None = None,
    empty: bool = False,
    lang: str | None = None,
) -> list[str]:
    """Return the sorted list of triggered drop reasons (empty list == keep)."""
    if empty:
        return ["empty_text"]
    word_len_rules = lang is None or lang in WORD_LENGTH_RULE_LANGS
    reasons = [
        name
        for name, stat, op, attr, gated in RULES
        if (not gated or word_len_rules)
        and (
            stats[stat] < getattr(config, attr)
            if op == "<"
            else stats[stat] > getattr(config, attr)
        )
    ]
    if lang_conf is not None and lang_conf < config.min_lang_conf:
        reasons.append("lang_conf_low")
    if ppl is not None and ppl > config.max_ppl:
        reasons.append("perplexity_high")
    return sorted(reasons)
