"""Full scripts.json-grade script language-ID (reference parity backend).

The complete CharSetIndex realization of the reference's script classifier
(/root/reference/language_identification/script_langid/scripts_langid.py:16-84,
datatypes.py:459-520): per-language character sets built from per-script
codepoint ranges (generated data module ``_script_index.py``, derived from
public Unicode script assignments — 92 scripts, ~430k codepoints, 402
languages incl. Baybayin/Tagalog, Tibetan, Burmese, and the Urdu script
triple), a char -> languages inverted index, per-word coverage fractions
(lookup_fraction, J4), the sequential log2 fold with unseen-language penalty
(A11) and the 2^score softmax (A12).

Parity is asserted against captured reference outputs on the reference's own
21-string demo (tests/test_golden_scripts.py + tests/data/
script_langid_golden.json).

Index layout: the per-script ranges are swept into DISJOINT intervals, each
pointing at one interned language-set id — char lookup is one bisect + one
tuple fetch, lru-cached per process (reference memoizes its char classifiers
the same way, tokenizer.py:148-176). The index is a plain picklable tuple so
Spark broadcasts it to executors as data (never a native object).
"""

from __future__ import annotations

import math
import unicodedata
from bisect import bisect_right
from collections import Counter
from functools import lru_cache

from language_identification_spark.oracle._script_index import SCRIPT_DEFS


def _build_intervals() -> tuple[list[int], list[int], list[int], list[tuple[str, ...]], list[str]]:
    """Sweep per-script ranges into disjoint intervals with interned langsets.

    Returns (starts, ends, langset_ids, langsets, all_langs) where interval i
    covers [starts[i], ends[i]] and its languages are langsets[langset_ids[i]].
    """
    events: dict[int, list[tuple[bool, tuple[str, ...]]]] = {}
    for _script, langs, ranges in SCRIPT_DEFS:
        for lo, hi in ranges:
            events.setdefault(lo, []).append((True, langs))
            events.setdefault(hi + 1, []).append((False, langs))
    boundaries = sorted(events)
    active: Counter[str] = Counter()
    starts: list[int] = []
    ends: list[int] = []
    ids: list[int] = []
    langsets: list[tuple[str, ...]] = []
    intern: dict[tuple[str, ...], int] = {}
    all_langs: set[str] = set()
    for i, b in enumerate(boundaries):
        for is_start, langs in events[b]:
            if is_start:
                active.update(langs)
                all_langs.update(langs)
            else:
                active.subtract(langs)
        if not +active:
            continue
        hi = (boundaries[i + 1] - 1) if i + 1 < len(boundaries) else b
        cur = tuple(sorted(k for k, v in active.items() if v > 0))
        lid = intern.setdefault(cur, len(langsets))
        if lid == len(langsets):
            langsets.append(cur)
        # merge with previous interval when contiguous and same langset
        if starts and ends[-1] == b - 1 and ids[-1] == lid:
            ends[-1] = hi
        else:
            starts.append(b)
            ends.append(hi)
            ids.append(lid)
    return starts, ends, ids, langsets, sorted(all_langs)


_STARTS, _ENDS, _IDS, _LANGSETS, SUPPORTED_LANGUAGES = _build_intervals()


@lru_cache(maxsize=None)
def char_langs(ch: str) -> tuple[str, ...]:
    """Languages whose charsets contain ``ch`` (CharSetIndex.lookup_char)."""
    cp = ord(ch)
    i = bisect_right(_STARTS, cp) - 1
    if i >= 0 and cp <= _ENDS[i]:
        return _LANGSETS[_IDS[i]]
    return ()


def lookup_fraction(word: str) -> list[tuple[str, float]]:
    """Per-language coverage fraction of ``word``'s INDEXED chars
    (CharSetIndex.lookup_fraction, datatypes.py:509-520: the denominator
    counts only chars present in the index)."""
    out: Counter[str] = Counter()
    total = 0
    for ch in word:
        langs = char_langs(ch)
        if langs:
            out.update(langs)
            total += 1
    return sorted(
        ((lang, c / total) for lang, c in out.items()), key=lambda kv: (-kv[1], kv[0])
    )


def detect_word(word: str) -> list[tuple[str, float]]:
    """lookup_fraction normalized to sum 1 (scripts_langid.py:40-48)."""
    fr = lookup_fraction(word)
    total = sum(f for _, f in fr)
    return [(lang, f / total) for lang, f in fr]


def _fold_tokens(text: str):
    """The fold's effective token stream, in text order: word-char runs
    (letters/marks/numbers — the reference tokenizer's word tokens) plus each
    symbol-category char as its own token (the reference yields every
    non-word non-space char as a singleton token, tokenizer.py:350-395; only
    S* singletons can score since the index holds L*+S* chars only). Tokens
    with no indexed chars are dropped: they shift every score and the
    cumulative offset by the same constant, which the softmax cancels."""
    from language_identification_spark.oracle.tokenize import is_word_char

    run_start = -1
    for i, ch in enumerate(text):
        if is_word_char(ch):
            if run_start < 0:
                run_start = i
            continue
        if run_start >= 0:
            yield text[run_start:i]
            run_start = -1
        if unicodedata.category(ch)[0] == "S":
            yield ch
    if run_start >= 0:
        yield text[run_start:]


def detect_language_full(text: str) -> list[tuple[str, float]]:
    """The reference fold (scripts_langid.py:51-84): per-word normalized
    coverage folded as log2 sums; languages unseen by a word pay that word's
    min log-prob minus log2(#supported); first-seen languages join at the
    running cumulative offset; finally 2^(score-max) softmax. Returns every
    scored language sorted (prob desc, lang asc)."""
    n_codes = len(SUPPORTED_LANGUAGES)
    scores: dict[str, float] = {}
    cumulative = 0.0
    penalty = math.log2(n_codes)
    for word in _fold_tokens(text):
        fr = detect_word(word)
        if not fr:
            continue
        unseen = set(scores)
        min_score = 0.0
        for lang, prob in fr:
            lp = math.log2(prob)
            if lang in scores:
                scores[lang] += lp
                unseen.discard(lang)
            else:
                scores[lang] = cumulative + lp
            min_score = min(min_score, lp)
        for lang in unseen:
            scores[lang] += min_score - penalty
        cumulative += min_score - penalty
    if not scores:
        return []
    m = max(scores.values())
    exps = {lang: 2.0 ** (s - m) for lang, s in scores.items()}
    z = sum(exps.values())
    return sorted(
        ((lang, e / z) for lang, e in exps.items()), key=lambda kv: (-kv[1], kv[0])
    )


def lang_charset_rows(langs: set[str]) -> list[tuple[str, int, int]]:
    """Per-LANGUAGE charset ranges (lang, cp_lo, cp_hi): the union of every
    script the language is written in, range-compressed — exactly the
    reference's language_charsets construction (scripts_langid.py:20-27, the
    J12 fan-out + per-lang union). Small enough to broadcast / inline in SQL
    (a handful of ranges per language)."""
    per: dict[str, set[int]] = {}
    for _script, ls, ranges in SCRIPT_DEFS:
        hit = [lang for lang in ls if lang in langs]
        if not hit:
            continue
        for lo, hi in ranges:
            cps = set(range(lo, hi + 1))
            for lang in hit:
                per.setdefault(lang, set()).update(cps)
    out: list[tuple[str, int, int]] = []
    for lang in sorted(per):
        merged: list[list[int]] = []
        for cp in sorted(per[lang]):
            if merged and cp == merged[-1][1] + 1:
                merged[-1][1] = cp
            else:
                merged.append([cp, cp])
        out.extend((lang, lo, hi) for lo, hi in merged)
    return out


def scripts_dim_rows(langs: set[str] | None = None) -> list[tuple[str, str, int, int]]:
    """The scripts dimension as relational rows (script, lang, cp_lo, cp_hi)
    — the J12 fan-out shape for join-based script langid queries; optionally
    restricted to a language subset (keeps inlined SQL oracles bounded)."""
    return [
        (script, lang, lo, hi)
        for script, ls, ranges in SCRIPT_DEFS
        for lang in ls
        if langs is None or lang in langs
        for lo, hi in ranges
    ]
