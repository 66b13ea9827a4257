"""Unicode tokenizer + n-gram helpers.

Re-implements the semantics of /root/reference/tokenizer.py:

- word characters are unicode categories L* (letters), M* (marks), N* (numbers)
  and Co (private use) — tokenizer.py:148-162 ``is_word_char``/``is_text_char``.
- tokens are maximal runs of word characters, with the reference's FULL
  apostrophe state machine (tokenizer.py:181-251): exactly one apostrophe
  merges ("don't"), multi-apostrophe and wait-state sequences stay unmerged
  ("a'b'c" -> a, b, c).
- ``sentence_split`` is the full port of tokenizer.py:398-466: paragraphs on
  newline, sentence ends at whitespace following closing punctuation, with
  closing brackets/quotes passing through and word chars un-closing
  ("192.168.1.1" never splits).
- ``char_ngrams`` / ``word_ngrams`` — tokenizer.py:469-505.

Per-character classification is memoized per process (the reference uses
``lru_cache`` at tokenizer.py:148-176); inside a Spark Python worker the memo
persists across Arrow batches, so amortized cost is one dict lookup per char.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

# tokenizer.py:141-145. NOTE: U+02BC (modifier letter apostrophe) is category
# Lm — a WORD char — so it can never be an apostrophe token; the reference
# set is {straight, curly, fullwidth}.
_APOSTROPHES = "'\u2019\uff07"

# tokenizer.py:24-57 — the reference's whitespace-token set, including its
# deliberate not-technically-whitespace members (ZWSP family, BOM, braille
# blank); sentence-boundary whitespace tests membership here, not
# str.isspace().
UNICODE_SPACES = frozenset(
    "\t\n\v\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
    "\x1c\x1d\x1e\x1f"
    "\u180e\u200b\u200c\u200d\u2060\ufeff\u2800"
)

# tokenizer.py:106-139 — sentence-ending punctuation...
CLOSING_PUNCTUATION = frozenset(
    "!.:;?"
    "\xa1\xbf\u037e\u0589\u06d4\u2026\u203c\u203d\u2047\u2048\u2049"
    "\u3002\ufe12\ufe14\ufe15\ufe16\ufe52\ufe54\ufe55\ufe56\ufe57"
    "\uff01\uff0e\uff1a\uff1b\uff1f\uff61"
)

# ...and the closing brackets/quotes that PRESERVE the sentence-closed state
# (sentence_split_tokens' passthrough set, tokenizer.py:424-430)
SENTENCE_PASSTHROUGH = frozenset(
    '")>]}' + "\uff02\uff09\uff1e\uff3d\uff5d\u201d"
)

# The exact character set Python str.split()/str.strip() treat as whitespace
# \u2014 the SINGLE shared tokenization contract for the word-KN trainer
# (operators/perplexity.py), the Python-side scorers, and the DuckDB oracles
# (oracle/kn_sql.py, oracle/pipeline_sql.py). Derive it once here; deriving
# it in three places risked silent desynchronization (review finding).
PY_WHITESPACE = "".join(chr(c) for c in range(0x3001) if chr(c).isspace())


def py_whitespace_re2_class() -> str:
    """PY_WHITESPACE as an RE2 character class (RE2 \\s is ASCII-only)."""
    return "[" + "".join("\\x{%04X}" % ord(ch) for ch in PY_WHITESPACE) + "]"


@lru_cache(maxsize=None)
def is_word_char(ch: str) -> bool:
    """Letters, marks, numbers, private-use (tokenizer.py:148-162)."""
    cat = unicodedata.category(ch)
    return cat[0] in ("L", "M", "N") or cat == "Co"


@lru_cache(maxsize=None)
def is_punctuation_char(ch: str) -> bool:
    """Unicode P* and S* categories (tokenizer.py:164-173)."""
    return unicodedata.category(ch)[0] in ("P", "S")


def _base_tokens(text: str) -> list[tuple[bool, str]]:
    """The reference's base token stream (tokenizer.py:254-308): maximal
    word-char runs, every other char its own token. (is_word, text) pairs;
    whitespace/punctuation distinction is irrelevant to the merge machine
    (both just fail the WORD/apostrophe membership tests)."""
    out: list[tuple[bool, str]] = []
    start = -1
    for i, ch in enumerate(text):
        if is_word_char(ch):
            if start < 0:
                start = i
        else:
            if start >= 0:
                out.append((True, text[start:i]))
                start = -1
            out.append((False, ch))
    if start >= 0:
        out.append((True, text[start:]))
    return out


def _unicode_tokenize_scan(text: str) -> list[str]:
    """FULL port of the reference apostrophe-merge state machine
    (tokenizer.py:181-251 _merge_apostrophes_into_words), words-only output.

    Exactly ONE apostrophe is merged ("don't" -> don't), and only when the
    word+apos+word run is not adjacent to further apostrophes — "a'b'c"
    yields [a, b, c] UNMERGED, and after any invalid word/apostrophe
    sequence the machine 'waits' (emitting words unmerged) until a
    non-word, non-apostrophe char arrives. Property-tested against a direct
    transliteration of the reference generator (tests/test_properties.py)."""
    words: list[str] = []
    wait = False
    w1 = a2 = w3 = None  # buffered word / apostrophe / word
    for is_word, tx in _base_tokens(text):
        if wait:
            wait = is_word or tx in _APOSTROPHES
            if is_word:
                words.append(tx)
        elif w1 is None:
            if is_word:
                w1 = tx
            else:
                wait = tx in _APOSTROPHES
        elif a2 is None:
            # w1 is a word, so this token cannot be a word
            if tx in _APOSTROPHES:
                a2 = tx
            else:
                words.append(w1)
                w1 = None
        elif w3 is None:
            if is_word:
                w3 = tx
            else:
                wait = tx in _APOSTROPHES
                words.append(w1)
                w1 = a2 = None
        else:
            # w3 is a word, so this token cannot be a word
            if tx not in _APOSTROPHES:
                words.append(w1 + a2 + w3)
            else:
                wait = True
                words.append(w1)
                words.append(w3)
            w1 = a2 = w3 = None
    if w3 is not None:
        words.append(w1 + a2 + w3)
    elif w1 is not None:
        words.append(w1)
    return words


def _build_token_re() -> "re.Pattern[str]":
    """Compile the word-token regex from the generated codepoint ranges
    (oracle/_word_char_ranges.py, same L*/M*/N*/Co classes as is_word_char).
    Token = word-char run, extended through any apostrophe that sits between
    two word chars — exactly the scan's merge rule."""
    from language_identification_spark.oracle._word_char_ranges import (
        WORD_CHAR_RANGES,
    )

    parts = []
    for lo, hi in WORD_CHAR_RANGES:
        if hi > lo:
            parts.append(re.escape(chr(lo)) + "-" + re.escape(chr(hi)))
        else:
            parts.append(re.escape(chr(lo)))
    cls = "[" + "".join(parts) + "]"
    apos = "[" + re.escape(_APOSTROPHES) + "]"
    return re.compile(f"{cls}+(?:{apos}{cls}+)*")


_TOKEN_RE = _build_token_re()


def _unicode_tokenize_regex(text: str) -> list[str]:
    """Regex APPROXIMATION over precomputed category ranges: identical to
    the scan on apostrophe-free text and on the common word'word case
    (property-tested), but it merges greedily where the reference state
    machine refuses — multi-apostrophe words ("a'b'c") and wait-state
    sequences ("'a'b") stay merged here. This is also the shape of the
    DuckDB oracle's tokenizer (oracle/pipeline_sql.py), which documents the
    same bound."""
    return _TOKEN_RE.findall(text)


def unicode_tokenize(text: str) -> list[str]:
    """Word tokens with the reference's one-apostrophe merge rule
    (tokenizer.py:181-251 + :254-308)."""
    return _unicode_tokenize_scan(text)


@lru_cache(maxsize=None)
def _is_letter_mark_char(ch: str) -> bool:
    """F7 char class: letters + marks ONLY — no digits, no private-use
    (datasets/tmp.py:8-15; the commented-out categories are deliberate)."""
    return unicodedata.category(ch)[0] in ("L", "M")


def find_words(text: str) -> list[str]:
    """F7: maximal runs of letter/mark chars (datasets/tmp.py:18-32) — the
    GDELT-notebook tokenizer variant: digits break words ('a1b' -> ['a','b'])
    and there is no apostrophe merge."""
    tokens: list[str] = []
    start = -1
    for i, ch in enumerate(text):
        if _is_letter_mark_char(ch):
            if start < 0:
                start = i
        elif start >= 0:
            tokens.append(text[start:i])
            start = -1
    if start >= 0:
        tokens.append(text[start:])
    return tokens


def _char_class(chars) -> str:
    """Escaped character class (valid in Python re AND RE2 — the same
    pattern is injected into the DuckDB oracle)."""
    return "[" + "".join(re.escape(ch) for ch in sorted(chars)) + "]"


# one sentence boundary = the first whitespace token after a closing-punct
# token, with only passthrough brackets/quotes in between (the closing
# brackets keep `closed` set; any other token — including whitespace and
# words — resets it, which is what un-closes "192.168.1.1"). The regex
# consumes [closing][passthrough]*[space] and a sentinel is inserted AFTER
# the whitespace — exactly where sentence_split_tokens flushes its buffer.
SENTENCE_BOUNDARY_PATTERN = (
    f"({_char_class(CLOSING_PUNCTUATION)}"
    f"{_char_class(SENTENCE_PASSTHROUGH)}*"
    f"{_char_class(UNICODE_SPACES)})"
)
_SENTENCE_BOUNDARY_RE = re.compile(SENTENCE_BOUNDARY_PATTERN)


def sentence_split(text: str) -> list[str]:
    """FULL port of tokenizer.py:398-466 sentence_split(split_newline=True):
    paragraphs on '\\n' (stripped), then within each paragraph a sentence
    ends at the first whitespace after closing punctuation (closing
    brackets/quotes pass through; a word char un-closes, so "192.168.1.1"
    never splits); sentences keep their punctuation and are stripped, empties
    dropped. Implemented per paragraph as re.split WITH a capture group —
    segments and their boundary separators interleave, so no in-band
    sentinel byte is needed (a NUL-bearing web page must not mis-split) —
    property-tested equal to the token-machine transliteration."""
    out: list[str] = []
    for para in text.split("\n"):
        para = para.strip()
        if not para:
            continue
        parts = _SENTENCE_BOUNDARY_RE.split(para)
        # parts = [seg0, sep0, seg1, sep1, ..., segN]; sentence = seg + sep
        for i in range(0, len(parts) - 1, 2):
            seg = (parts[i] + parts[i + 1]).strip()
            if seg:
                out.append(seg)
        tail = parts[-1].strip()
        if tail:
            out.append(tail)
    return out


def char_ngrams(text: str, n: int) -> list[str]:
    """All length-n substrings (tokenizer.py:469-474)."""
    if n <= 0 or len(text) < n:
        return []
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def word_ngrams(words: list[str], n: int) -> list[tuple[str, ...]]:
    """Sliding word n-grams (tokenizer.py:477-505)."""
    if n <= 0 or len(words) < n:
        return []
    return [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]
