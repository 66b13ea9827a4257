"""Compiled-regex PII / boilerplate scrubbing.

Realizes the reference's web-word/PII removal spec (README.md:128-146: "page,
link, click, ... emails, urls, handles, hashtags") and the bracket/tag
strippers prototyped in dictionaries/cleanup.ipynb cells 4,7,12, as an ordered
chain of compiled regexes plus a broadcast badword set.

Pattern dialect note: every pattern below is valid in Python ``re``, Java
regex (Spark's ``regexp_replace``), and RE2 (DuckDB) — no backreferences or
lookaround — so the same chain can run as native JVM expressions (fast path,
whole-stage codegen) or inside the parity pandas UDF, and the DuckDB oracle
SQL reproduces it exactly.

Order matters and is part of the contract: URLs before emails (an email inside
a URL must scrub as part of the URL), emails before handles (the ``@`` of an
email must not leave a dangling handle match).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# (name, pattern, replacement) — applied in order.
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s<>]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-. ]{6,14}\d", "<PHONE>"),
    ("handle", r"@[A-Za-z0-9_]{2,}", "<USER>"),
    ("hashtag", r"#[A-Za-z0-9_]{2,}", "<HASHTAG>"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in SCRUB_PATTERNS]

# Synthetic badword list for the toxicity stage (the real deployment swaps in
# a curated list via the same broadcast-set mechanism; reference wordlist
# loading at datatypes.py:752-754).
DEFAULT_BADWORDS = frozenset({"badword", "slurword", "toxicterm"})


def badword_pattern(badwords: Iterable[str]) -> str:
    """Word-bounded alternation over the badword set, longest-first so
    overlapping entries match greedily (same trick as the reference's
    tag-alternation trie, remove_html_tags.py:145-157)."""
    words = sorted({w for w in badwords if w}, key=lambda w: (-len(w), w))
    if not words:
        return r"(?!x)x"  # matches nothing
    return r"\b(?:" + "|".join(re.escape(w) for w in words) + r")\b"


# Credit-card scrub: a regex alone over-matches (order ids, timestamps), so
# the production recipe (Presidio-style) pairs a candidate pattern with the
# Luhn checksum and masks only validated candidates. The pattern is in the
# same three-dialect-common subset as SCRUB_PATTERNS: \b word boundaries and
# greedy counted repetition behave identically in Python re, Java regex, and
# RE2. 13-19 digits with optional single space/dash separators; a digit run
# longer than 19 can never match (\b fails inside the run on both ends).
CARD_PATTERN = r"\b\d(?:[ -]?\d){12,18}\b"

_CARD_RE = re.compile(CARD_PATTERN)


def luhn_valid(candidate: str) -> bool:
    """Luhn checksum over the candidate's digits (separators stripped):
    from the right, double every second digit, subtract 9 above 9, sum
    divisible by 10."""
    ds = re.sub(r"[ -]", "", candidate)
    total = 0
    for i, ch in enumerate(reversed(ds), start=1):
        d = ord(ch) - 48
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def scrub_cards(text: str | None, repl: str = "<CC>") -> str | None:
    """Mask every Luhn-valid card candidate; invalid candidates (wrong
    checksum — order numbers, phone-ish runs) pass through untouched.
    Masking is by literal replacement of the matched string, identical to
    the distributed expr and the DuckDB oracle (a candidate string that
    also occurs embedded in an unmatched longer run is replaced there too —
    accepted corner, same on every engine)."""
    if text is None:
        return None
    # sorted fold order, matching the expr/oracle exactly (replacement
    # order is observable only when candidates overlap embedded runs)
    for cand in sorted(set(_CARD_RE.findall(text))):
        if luhn_valid(cand):
            text = text.replace(cand, repl)
    return text


def scrub_text(
    text: str | None, badwords: frozenset[str] = DEFAULT_BADWORDS
) -> str | None:
    """Apply the full scrub chain; None passes through."""
    if text is None:
        return None
    for _name, pattern, repl in _COMPILED:
        text = pattern.sub(repl, text)
    if badwords:
        text = re.sub(badword_pattern(badwords), "<BAD>", text, flags=re.IGNORECASE)
    return text
