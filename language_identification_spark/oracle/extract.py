"""Text extraction chain: raw HTML bytes -> clean text.

Defines the byte-identical per-url invariant (BASELINE.json input_hint). The
chain mirrors the reference's semantics:

- ``decode_html``    ~ ensure_unicode (/root/reference/utils.py:15-37): bytes ->
  unicode with encoding fallback. The reference uses bs4.UnicodeDammit.detwingle
  + ftfy.fix_text; neither library is available in this environment, so we use a
  deterministic utf-8 -> cp1252 -> latin-1 cascade (latin-1 never fails), which
  is the dominant real-world behavior of UnicodeDammit for web text.
- ``strip_html``     ~ remove_html_tags (/root/reference/remove_html_tags.py:146-164):
  comments first, then whole <script>/<style> blocks, then any remaining tag,
  each replaced by a single space, followed by HTML entity unescape
  (cleanup.ipynb cell 4 semantics). Patterns are our own; the reference's giant
  140-tag alternation trie is an optimization of the same semantics.
- ``clean_text``     ~ clean_text (/root/reference/language_identification/preprocessing.py:16-27):
  strip standalone digit runs (\\b\\d+\\b), collapse whitespace, empty -> None
  (the reference raises ValueError; None is our relational encoding of that).
- ``truncate_text``  ~ truncate_text (/root/reference/utils.py:91-132): cap text
  at a UTF-8 byte budget, backing off to the last whitespace so words are not
  split; BYTE_LENGTH_LIMIT per preprocessing.py:13.

All functions are deterministic and safe to retry (Spark task retries / Iceberg
idempotent overwrite both require this).
"""

from __future__ import annotations

import html as _html
import re

# /root/reference/language_identification/preprocessing.py:13
BYTE_LENGTH_LIMIT = 10 * 1024 * 1024  # 10 MiB

_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_SCRIPT = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.DOTALL | re.IGNORECASE)
_RE_STYLE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.DOTALL | re.IGNORECASE)
_RE_TAG = re.compile(r"<[!/]?[a-zA-Z][^>]*>")
_RE_STANDALONE_DIGITS = re.compile(r"\b\d+\b")
_RE_WHITESPACE = re.compile(r"\s+")


def decode_html(raw: bytes | bytearray | str | None) -> str | None:
    """bytes -> unicode, deterministic encoding cascade (utils.py:15-37 semantics)."""
    if raw is None:
        return None
    if isinstance(raw, str):
        return raw
    data = bytes(raw)
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    try:
        return data.decode("cp1252")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def strip_html(text: str | None) -> str | None:
    """Remove comments, script/style blocks, then any tag; unescape entities.

    Order matters and matches remove_html_tags.py:160-164: comments are removed
    before script blocks so a commented-out </script> cannot prematurely close
    a script (the reference tests exactly this ordering).
    """
    if text is None:
        return None
    text = _RE_COMMENT.sub(" ", text)
    text = _RE_SCRIPT.sub(" ", text)
    text = _RE_STYLE.sub(" ", text)
    text = _RE_TAG.sub(" ", text)
    return _html.unescape(text)


def clean_text(text: str | None) -> str | None:
    """Strip standalone digits, collapse whitespace; empty -> None.

    preprocessing.py:16-27 semantics. The reference raises ValueError on empty
    input; relationally we return None and the pipeline emits the
    ``empty_text`` drop reason instead.
    """
    if text is None:
        return None
    text = _RE_STANDALONE_DIGITS.sub(" ", text)
    text = _RE_WHITESPACE.sub(" ", text).strip()
    return text if text else None


def truncate_text(text: str | None, limit: int = BYTE_LENGTH_LIMIT) -> str | None:
    """Cap at ``limit`` UTF-8 bytes, backing off to whitespace (utils.py:91-132).

    Uses a direct decode of the byte prefix (errors='ignore' drops a split
    multibyte char) rather than the reference's bisection — same result,
    simpler; then backs off to the last whitespace if one exists in the
    truncated region, like the reference's word-boundary backoff.
    """
    if text is None:
        return None
    encoded = text.encode("utf-8")
    if len(encoded) <= limit:
        return text
    prefix = encoded[:limit].decode("utf-8", errors="ignore")
    cut = max(prefix.rfind(" "), prefix.rfind("\n"), prefix.rfind("\t"))
    if cut > 0:
        prefix = prefix[:cut]
    return prefix


def extract_text(raw_html: bytes | bytearray | str | None) -> str | None:
    """Full extraction chain: decode -> truncate -> strip tags -> clean.

    Truncation happens on the decoded text *before* tag stripping so a
    pathological 100 MiB page never reaches the regex engines (the reference
    applies BYTE_LENGTH_LIMIT before prediction for the same reason).
    """
    text = decode_html(raw_html)
    text = truncate_text(text)
    text = strip_html(text)
    return clean_text(text)
