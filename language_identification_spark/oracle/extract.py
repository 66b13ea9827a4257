"""Text extraction chain: raw HTML bytes -> clean text.

Defines the byte-identical per-url invariant (BASELINE.json input_hint). The
chain mirrors the reference's semantics:

- ``decode_html``    ~ ensure_unicode (/root/reference/utils.py:15-37): bytes ->
  unicode with encoding fallback. The reference uses bs4.UnicodeDammit.detwingle
  + ftfy.fix_text; neither library is available in this environment, so we use
  our own detwingle port, a deterministic utf-8 -> cp1252 -> latin-1 cascade
  (latin-1 never fails — the dominant real-world behavior of UnicodeDammit for
  web text), then ``fix_mojibake`` — a minimal ftfy-style re-decode pass
  covering the utf8-as-cp1252 'Ã©' class (incl. double-encoded), the
  utf8-as-latin1 C1-gap class, the utf8-as-cp1251 Cyrillic class, and
  stray/double HTML entities.
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


def detwingle(data: bytes) -> bytes:
    """Fix Windows-1252 bytes embedded in mostly-UTF-8 data (the public
    split-on-high-bytes algorithm behind bs4 UnicodeDammit.detwingle, which
    the reference applies to every bytes input — utils.py:26-27): walk the
    bytes; a valid UTF-8 multibyte sequence is copied through; any other
    high byte is re-encoded from its cp1252 meaning (bytes cp1252 leaves
    undefined are copied raw). Output is (near-)valid UTF-8."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b < 0x80:
            out.append(b)
            i += 1
            continue
        if 0xC2 <= b <= 0xDF:
            seq_len = 2
        elif 0xE0 <= b <= 0xEF:
            seq_len = 3
        elif 0xF0 <= b <= 0xF4:
            seq_len = 4
        else:
            seq_len = 0
        if seq_len and i + seq_len <= n:
            chunk = data[i : i + seq_len]
            try:
                chunk.decode("utf-8")
                out += chunk
                i += seq_len
                continue
            except UnicodeDecodeError:
                pass
        try:
            out += bytes([b]).decode("cp1252").encode("utf-8")
        except UnicodeDecodeError:  # 0x81/0x8D/0x8F/0x90/0x9D: undefined
            out.append(b)
        i += 1
    return bytes(out)


def _encode_sloppy(text: str, codec: str) -> bytes | None:
    """Chars -> their single-byte form under ``codec``, with any <=0xFF
    codepoint the codec cannot encode mapped back to its raw byte (ftfy's
    'sloppy-' codec semantics — the inverse of how mojibake text was
    mis-decoded in the first place: cp1252's 0x80-0x9F gap and cp1251's
    0x98 surface as those raw codepoints). None when any char has no
    single-byte form at all (not mojibake-shaped for this codec)."""
    out = bytearray()
    for ch in text:
        try:
            out += ch.encode(codec)
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp <= 0xFF:
                out.append(cp)
            else:
                return None
    return bytes(out)


def _encode_sloppy_cp1252(text: str) -> bytes | None:
    return _encode_sloppy(text, "cp1252")


def _encode_sloppy_cp1251(text: str) -> bytes | None:
    return _encode_sloppy(text, "cp1251")


def _encode_sloppy_koi8r(text: str) -> bytes | None:
    return _encode_sloppy(text, "koi8_r")


def _encode_sloppy_macroman(text: str) -> bytes | None:
    return _encode_sloppy(text, "mac_roman")


# Windows smart-quote autocorrect substitutions, inverted: when mojibake
# passed through Word/Outlook-style smart quoting, ASCII quotes that were
# PART OF THE ORIGINAL TEXT (ASCII bytes never occur inside UTF-8
# multibyte sequences, so a straight quote in mojibake is always original
# text) got curled — which breaks the sloppy-cp1252 inverse, because the
# curled char re-encodes to 0x91-0x94 instead of the 0x27/0x22 the UTF-8
# stream needs. Un-curling restores the original byte. Dash/ellipsis
# autocorrect (-- -> en dash, ... -> ellipsis) is NOT inverted: those are
# many-to-one and cannot be restored per-char.
_SMART_QUOTE_TRANS = str.maketrans(
    {"‘": "'", "’": "'", "“": '"', "”": '"'}
)


def fix_mojibake(text: str) -> str:
    """Minimal ftfy.fix_text-style repair, the pass the reference applies
    after detwingle (utils.py:33). Implemented classes:

    - UTF-8-read-as-cp1252 ('Ã©' -> 'é') AND UTF-8-read-as-latin1
      ('â\\x82¬' -> '€'): one shared inverse, because sloppy-cp1252
      encoding maps printable cp1252 chars to their cp1252 byte and the
      0x80-0x9F C1 gap codepoints (what latin-1 mis-decoding produces)
      back to their raw byte. A repair is accepted only when the sloppy
      byte form of the WHOLE string strictly decodes as UTF-8 — ordinary
      Latin text ('café', 'À demain') fails that decode and passes
      through untouched, the same conservative bar ftfy's badness
      heuristic enforces. Looped to unwind doubly-encoded text.
    - UTF-8-read-as-cp1251 ('РїСЂРёРІРµС‚' -> 'привет'), the dominant
      Cyrillic-web mojibake class, via the sloppy-windows-1251 inverse
      under the same whole-string strict-UTF-8 accept bar. Tried AFTER
      the cp1252 inverse (ftfy's Western-first preference); clean
      Cyrillic text survives because real-word cp1251 byte runs are not
      valid UTF-8 continuation patterns (pinned by fixture).
    - UTF-8-read-as-koi8-r ('п©я─п╦п╡п╣я┌' -> 'привет'), the older
      Unix-Cyrillic mojibake class, and UTF-8-read-as-macroman
      ('caf√©' -> 'café', '‚Äúquoted‚Äù' -> '“quoted”'), the classic
      Mac-origin class — same sloppy-inverse + whole-string strict-UTF-8
      accept bar. Preference order is cp1252, cp1251, koi8-r, macroman
      (ftfy's Western-first convention): a cp1252-mojibake string also
      re-encodes to valid UTF-8 under the koi8-r/macroman inverses with a
      WRONG repair, so the earlier class must win (pinned by fixture).
    - curly-quote-MANGLED utf8-as-cp1252 ('it’s cafÃ©' -> "it's café"):
      mojibake that subsequently passed through Windows smart-quote
      autocorrect. Straight quotes in mojibake are always ORIGINAL text
      (ASCII bytes never occur inside UTF-8 multibyte sequences), so a
      curled one re-encodes to 0x91-0x94 instead of the 0x27/0x22 the
      stream needs and blocks the whole-string repair. When the plain
      inverses all fail, quotes are un-curled and the cp1252 inverse
      retried — accepted only if the repair changes something beyond the
      un-curling, so clean curly-quote text ('“hello”') is never
      straightened (pinned by fixture). Dash/ellipsis autocorrect is
      many-to-one and stays un-inverted.
    - stray/double HTML entities ('caf&eacute;', '&amp;eacute;' — the
      double class unwinds across loop passes: '&amp;eacute;' ->
      '&eacute;' -> 'é', pinned by fixture): unescaped per pass, with
      ftfy's fix_entities='auto' guard — skipped when the text looks like
      actual markup (contains both '<' and '>'), so real HTML flowing
      through decode_html is never mangled before strip_html does its one
      sanctioned unescape.

    Residual divergence from full ftfy (documented): no partial-string
    repair (a single mojibake word inside clean non-Latin-1 text stays —
    a clean curly quote ADJACENT to a mojibake span is the one exception:
    the un-curl retry repairs the span at the cost of straightening that
    quote), no C1-control normalization, no lossy-replacement-char
    recovery, no dash/ellipsis autocorrect inversion, no encoding
    families beyond cp1252/latin-1/cp1251/koi8-r/macroman (cp437 and the
    East-Asian double-byte families are out)."""
    for _ in range(3):
        changed = False
        if "&" in text and not ("<" in text and ">" in text):
            unescaped = _html.unescape(text)
            if unescaped and unescaped != text:
                text = unescaped
                changed = True
        if any(ord(ch) > 0x7F for ch in text):
            repaired = False
            for encoder in (
                _encode_sloppy_cp1252,
                _encode_sloppy_cp1251,
                _encode_sloppy_koi8r,
                _encode_sloppy_macroman,
            ):
                data = encoder(text)
                if data is None:
                    continue
                try:
                    fixed = data.decode("utf-8")
                except UnicodeDecodeError:
                    continue
                if fixed and fixed != text:
                    text = fixed
                    changed = repaired = True
                    break
            if not repaired:
                # curly-quote-mangled utf8-as-cp1252: un-curl smart quotes
                # (original ASCII bytes — see _SMART_QUOTE_TRANS) and retry
                # the cp1252 inverse. Accepted ONLY when the repair changes
                # something BEYOND the un-curling itself, so clean text
                # with curly quotes is never straightened.
                translated = text.translate(_SMART_QUOTE_TRANS)
                if translated != text:
                    data = _encode_sloppy_cp1252(translated)
                    if data is not None:
                        try:
                            fixed = data.decode("utf-8")
                        except UnicodeDecodeError:
                            fixed = None
                        if fixed and fixed != translated:
                            text = fixed
                            changed = True
        if not changed:
            return text
    return text


def decode_html(raw: bytes | bytearray | str | None) -> str | None:
    """bytes -> unicode (utils.py:15-37 semantics): detwingle mixed
    utf-8/cp1252 first (the reference's UnicodeDammit.detwingle step), then a
    deterministic utf-8 -> cp1252 -> latin-1 cascade (latin-1 never fails) in
    place of UnicodeDammit's chardet guess, then the ftfy-style mojibake
    repair (fix_mojibake ~ the reference's ftfy.fix_text step, utils.py:33)."""
    if raw is None:
        return None
    if isinstance(raw, str):
        return fix_mojibake(raw)
    data = detwingle(bytes(raw))
    try:
        return fix_mojibake(data.decode("utf-8"))
    except UnicodeDecodeError:
        pass
    try:
        return fix_mojibake(data.decode("cp1252"))
    except UnicodeDecodeError:
        return fix_mojibake(data.decode("latin-1"))


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

    preprocessing.py:16-27 semantics, exactly: the digit sub replaces with
    the EMPTY string (reference ``re.sub(r'\\b\\d+\\b', '', ...)``) — so
    'a(1)b' -> 'a()b', NOT 'a( )b'; the later whitespace collapse only
    merges the space runs digit removal exposes between words. Python's
    ``\\d``/``\\s``/``\\b`` are Unicode-aware like the reference's
    re.UNICODE. The reference raises ValueError on empty input; relationally
    we return None and the pipeline emits the ``empty_text`` drop reason
    instead.
    """
    if text is None:
        return None
    text = _RE_STANDALONE_DIGITS.sub("", text)
    text = _RE_WHITESPACE.sub(" ", text).strip()
    return text if text else None


_RE_ONE_WS = re.compile(r"\s")


def truncate_text(text: str | None, limit: int = BYTE_LENGTH_LIMIT) -> str | None:
    """Cap at ``limit`` UTF-8 bytes — the exact contract of
    utils.py:91-132 truncate_text(max_bytes_length=limit): bisect the CHAR
    length until the encoded prefix fits, then back off to a whitespace
    within the LAST 1% of the window (or cut hard when none is there), and
    strip() the result. None stays None (relational null; the reference
    returns '' for falsy input)."""
    if text is None:
        return None
    if not text:
        return ""
    tsl = min(limit, len(text))
    min_length = 0
    while len(text[:tsl].encode("utf-8")) > limit:
        delta = (tsl - min_length) // 2
        if delta == 0:
            tsl -= 1
            break
        if len(text[: min_length + delta].encode("utf-8")) > limit:
            tsl = min_length + delta
        else:
            min_length = min_length + delta
    if tsl < len(text):
        for i in range(tsl // 100):
            if _RE_ONE_WS.fullmatch(text[tsl - i]) is not None:
                text = text[: tsl - i]
                break
        else:
            text = text[:tsl]
    return text.strip()


# compressed-archive suffixes + numbered multipart suffixes that keep their
# inner extension (utils.py:58-68)
_EXT_SUFFIXES = frozenset(
    {".gz", ".bz2", ".lz", ".lzma", ".lzo", ".xz", ".z", ".zst"}
    | {f".{i:03d}" for i in range(100)}
)
_EXT_MAX_LEN = 6  # utils.py:51 — 'arbitrary, but must fit .docx'


def split_filename(filename: str) -> tuple[str, str]:
    """F9: (stem, normalized extension) — utils.py:50-88 contract: known
    compression/multipart suffixes keep the inner extension ('a.tar.gz' ->
    ('a', '.tar.gz')); extensions longer than 6 chars fold back into the
    stem; .htm -> .html, .jpeg -> .jpg; stem stripped. Requires a '.' like
    the reference (rsplit('.', 1) raises otherwise)."""
    import os

    base = decode_html(filename) if isinstance(filename, (bytes, bytearray)) else filename
    stem, ext = os.path.basename(base).rsplit(".", 1)
    ext = "." + ext.strip().lower()
    suffix = ""
    if ext in _EXT_SUFFIXES and "." in stem[-_EXT_MAX_LEN:]:
        suffix = ext
        stem, ext = stem.rsplit(".", 1)
        ext = "." + ext.strip().lower()
    if len(ext) > _EXT_MAX_LEN:
        stem, ext = stem + ext, ""
    elif ext == ".htm":
        ext = ".html"
    elif ext == ".jpeg":
        ext = ".jpg"
    return stem.strip(), ext + suffix


# the reference's comment pattern verbatim semantics (remove_html_tags.py:155):
# GREEDY and newline-blind by design — 'a<!--x-->b<!--y-->c' yields ONE
# comment 'x-->b<!--y', and comments never span lines. Kept separate from the
# stricter _RE_COMMENT the strip chain uses (non-greedy + DOTALL, which the
# comment-in-script parity fixtures pin down).
_RE_COMMENT_REF = re.compile(r"<!--(?P<comment>.*)-->", re.IGNORECASE)


def get_comments(text: str | None) -> list[str]:
    """P4: extract HTML comment bodies (remove_html_tags.py:167-168)."""
    if text is None:
        return []
    return [m.group("comment") for m in _RE_COMMENT_REF.finditer(text)]


def check_languages(specified, supported) -> list[str] | set[str]:
    """P6: validate/intersect requested language codes with the supported set
    (preprocessing.py:30-46): falsy input -> sorted(supported); otherwise the
    set intersection, silently dropping unsupported codes; non-string codes
    raise TypeError."""
    if not specified:
        return sorted(supported)
    out: set[str] = set()
    for lc in set(specified):
        if not isinstance(lc, str):
            raise TypeError(lc)
        if lc in supported:
            out.add(lc)
    return out


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
