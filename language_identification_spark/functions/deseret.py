"""Deseret transliteration (SURVEY.md F14; reference
deseret/deseret_conversion.py:1-81).

The reference ships two mapping tables and applies them with Python
``str.translate``-style loops in a notebook. Here both directions are
single native column expressions — no Python in the loop, no shuffle,
fully inside whole-stage codegen, so the operator costs one projection
at any corpus size:

- ``fix_deseret``: legacy-font ("weird") chars -> Deseret block. A 1:1
  character map, expressed as ``F.translate`` (codepoint-aware for the
  astral Deseret targets since SPARK-34094).
- ``deseret_phonemes``: Deseret letters -> Latin phoneme strings. 1:N
  (e.g. U+10415 -> 'CH'), so ``translate`` can't express it; instead a
  per-codepoint ``transform`` over ``split(col, '')`` with a literal
  76-entry map lookup, unmapped characters passing through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..oracle._deseret import DESERET_CHARS, PHONEMES, WEIRD_CHARS

__all__ = [
    "fix_deseret",
    "deseret_phonemes",
    "fix_deseret_py",
    "deseret_phonemes_py",
]

_PHONEME_MAP = dict(zip(DESERET_CHARS, PHONEMES))
_WEIRD_MAP = dict(zip(WEIRD_CHARS, DESERET_CHARS))


def fix_deseret(col: Column | str) -> Column:
    """Map legacy-font characters onto the Deseret Unicode block."""
    return F.translate(col, WEIRD_CHARS, DESERET_CHARS)


def deseret_phonemes(col: Column | str) -> Column:
    """Replace every Deseret letter with its Latin phoneme reading; any
    non-Deseret character passes through unchanged."""
    m = F.create_map(
        *[F.lit(x) for pair in zip(DESERET_CHARS, PHONEMES) for x in pair]
    )
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.array_join(
        F.transform(chars, lambda c: F.coalesce(m[c], c)), ""
    )


def fix_deseret_py(text: str) -> str:
    """Row-wise mirror of :func:`fix_deseret` for tests/oracles."""
    return "".join(_WEIRD_MAP.get(c, c) for c in text)


def deseret_phonemes_py(text: str) -> str:
    """Row-wise mirror of :func:`deseret_phonemes` for tests/oracles."""
    return "".join(_PHONEME_MAP.get(c, c) for c in text)
