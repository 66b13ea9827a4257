"""Norvig spelling corrector (F13) with a Spark-trained frequency model.

The algorithm is Peter Norvig's public spelling corrector (MIT license,
norvig.com/spell-correct.html; the reference carries it at
pdfs/spellcheck/spell.py with 9 inline assert cases): candidate ranking by
corpus word probability over the known subset of edit-distance-1, then -2,
neighborhoods. Re-expressed here so the WORD MODEL is a Spark aggregation
(groupBy(word).count() over the corpus — the same A5-style count job as the
LMs) collected into a broadcastable Counter; correction itself is a
driver/UDF-side dict computation, like every other broadcast model here.
"""

from __future__ import annotations

import re
import string
from collections import Counter


def spell_words(text: str) -> list[str]:
    r"""\w+ tokenization over lowercased text (spell.py:words)."""
    return re.findall(r"\w+", text.lower())


def edits1(word: str) -> set[str]:
    """All single edits: deletes, adjacent transposes, replaces, inserts
    over ascii lowercase (spell.py:edits1)."""
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [left + right[1:] for left, right in splits if right]
    transposes = [
        left + right[1] + right[0] + right[2:]
        for left, right in splits
        if len(right) > 1
    ]
    replaces = [
        left + c + right[1:]
        for left, right in splits
        if right
        for c in string.ascii_lowercase
    ]
    inserts = [
        left + c + right for left, right in splits for c in string.ascii_lowercase
    ]
    return set(deletes + transposes + replaces + inserts)


def edits2(word: str):
    return (e2 for e1 in edits1(word) for e2 in edits1(e1))


class SpellModel:
    """Word-frequency model + correction (spell.py:P/candidates/correction).

    Ties in max(candidates, key=P) follow the reference's iteration-order
    dependence unless broken; we break them totally (probability desc, word
    asc) so distributed use is deterministic.
    """

    def __init__(self, counts: Counter[str]) -> None:
        self.counts = counts
        self.total = sum(counts.values()) or 1

    @classmethod
    def train_text(cls, text: str) -> "SpellModel":
        return cls(Counter(spell_words(text)))

    def p(self, word: str) -> float:
        return self.counts[word] / self.total

    def known(self, words) -> set[str]:
        return {w for w in words if w in self.counts}

    def candidates(self, word: str) -> set[str]:
        return (
            self.known([word])
            or self.known(edits1(word))
            or self.known(edits2(word))
            or {word}
        )

    def correction(self, word: str) -> str:
        # min over (-p, word) = probability desc then word ASC, matching the
        # documented total order (max with key (p, w) would break prob ties
        # by word DESCENDING)
        return min(self.candidates(word), key=lambda w: (-self.p(w), w))


def train_spell_spark(corpus, text_col: str = "text") -> SpellModel:
    """The word model as a Spark count job: explode \\w+ tokens of the
    lowercased corpus -> groupBy(word).count() -> collect the (vocab-sized,
    corpus-size-independent) table into a SpellModel."""
    from pyspark.sql import functions as F

    # (?U) = Java UNICODE_CHARACTER_CLASS, matching Python re's unicode
    # \w semantics (plain Java \w is ASCII-only — tested on 'naïve')
    rows = (
        corpus.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"(?U)\w+"), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return SpellModel(Counter({r["word"]: r["n"] for r in rows}))
