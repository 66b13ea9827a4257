"""Language identification: unicode-script classifier + char-n-gram Naive Bayes.

Two cooperating backends, mirroring the reference's architecture:

- ``detect_script`` / ``script_langid`` ~ the script-based classifier at
  /root/reference/language_identification/script_langid/scripts_langid.py:40-84
  (per-char script lookup -> per-doc score -> language). Our codepoint-range
  table is built from public Unicode block assignments (the reference derives
  an equivalent table from scripts.json / ucd.all.flat.xml in
  iso15924/parse-ucd.ipynb). Scripts used by exactly one language in the
  supported set give an immediate high-confidence answer; Latin-script
  languages are deferred to the n-gram model.

- ``NgramNBModel`` ~ the fastText stage (fasttext_wrapper.py:39-45): a batch
  text classifier returning ``[(lang, prob)]`` sorted by probability with a
  confidence threshold. fastText's native lib and lid.176 weights are not
  available in this environment, so the engine ships a multinomial Naive Bayes
  over character n-grams — the same model family fastText reduces to for
  langid — trained deterministically by a Spark aggregation job
  (operators/lid.py) or by ``NgramNBModel.train`` on small corpora. When the
  real ``fasttext`` package + model file are present they are used instead
  (operators/lid.py gates on import).

The model is representable as a flat table ``(lang, ngram, logprob)`` plus
per-lang priors/defaults, so training is a pure Spark groupBy/agg job and
scoring broadcasts a small dict — never the unpicklable native object
(SURVEY.md §2.8 L1).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable
from functools import lru_cache

from language_identification_spark.oracle.tokenize import (
    char_ngrams,
    unicode_tokenize,
)

# Public Unicode block ranges (inclusive) -> script name. Coarse but exact for
# the supported language set; extend by adding rows (it is data, not code).
SCRIPT_RANGES: list[tuple[int, int, str]] = [
    (0x0041, 0x005A, "latin"),
    (0x0061, 0x007A, "latin"),
    (0x00C0, 0x024F, "latin"),
    (0x0370, 0x03FF, "greek"),
    (0x0400, 0x04FF, "cyrillic"),
    (0x0530, 0x058F, "armenian"),
    (0x0590, 0x05FF, "hebrew"),
    (0x0600, 0x06FF, "arabic"),
    (0x0750, 0x077F, "arabic"),
    (0x08A0, 0x08FF, "arabic"),
    (0x0900, 0x097F, "devanagari"),
    (0x0980, 0x09FF, "bengali"),
    (0x0B80, 0x0BFF, "tamil"),
    (0x0E00, 0x0E7F, "thai"),
    (0x0E80, 0x0EFF, "lao"),
    (0x0F00, 0x0FFF, "tibetan"),
    (0x1000, 0x109F, "myanmar"),
    (0x10A0, 0x10FF, "georgian"),
    (0x1100, 0x11FF, "hangul"),
    (0x1780, 0x17FF, "khmer"),
    (0x1E00, 0x1EFF, "latin_ext"),  # Vietnamese diacritics live here
    (0x3040, 0x309F, "hiragana"),
    (0x30A0, 0x30FF, "katakana"),
    (0x3130, 0x318F, "hangul"),
    (0x3400, 0x4DBF, "han"),
    (0x4E00, 0x9FFF, "han"),
    (0xAC00, 0xD7AF, "hangul"),
    (0xF900, 0xFAFF, "han"),
]

# Scripts that identify a language uniquely within the supported 11-language
# set (language_identification_test.py:7-19): ar en hi id ms my tl ta th vi zh.
SCRIPT_TO_LANG: dict[str, str] = {
    "arabic": "ar",
    "devanagari": "hi",
    "tamil": "ta",
    "thai": "th",
    "myanmar": "my",
    "han": "zh",
    "hangul": "ko",
    "hiragana": "ja",
    "katakana": "ja",
    "latin_ext": "vi",
}


@lru_cache(maxsize=None)
def char_script(ch: str) -> str | None:
    """Script of one codepoint, or None for non-letter/unlisted chars.
    Memoized per process (the reference lru_caches its char classifiers the
    same way, tokenizer.py:148-176)."""
    cp = ord(ch)
    for lo, hi, name in SCRIPT_RANGES:
        if lo <= cp <= hi:
            return name
    return None


def detect_script(text: str) -> dict[str, float]:
    """Fraction of script-classified chars per script (scripts_langid.py:40-75).
    Counts distinct chars first (C-speed Counter) so the Python-level
    classification runs once per distinct char, not once per char."""
    counts: Counter[str] = Counter()
    for ch, n in Counter(text).items():
        s = char_script(ch)
        if s is not None:
            counts[s] += n
    total = sum(counts.values())
    if not total:
        return {}
    return {s: c / total for s, c in counts.items()}


# smoothing penalty for languages whose charset does not cover a word —
# the "unseen language" factor of the reference's fold (scripts_langid.py:56-71)
SCRIPT_FOLD_PENALTY = 1e-3


def script_langid_scores(text: str) -> list[tuple[str, float]]:
    """Full fold-and-softmax script classifier (A11+A12 semantics,
    scripts_langid.py:40-84): per WORD, the fraction of its chars covered by
    each candidate language's scripts (lookup_fraction, J4); per DOC, a
    sequential log2 accumulation with a smoothing penalty for languages that
    cover none of the word (A11); finally 2^score softmax (A12). Returns all
    candidate languages sorted (prob desc, lang asc)."""
    words = unicode_tokenize(text)
    if not words:
        return []
    langs = sorted(set(SCRIPT_TO_LANG.values()))
    scores = {lang: 0.0 for lang in langs}
    any_signal = False
    for w in words:
        counts: Counter[str | None] = Counter(char_script(ch) for ch in w)
        counts.pop(None, None)
        total = len(w)
        fracs: dict[str, float] = {}
        for script, c in counts.items():
            lang = SCRIPT_TO_LANG.get(script)
            if lang is not None:
                fracs[lang] = fracs.get(lang, 0.0) + c / total
                any_signal = True
        for lang in langs:
            scores[lang] += math.log2(fracs.get(lang, 0.0) or SCRIPT_FOLD_PENALTY)
    if not any_signal:
        return []
    m = max(scores.values())
    exps = {lang: 2.0 ** (s - m) for lang, s in scores.items()}
    z = sum(exps.values())
    return sorted(
        ((lang, e / z) for lang, e in exps.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )


def script_langid(text: str) -> tuple[str | None, float]:
    """(lang, confidence) when the dominant script pins the language; else
    (None, fraction) meaning "defer to the n-gram model" (Latin scripts)."""
    fracs = detect_script(text)
    if not fracs:
        return None, 0.0
    script, frac = max(fracs.items(), key=lambda kv: (kv[1], kv[0]))
    lang = SCRIPT_TO_LANG.get(script)
    if lang is not None:
        return lang, frac
    return None, frac


def ensemble_detect_batch(
    model: "NgramNBModel", texts: list[str | None]
) -> list[tuple[str | None, float]]:
    """L7: the reference's full ensemble cascade semantics
    (language_identification_test.py:30-68), mapped onto this engine's
    backends and vectorized over a batch (ONE NB matrix pass for every row
    the cheap stages don't resolve — the same batching detect_batch uses):

    1. clean_text first (:32-36: digit strip + whitespace collapse; empty
       after cleaning -> (None, 0.0) — the reference returns None there)
    2. the reference's one hardcoded case   (:39-40: 'assalamualaikum'->'ms',
       compared on the CLEANED text like the reference)
    3. unique-script pin (>= 0.5 coverage)  ~ the cld2full/cld2 early returns
       (:42-56 — high-precision backends win outright when they answer)
    4. sys = n-gram NB top-1, score * 0.8   (:59-60: 'backend tends to be
       overconfident even when wrong')
    5. fallback = full script-index fold    (:62-63: constrained fallback)
    6. sys wins only if sys_score * 3/4 > fallback_score (:65-68);
       otherwise the fallback's answer stands. No fold signal -> sys.
    """
    from language_identification_spark.oracle.extract import clean_text
    from language_identification_spark.oracle.script_index import (
        detect_language_full,
    )

    out: list[tuple[str | None, float] | None] = [None] * len(texts)
    nb_rows: list[int] = []
    nb_texts: list[str] = []
    for i, raw in enumerate(texts):
        cleaned = clean_text(raw) if raw else None
        if not cleaned:
            out[i] = (None, 0.0)
            continue
        if cleaned.lower() == "assalamualaikum":
            out[i] = ("ms", 1.0)
            continue
        lang, frac = script_langid(cleaned)
        if lang is not None and frac >= 0.5:
            out[i] = (lang, frac)
            continue
        nb_rows.append(i)
        nb_texts.append(cleaned)
    if nb_texts:
        langs, raw_scores = model._raw_scores_batch(nb_texts)
        for k, i in enumerate(nb_rows):
            if langs:
                sys_lang, sys_prob = NgramNBModel._softmax_top1(
                    langs, raw_scores[:, k]
                )
                sys_score = sys_prob * 0.8
            else:
                # degenerate (untrained) model: no sys answer, but the
                # cascade still consults the fold fallback below (the
                # row-wise reference shape: sys never beats it at score 0)
                sys_lang, sys_score = None, 0.0
            fold = detect_language_full(nb_texts[k])
            if fold:
                fb_lang, fb_score = fold[0]
                if not (sys_score * 3 / 4 > fb_score):
                    out[i] = (fb_lang, fb_score)
                    continue
            out[i] = (sys_lang, sys_score)
    return out  # type: ignore[return-value]


def ensemble_detect(
    model: "NgramNBModel", text: str | None
) -> tuple[str | None, float]:
    """Single-row form of ensemble_detect_batch (same code path, so row-wise
    and batched results are identical by construction)."""
    return ensemble_detect_batch(model, [text])[0]


def ensemble_udf(spark_or_sc, model: "NgramNBModel"):
    """(text) -> struct<lang string, conf double>: the L7 cascade as an
    Arrow-batched UDF with the model broadcast (same executor-singleton
    shape as the NB scorer); one NB matrix pass per Arrow batch."""
    import pandas
    from pyspark.sql import functions as F

    sc = getattr(spark_or_sc, "sparkContext", spark_or_sc)
    bc = sc.broadcast(model)

    def _detect(series: "pandas.Series") -> "pandas.DataFrame":
        rows = ensemble_detect_batch(bc.value, series.tolist())
        return pandas.DataFrame(rows, columns=["lang", "conf"])

    _detect.__annotations__ = {
        "series": pandas.Series,
        "return": pandas.DataFrame,
    }
    return F.pandas_udf(_detect, "lang string, conf double")


class NgramNBModel:
    """Multinomial Naive Bayes over character n-grams with add-k smoothing.

    Flat-table representable: ``table()`` emits (lang, ngram, logprob) rows and
    ``from_table`` rebuilds the model, so Spark-side training
    (groupBy(lang, ngram).count() — SURVEY.md §2.4 A5) and this in-memory
    trainer are interchangeable and testable against each other.
    """

    def __init__(
        self,
        logprobs: dict[str, dict[str, float]],
        defaults: dict[str, float],
        priors: dict[str, float],
        n: int = 3,
    ) -> None:
        self.logprobs = logprobs
        self.defaults = defaults  # smoothed logprob for unseen ngrams, per lang
        self.priors = priors
        self.n = n

    # -- training ---------------------------------------------------------
    @staticmethod
    def _doc_ngrams(text: str, n: int) -> list[str]:
        # lowercase + space padding so word boundaries are features; casefold
        # (not lower) per reference F6 semantics (datatypes.py:595).
        return char_ngrams(f" {text.casefold()} ", n)

    @classmethod
    def train(
        cls, corpus: Iterable[tuple[str, str]], n: int = 3, k: float = 0.5
    ) -> "NgramNBModel":
        counts: dict[str, Counter[str]] = {}
        doc_counts: Counter[str] = Counter()
        vocab: set[str] = set()
        for lang, text in corpus:
            grams = cls._doc_ngrams(text, n)
            counts.setdefault(lang, Counter()).update(grams)
            doc_counts[lang] += 1
            vocab.update(grams)
        v = len(vocab) or 1
        total_docs = sum(doc_counts.values())
        logprobs: dict[str, dict[str, float]] = {}
        defaults: dict[str, float] = {}
        priors: dict[str, float] = {}
        for lang, ctr in sorted(counts.items()):
            total = sum(ctr.values())
            denom = total + k * v
            logprobs[lang] = {
                g: math.log((c + k) / denom) for g, c in sorted(ctr.items())
            }
            defaults[lang] = math.log(k / denom)
            priors[lang] = math.log(doc_counts[lang] / total_docs)
        return cls(logprobs, defaults, priors, n=n)

    # -- scoring ----------------------------------------------------------
    def _dense(self):
        """Lazy per-process dense form: gram->column index, logprob matrix
        (L x V), default/prior vectors. The executor-side cache equivalent of
        the reference's lru_cache'd lookups (tokenizer.py:148-176): built once
        per Python worker, reused across Arrow batches. numpy matrix rows are
        the single scoring implementation for BOTH the row-wise oracle and the
        Spark UDF, so parity is bit-exact by construction."""
        if getattr(self, "_dense_cache", None) is None:
            import numpy as np

            langs = sorted(self.logprobs)
            vocab = sorted({g for t in self.logprobs.values() for g in t})
            idx = {g: i for i, g in enumerate(vocab)}
            mat = np.empty((len(langs), len(vocab)), dtype=np.float64)
            for li, lang in enumerate(langs):
                d = self.defaults[lang]
                table = self.logprobs[lang]
                row = mat[li]
                row.fill(d)
                for g, lp in table.items():
                    row[idx[g]] = lp
            self._dense_cache = (
                langs,
                idx,
                mat,
                np.array([self.defaults[lang] for lang in langs]),
                np.array([self.priors[lang] for lang in langs]),
            )
        return self._dense_cache

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_dense_cache", None)  # rebuilt lazily per process
        return state

    def _raw_scores_batch(self, texts: list[str]):
        """(langs, raw (L x n) log-score matrix) for a batch of documents in
        ONE numpy segment-sum — the single scoring implementation used by the
        row-wise oracle AND the Spark UDF, so parity is bit-exact.

        np.add.reduceat accumulates each segment sequentially; using the same
        routine for batch size 1 keeps per-row and batched results identical
        to the last bit."""
        import numpy as np

        langs, idx, mat, defaults, priors = self._dense()
        n = len(texts)
        cols_all: list[int] = []
        offsets = [0]
        unseen: list[int] = []
        for text in texts:
            grams = self._doc_ngrams(text, self.n)
            cols = [idx[g] for g in grams if g in idx]
            cols_all.extend(cols)
            offsets.append(len(cols_all))
            unseen.append(len(grams) - len(cols))
        raw = np.repeat(priors[:, None], n, axis=1)
        total = len(cols_all)
        if total:
            sub = mat[:, np.asarray(cols_all, dtype=np.int64)]
            # reduceat over NON-EMPTY segments only: empty docs contribute no
            # cols, so consecutive non-empty starts exactly partition the
            # array (clamping trailing empty starts instead would corrupt the
            # preceding document's segment — found the hard way)
            nonempty = [k for k in range(n) if offsets[k + 1] > offsets[k]]
            starts = np.asarray([offsets[k] for k in nonempty], dtype=np.int64)
            seg = np.add.reduceat(sub, starts, axis=1)
            for j, k in enumerate(nonempty):
                raw[:, k] += seg[:, j]
        raw += defaults[:, None] * np.asarray(unseen, dtype=np.float64)[None, :]
        return langs, raw

    @staticmethod
    def _softmax_top1(langs: list[str], raw_col) -> tuple[str, float]:
        """THE softmax/top-1 reduction over one document's raw log-score
        column — single shared implementation (used by detect_batch and the
        ensemble cascade) because results must stay bit-identical across
        every scoring path regardless of Arrow batch boundaries. langs is
        sorted ascending, so argmax's first-max rule gives the (prob desc,
        lang asc) tie-break."""
        import numpy as np

        col = np.ascontiguousarray(raw_col)
        exps = np.exp(col - col.max())
        z = exps.sum()
        top = int(exps.argmax())
        return langs[top], float(exps[top] / z)

    def scores(self, text: str) -> list[tuple[str, float]]:
        """All languages with softmax-normalized probabilities, sorted desc
        then by lang for determinism (fasttext_wrapper.py:43-45 shape)."""
        import numpy as np

        langs, raw = self._raw_scores_batch([text])
        if not langs:
            return []
        col = np.ascontiguousarray(raw[:, 0])
        exps = np.exp(col - col.max())
        z = exps.sum()
        return sorted(
            ((lang, float(e / z)) for lang, e in zip(langs, exps)),
            key=lambda kv: (-kv[1], kv[0]),
        )

    def detect(self, text: str | None) -> tuple[str | None, float]:
        """Top-1 (lang, prob); script shortcut first, like the reference's
        ensemble cascade (language_identification_test.py:30-68 spec)."""
        return self.detect_batch([text])[0]

    def detect_batch(
        self, texts: list[str | None]
    ) -> list[tuple[str | None, float]]:
        """Vectorized detect over a batch: script shortcuts row-wise (cheap,
        memoized), then ONE matrix pass for every remaining document."""
        out: list[tuple[str | None, float] | None] = [None] * len(texts)
        nb_rows: list[int] = []
        nb_texts: list[str] = []
        for i, text in enumerate(texts):
            if not text:
                out[i] = (None, 0.0)
                continue
            lang, frac = script_langid(text)
            if lang is not None and frac >= 0.5:
                out[i] = (lang, frac)
            else:
                nb_rows.append(i)
                nb_texts.append(text)
        if nb_texts:
            langs, raw = self._raw_scores_batch(nb_texts)
            if not langs:
                for i in nb_rows:
                    out[i] = (None, 0.0)
            else:
                # shared softmax/top-1 reduction (_softmax_top1): results
                # must be bit-identical regardless of Arrow batch boundaries
                # (task retries re-batch rows) and across scoring paths
                for k, i in enumerate(nb_rows):
                    out[i] = self._softmax_top1(langs, raw[:, k])
        return out  # type: ignore[return-value]

    # -- flat-table form ----------------------------------------------------
    def table(self) -> list[tuple[str, str, float]]:
        return [
            (lang, g, lp)
            for lang, grams in sorted(self.logprobs.items())
            for g, lp in sorted(grams.items())
        ]

    def meta(self) -> list[tuple[str, float, float]]:
        return [
            (lang, self.priors[lang], self.defaults[lang])
            for lang in sorted(self.logprobs)
        ]

    @classmethod
    def from_table(
        cls,
        rows: Iterable[tuple[str, str, float]],
        meta: Iterable[tuple[str, float, float]],
        n: int = 3,
    ) -> "NgramNBModel":
        logprobs: dict[str, dict[str, float]] = {}
        for lang, g, lp in rows:
            logprobs.setdefault(lang, {})[g] = lp
        priors: dict[str, float] = {}
        defaults: dict[str, float] = {}
        for lang, prior, default in meta:
            priors[lang] = prior
            defaults[lang] = default
            logprobs.setdefault(lang, {})
        return cls(logprobs, defaults, priors, n=n)
