"""DuckDB oracle for the ``ensemble_langid`` gate entry — the L7 cascade.

The shipped ensemble (oracle/langid.py:ensemble_detect_batch, the reference's
language_identification_test.py:30-68 cascade) is a pandas UDF, but every
stage is relationally expressible over a deterministic multi-script corpus
derived from the ``documents`` parquet:

1. **clean_text** — the digit-strip + whitespace-collapse replay already
   gate-proven by SQL_TEXTCAT_LANGID (RE2 ``\\b`` is ASCII where Python's is
   Unicode; the injected strings keep digits away from non-ASCII chars, the
   documented divergence surface of that contract).
2. **hardcode** — ``lower(ct) = 'assalamualaikum'``.
3. **script pin** (script_langid frac >= 0.5): per-char classification over
   the 28-row SCRIPT_RANGES dim, dominant script by (count DESC, script
   DESC) — Python's ``max`` on (frac, script) tuples breaks frac ties toward
   the LARGER script name — joined to the 10-row SCRIPT_TO_LANG dim.
4. **NB** — the same (lang, gram, logprob) VALUES replay as the flagship
   oracle (oracle/pipeline_sql.py), but over the CLEANED text (the cascade
   scores clean_text output, not the raw page). ``lower`` stands in for
   Python's ``casefold``: the corpus is ASCII + caseless/no-final-sigma
   injected strings, where the two agree.
5. **fold fallback** (script_index.detect_language_full): the sequential
   per-token accumulation has an ORDER-INDEPENDENT closed form —

       score(lang) = sum_{tokens t covering lang} lp_t(lang)
                   + sum_{tokens t not covering}  (min_lp(t) - log2(N))

   and the second sum decomposes so that, up to a per-document constant C
   that the softmax cancels,

       score(lang) = C + sum_{t covering lang} (lp_t(lang) - min_lp(t) + log2(N))

   which is a plain join + SUM over the 15k-row (lang, lo, hi) charset dim
   (the same public-UCD-derived SCRIPT_DEFS the Spark side uses). Fold
   tokens are word-char runs ``[\\p{L}\\p{M}\\p{N}\\p{Co}]+`` plus S-category
   singletons (oracle/script_index.py:_fold_tokens); the closed form is
   order-independent, so token ORDER never needs reconstructing.
6. **3/4-margin choice** — ``NOT (sys_prob * 0.8 * 3 / 4 > fb_score)`` picks
   the fold, exactly the Python operand order.

Float discipline (same convention as the flagship oracle): conf is rounded
to 6 dp on both sides; fold ranking uses ``round(score, 9)`` — cross-engine
summation noise is ~1e-12 while genuinely distinct languages differ by
>=~1e-4 (coverage fractions are small-integer ratios), so the rounded key
reproduces Python's (prob DESC, lang ASC) tie-break including exact-tie
cases where unrounded SQL sums would order by ulp noise. The margin
comparison and NB argmax compare unrounded floats — a cross-engine flip
needs two values within ~1e-11, the accepted documented residual.
"""

from __future__ import annotations

import math

from language_identification_spark.oracle.langid import (
    SCRIPT_RANGES,
    SCRIPT_TO_LANG,
)
from language_identification_spark.oracle.script_index import (
    SCRIPT_DEFS,
    SUPPORTED_LANGUAGES,
    lang_charset_rows,
)

# mutation cases keyed by doc_id % 13 — the single source of truth for BOTH
# engines. Chosen so every cascade stage fires on any corpus slice: empty,
# digits-only (cleans to NULL), the hardcode, four unique-script pins,
# mixed-script and Greek docs that fall through to NB-vs-fold, a currency-
# symbol-only doc (fold over S* singletons), and a Latin+Arabic concat where
# the dominant script stays under the 0.5 pin threshold on real-length docs.
ENSEMBLE_FIXED: dict[int, str] = {
    0: "",
    1: "42 17 99",
    2: "Assalamualaikum",
    3: "مرحبا بالعالم كيف الحال اليوم",
    4: "สวัสดีชาวโลกวันนี้",
    5: "你好世界今天天气很好",
    6: "안녕하세요 세계 여러분",
    7: "こんにちは世界のみなさん",
    8: "Ωμέγα άλφα βήτα γάμμα δέλτα",
    9: "$ € ¥ £ ₩",
    # Armenian: not in the 28-range pin dim, covered by few charset-index
    # languages -> the FOLD beats the 0.8*NB answer (the only stage the
    # other cases leave dark; NB's unseen-gram defaults still make it ~0.8
    # confident on Greek, so Greek exercises sys-wins-on-foreign instead)
    11: "Բարեւ աշխարհ խաղաղություն",
}
ENSEMBLE_CONCAT_CASE = 10  # text || ENSEMBLE_CONCAT_SUFFIX (NULL-propagating)
ENSEMBLE_CONCAT_SUFFIX = " مرحبا بكم"
ENSEMBLE_MOD = 13  # case 12 keeps the original text


def mutated_text_col(doc_id, text):
    """The Spark Column form of the mutation (doc_id % 13 dispatch)."""
    from pyspark.sql import functions as F

    m = doc_id % ENSEMBLE_MOD
    expr = F.when(m == ENSEMBLE_CONCAT_CASE,
                  F.concat(text, F.lit(ENSEMBLE_CONCAT_SUFFIX)))
    for k, v in ENSEMBLE_FIXED.items():
        expr = expr.when(m == k, F.lit(v))
    return expr.otherwise(text)


def _mutated_text_sql() -> str:
    whens = "\n    ".join(
        f"WHEN {k} THEN '{v}'" for k, v in ENSEMBLE_FIXED.items()
    )
    return (
        f"CASE doc_id % {ENSEMBLE_MOD}\n    {whens}\n"
        f"    WHEN {ENSEMBLE_CONCAT_CASE} THEN text || '{ENSEMBLE_CONCAT_SUFFIX}'\n"
        f"    ELSE text END"
    )


# fold token classes (oracle/script_index.py:_fold_tokens): word-char runs
# (is_word_char = L*/M*/N*/Co, oracle/tokenize.py:73-76) + S* singletons
_WORD_RUN_RE = r"[\p{L}\p{M}\p{N}\p{Co}]+"
_SYMBOL_RE = r"[\p{S}]"

# clean_text replay (oracle/extract.py:169-185) — identical to the
# gate-proven SQL_TEXTCAT_LANGID cleaned CTE
_CLEAN_SQL = (
    r"nullif(trim(regexp_replace(regexp_replace(text, "
    r"'\b\d+\b', '', 'g'), '[\t\n\x0b\f\r ]+', ' ', 'g')), '')"
)


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def ensemble_oracle_sql(model) -> str:
    """Full-cascade oracle over the mutated ``documents`` view: columns
    (doc_id, lang, conf), conf rounded to 6 dp, byte-matching
    ensemble_udf output under the gate canonicalizer."""
    nb_rows = ", ".join(
        f"('{_sql_quote(lang)}', '{_sql_quote(g)}', {lp!r})"
        for lang, g, lp in model.table()
    )
    meta_rows = ", ".join(
        f"('{_sql_quote(lang)}', {prior!r}, {dflt!r})"
        for lang, prior, dflt in model.meta()
    )
    script_rows = ", ".join(
        f"({lo}, {hi}, '{name}')" for lo, hi, name in SCRIPT_RANGES
    )
    script_lang_rows = ", ".join(
        f"('{s}', '{lg}')" for s, lg in sorted(SCRIPT_TO_LANG.items())
    )
    all_langs: set[str] = set()
    for _script, langs, _ranges in SCRIPT_DEFS:
        all_langs.update(langs)
    charset_rows = ", ".join(
        f"('{lg}', {lo}, {hi})" for lg, lo, hi in lang_charset_rows(all_langs)
    )
    penalty = math.log2(len(SUPPORTED_LANGUAGES))

    return f"""
WITH nb(lang, gram, lp) AS (VALUES {nb_rows}),
nbmeta(lang, prior, dflt) AS (VALUES {meta_rows}),
scripts(lo, hi, script) AS (VALUES {script_rows}),
script_lang(script, slang) AS (VALUES {script_lang_rows}),
charset(clang, lo, hi) AS (VALUES {charset_rows}),
base AS (
  SELECT doc_id, {_mutated_text_sql()} AS text FROM documents
),
cleaned AS (
  SELECT doc_id, {_CLEAN_SQL} AS ct FROM base
),
-- stage 3: dominant-script pin (detect_script + SCRIPT_TO_LANG)
sch AS (
  SELECT doc_id, substring(ct, i, 1) AS ch
  FROM cleaned, unnest(range(1, length(ct) + 1)) AS t(i)
  WHERE ct IS NOT NULL
),
scc AS (SELECT doc_id, unicode(ch) AS cp, count(*) AS n FROM sch GROUP BY 1, 2),
sfrac AS (
  SELECT doc_id, s.script, sum(n) AS c
  FROM scc JOIN scripts s ON scc.cp BETWEEN s.lo AND s.hi
  GROUP BY 1, 2
),
sdom AS (
  SELECT doc_id, script,
         c * 1.0 / sum(c) OVER (PARTITION BY doc_id) AS frac,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, script DESC) AS rn
  FROM sfrac
),
pin AS (
  SELECT d.doc_id, sl.slang AS pin_lang, d.frac AS pin_frac
  FROM sdom d JOIN script_lang sl ON sl.script = d.script
  WHERE d.rn = 1 AND d.frac >= 0.5
),
-- stage 4: NB over the CLEANED text (flagship-oracle replay shape)
padded AS (
  SELECT doc_id, ' ' || lower(ct) || ' ' AS p FROM cleaned WHERE ct IS NOT NULL
),
grams AS (
  SELECT doc_id, substring(p, i, 3) AS gram
  FROM padded, unnest(range(1, greatest(length(p) - 1, 1))) AS t(i)
  WHERE length(p) >= 3
),
gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
raws AS (
  SELECT gc.doc_id, m.lang, m.prior + sum(gc.c * coalesce(nb.lp, m.dflt)) AS raw
  FROM gc
  CROSS JOIN nbmeta m
  LEFT JOIN nb ON nb.lang = m.lang AND nb.gram = gc.gram
  GROUP BY gc.doc_id, m.lang, m.prior
),
soft AS (
  SELECT doc_id, lang, raw,
         exp(raw - max(raw) OVER (PARTITION BY doc_id)) AS e
  FROM raws
),
zs AS (
  SELECT doc_id, lang, raw, e, sum(e) OVER (PARTITION BY doc_id) AS z FROM soft
),
sys1 AS (
  SELECT doc_id, lang AS sys_lang, (e / z) * 0.8 AS sys_score
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY raw DESC, lang ASC) AS rn
        FROM zs)
  WHERE rn = 1
),
-- stage 5: the fold (closed form; see module docstring)
wtok AS (
  SELECT doc_id, t AS tok
  FROM cleaned,
       unnest(regexp_extract_all(ct, '{_WORD_RUN_RE}')) AS u(t)
  WHERE ct IS NOT NULL
  UNION ALL
  SELECT doc_id, t AS tok
  FROM cleaned,
       unnest(regexp_extract_all(ct, '{_SYMBOL_RE}')) AS u(t)
  WHERE ct IS NOT NULL
),
tmult AS (SELECT doc_id, tok, count(*) AS m FROM wtok GROUP BY 1, 2),
vocab AS (SELECT DISTINCT tok FROM tmult),
vchars AS (
  SELECT tok, substring(tok, i, 1) AS ch
  FROM vocab, unnest(range(1, length(tok) + 1)) AS t(i)
),
vcc AS (SELECT tok, unicode(ch) AS cp, count(*) AS n FROM vchars GROUP BY 1, 2),
cov AS (
  SELECT v.tok, c.clang, sum(v.n) AS covered
  FROM vcc v JOIN charset c ON v.cp BETWEEN c.lo AND c.hi
  GROUP BY 1, 2
),
covch AS (
  SELECT DISTINCT v.tok, v.cp
  FROM vcc v JOIN charset c ON v.cp BETWEEN c.lo AND c.hi
),
tot AS (
  SELECT v.tok, sum(v.n) AS indexed
  FROM vcc v JOIN covch USING (tok, cp)
  GROUP BY 1
),
fr AS (
  SELECT cov.tok, cov.clang, cov.covered * 1.0 / tot.indexed AS f
  FROM cov JOIN tot USING (tok)
),
nf AS (
  SELECT tok, clang,
         log2(f / sum(f) OVER (PARTITION BY tok)) AS lp
  FROM fr
),
tmin AS (SELECT tok, min(lp) AS min_lp FROM nf GROUP BY 1),
contrib AS (
  SELECT nf.tok, nf.clang, nf.lp - t.min_lp + {penalty!r} AS g
  FROM nf JOIN tmin t USING (tok)
),
fscore AS (
  SELECT tm.doc_id, c.clang, sum(tm.m * c.g) AS s
  FROM tmult tm JOIN contrib c USING (tok)
  GROUP BY 1, 2
),
fsoft AS (
  SELECT doc_id, clang, s,
         pow(2.0, s - max(s) OVER (PARTITION BY doc_id)) AS e
  FROM fscore
),
fzs AS (
  SELECT doc_id, clang, s, e, sum(e) OVER (PARTITION BY doc_id) AS z FROM fsoft
),
fold1 AS (
  SELECT doc_id, clang AS fb_lang, e / z AS fb_score
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY round(s, 9) DESC, clang ASC) AS rn
        FROM fzs)
  WHERE rn = 1
)
SELECT b.doc_id,
  CASE WHEN c.ct IS NULL THEN NULL
       WHEN lower(c.ct) = 'assalamualaikum' THEN 'ms'
       WHEN p.pin_lang IS NOT NULL THEN p.pin_lang
       WHEN f.fb_lang IS NOT NULL AND NOT (s.sys_score * 3 / 4 > f.fb_score)
            THEN f.fb_lang
       ELSE s.sys_lang END AS lang,
  round(CASE WHEN c.ct IS NULL THEN 0.0
       WHEN lower(c.ct) = 'assalamualaikum' THEN 1.0
       WHEN p.pin_lang IS NOT NULL THEN p.pin_frac
       WHEN f.fb_lang IS NOT NULL AND NOT (s.sys_score * 3 / 4 > f.fb_score)
            THEN f.fb_score
       ELSE s.sys_score END, 6) AS conf
FROM base b
LEFT JOIN cleaned c USING (doc_id)
LEFT JOIN pin p USING (doc_id)
LEFT JOIN sys1 s USING (doc_id)
LEFT JOIN fold1 f USING (doc_id)
"""
