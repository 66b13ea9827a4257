"""DuckDB oracle for the FLAGSHIP quality_pipeline gate entry.

The pipeline's enrichment stage is a pandas UDF (operators/enrich.py), but
every piece of what it computes over the documents gate corpus is relationally
expressible, so the driver's hard rows/schema/hash gate can cover the flagship
end-to-end:

- **langid** (oracle/langid.py:NgramNBModel.detect_batch): the NB model is a
  flat table — ``table()`` emits (lang, gram, logprob) and ``meta()`` the
  (prior, default) pairs — so add-k NB scoring + softmax top-1 replays as a
  VALUES CTE + join + window. The script-shortcut branch of detect_batch
  (script_langid frac >= 0.5) is UNREACHABLE on this corpus: the documents
  tables contain only Basic-Latin characters (verified; 'latin' maps to no
  language in SCRIPT_TO_LANG), and that branch is pinned separately by
  tests/test_golden_scripts.py.
- **quality stats** (oracle/quality.py:doc_stats): the unicode tokenizer is
  replayed with an RE2 character-class regex (same classes L*/M*/N*/Co +
  apostrophe merge as oracle/tokenize.py:_build_token_re); unicode-category
  symbol/digit counts via RE2 ``\\p{P}\\p{S}`` / ``\\p{Nd}``; the
  repeated-char run stat — a backreference regex in Python, which RE2 cannot
  express — via the gaps-and-islands per-character rewrite.
- **rules + scrub** (operators/quality.py rule_columns, oracle/scrub.py):
  plain threshold CASEs and the RE2-safe regexp_replace chain.

Float discipline: raw NB scores are ~1e4-magnitude sums whose engine-side
summation order differs (numpy reduceat vs SQL SUM), so cross-engine raw
scores agree only to ~1e-11; the gate entry therefore rounds ``lang_conf``
to 6 dp on BOTH sides (same convention as every other float gate column).
Stat/threshold comparisons are exact — each stat is a single division of
the same two integers in both engines — but the NB argmax (ORDER BY raw)
and the conf < 0.5 rule compare UNROUNDED floats: a cross-engine flip
requires two languages' raw scores (or conf and 0.5) within ~1e-11 of each
other, a probabilistic residual accepted and documented here rather than
hidden.
"""

from __future__ import annotations

from language_identification_spark.oracle.quality import (
    GOPHER_STOPWORDS,
    WORD_LENGTH_RULE_LANGS,
    QualityConfig,
)
from language_identification_spark.oracle.scrub import (
    DEFAULT_BADWORDS,
    SCRUB_PATTERNS,
    badword_pattern,
)
from language_identification_spark.oracle.tokenize import (
    CLOSING_PUNCTUATION,
    PY_WHITESPACE,
    SENTENCE_PASSTHROUGH,
    UNICODE_SPACES,
    _APOSTROPHES,
)

# RE2 equivalents of oracle/tokenize.py classifier classes. \p{Co} (private
# use) is part of is_word_char; RE2 supports all general categories.
# The apostrophe merge is the REGEX approximation (oracle/tokenize.py:
# _unicode_tokenize_regex): exact except multi-apostrophe / wait-state
# sequences ("a'b'c"), which the state machine refuses to merge — absent
# from the gate corpus and pinned separately by tokenizer pytests.
_TOK_RE = (
    r"[\p{L}\p{M}\p{N}\p{Co}]+"
    rf"(?:[{_APOSTROPHES}][\p{{L}}\p{{M}}\p{{N}}\p{{Co}}]+)*"
)
_NONSYMBOL_RE = r"[^\p{P}\p{S}]"
_NONDIGIT_RE = r"[^\p{Nd}]"
_BULLET_RE = r"^\s*[-*•●▪]"


def _re2_class(chars) -> str:
    """RE2 character class with \\x{...} escapes (Python re.escape output is
    not RE2-safe for raw control chars)."""
    parts = []
    for ch in sorted(chars):
        if ch.isalnum() and ord(ch) < 128:
            parts.append(ch)
        else:
            parts.append("\\x{%04X}" % ord(ch))
    return "[" + "".join(parts) + "]"


# sentence boundary (oracle/tokenize.py:SENTENCE_BOUNDARY_PATTERN, RE2 form):
# closing punct + passthrough brackets/quotes + the terminating whitespace;
# a sentinel goes after the match, replaying sentence_split exactly
_SENT_BOUNDARY_RE2 = (
    "("
    + _re2_class(CLOSING_PUNCTUATION)
    + _re2_class(SENTENCE_PASSTHROUGH)
    + "*"
    + _re2_class(UNICODE_SPACES)
    + ")"
)

# the str.strip() character set (paragraphs/sentences strip with Python
# semantics, which differ from UNICODE_SPACES on the ZWSP family) — single
# shared derivation, oracle/tokenize.py
_PY_STRIP_CHARS = PY_WHITESPACE

# (rule_name, SQL boolean expr) in ALPHABETICAL rule-name order — the Spark
# side emits array_sort'ed reason names, so building drop_reasons with
# concat_ws over this order reproduces it exactly. ``{gate}`` is the
# WORD_LENGTH_RULE_LANGS membership test (NULL lang -> NULL -> CASE-false,
# matching Spark's null-propagating isin).


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def _rules_sql(config: QualityConfig) -> list[tuple[str, str]]:
    gate_langs = ", ".join(f"'{lg}'" for lg in sorted(WORD_LENGTH_RULE_LANGS))
    gate = f"lang_pred IN ({gate_langs})"
    return [
        ("bullet_frac_high", f"bullet_frac > {config.max_bullet_line_frac!r}"),
        ("digit_frac_high", f"digit_frac > {config.max_digit_frac!r}"),
        ("dup_line_frac_high", f"dup_line_frac > {config.max_dup_line_frac!r}"),
        (
            "ellipsis_frac_high",
            f"ellipsis_frac > {config.max_ellipsis_line_frac!r}",
        ),
        # empty_text handled separately (it inverts the ~empty guard)
        ("lang_conf_low", f"lang_conf_raw < {config.min_lang_conf!r}"),
        (
            "mean_word_len_high",
            f"mean_word_len > {float(config.max_mean_word_len)!r} AND {gate}",
        ),
        (
            "mean_word_len_low",
            f"mean_word_len < {float(config.min_mean_word_len)!r} AND {gate}",
        ),
        (
            "repeated_char_high",
            f"repeated_char_frac > {config.max_repeated_char_frac!r}",
        ),
        (
            "symbol_ratio_high",
            f"symbol_word_ratio > {config.max_symbol_word_ratio!r}",
        ),
        ("too_few_stopwords", f"stopword_count < {config.min_stopwords}"),
        ("too_few_words", f"word_count < {config.min_words}"),
        ("too_many_words", f"word_count > {config.max_words}"),
    ]


def _scrub_sql(col: str) -> str:
    """The oracle/scrub.py chain as nested regexp_replace (RE2-safe by the
    SCRUB_PATTERNS dialect contract), innermost pattern applied first."""
    out = col
    for _name, pattern, repl in SCRUB_PATTERNS:
        out = f"regexp_replace({out}, '{_sql_quote(pattern)}', '{repl}', 'g')"
    bad = "(?i)" + badword_pattern(DEFAULT_BADWORDS)
    return f"regexp_replace({out}, '{_sql_quote(bad)}', '<BAD>', 'g')"


def quality_pipeline_oracle_sql(
    model, config: QualityConfig | None = None
) -> str:
    """Full-row oracle for the quality_pipeline gate entry: columns
    (url, extracted_text, scrubbed_text, lang_pred, lang_conf, ppl, keep,
    drop_reasons) over the ``documents`` view, byte-matching the Spark
    pipeline with lang_conf rounded to 6 dp on both sides."""
    config = config or QualityConfig()
    nb_rows = ", ".join(
        f"('{_sql_quote(lang)}', '{_sql_quote(g)}', {lp!r})"
        for lang, g, lp in model.table()
    )
    meta_rows = ", ".join(
        f"('{_sql_quote(lang)}', {prior!r}, {dflt!r})"
        for lang, prior, dflt in model.meta()
    )
    stop_list = ", ".join(
        f"'{_sql_quote(w)}'" for w in sorted(GOPHER_STOPWORDS)
    )
    rules = _rules_sql(config)
    # full alphabetical order with empty_text spliced in at its sorted
    # position (after ellipsis_frac_high, before lang_conf_low)
    parts = []
    for name, cond in rules:
        if name == "lang_conf_low":
            parts.append("CASE WHEN is_empty THEN 'empty_text' END")
        parts.append(f"CASE WHEN NOT is_empty AND ({cond}) THEN '{name}' END")
    reason_cases = ",\n    ".join(parts)

    return f"""
WITH nb(lang, gram, lp) AS (VALUES {nb_rows}),
nbmeta(lang, prior, dflt) AS (VALUES {meta_rows}),
docs AS (
  SELECT 'doc://' || doc_id AS url, text,
         ' ' || lower(text) || ' ' AS padded
  FROM documents
),
-- NB scoring: char trigrams of the space-padded casefolded text (ASCII corpus
-- => casefold == lower), counted per doc, scored against every model language
grams AS (
  SELECT url, substring(padded, i, 3) AS gram
  FROM docs, unnest(range(1, greatest(length(padded) - 1, 1))) AS t(i)
  WHERE length(padded) >= 3
),
gc AS (SELECT url, gram, count(*) AS c FROM grams GROUP BY url, gram),
raws AS (
  SELECT gc.url, m.lang, m.prior + sum(gc.c * coalesce(nb.lp, m.dflt)) AS raw
  FROM gc
  CROSS JOIN nbmeta m
  LEFT JOIN nb ON nb.lang = m.lang AND nb.gram = gc.gram
  GROUP BY gc.url, m.lang, m.prior
),
soft AS (
  SELECT url, lang, raw,
         exp(raw - max(raw) OVER (PARTITION BY url)) AS e
  FROM raws
),
zs AS (SELECT url, lang, raw, e, sum(e) OVER (PARTITION BY url) AS z FROM soft),
pred AS (
  SELECT url, lang, e / z AS conf
  FROM (SELECT *, row_number() OVER (
          PARTITION BY url ORDER BY raw DESC, lang ASC) AS rn
        FROM zs)
  WHERE rn = 1
),
-- quality stats (oracle/quality.py:doc_stats replayed relationally)
toks AS (
  SELECT url, text,
         regexp_extract_all(text, '{_sql_quote(_TOK_RE)}') AS tokens,
         -- sentence_split full port: paragraphs on newline (stripped), then
         -- a sentinel after every boundary match, split, strip, drop
         -- empties. The sentinel is in-band (SQL has no split-with-capture),
         -- so a text already containing chr(1) fails LOUDLY instead of
         -- mis-splitting (the Python side needs no sentinel at all).
         CASE WHEN contains(coalesce(text, ''), chr(1))
              THEN error('sentinel byte 0x01 in document text')
              ELSE flatten(list_transform(
           string_split(coalesce(text, ''), chr(10)),
           p -> string_split(
                  regexp_replace(trim(p, '{_sql_quote(_PY_STRIP_CHARS)}'),
                                 '{_sql_quote(_SENT_BOUNDARY_RE2)}',
                                 '\\1' || chr(1), 'g'),
                  chr(1)))) END AS segs
  FROM docs
),
stats AS (
  SELECT url, text,
         len(tokens) AS wc,
         length(array_to_string(tokens, '')) AS twc,
         length(regexp_replace(coalesce(text, ''), '{_NONSYMBOL_RE}', '', 'g')) AS n_symbols,
         length(regexp_replace(array_to_string(tokens, ''), '{_NONDIGIT_RE}', '', 'g')) AS n_digits,
         len(list_filter(tokens, w -> list_contains([{stop_list}], lower(w)))) AS stop_count,
         list_filter(list_transform(segs, s -> trim(s, '{_sql_quote(_PY_STRIP_CHARS)}')), s -> s <> '') AS lines
  FROM toks
),
-- repeated-char runs >= 4 (the (.)\\1{{3,}} backreference regex, which RE2
-- cannot express) via gaps-and-islands over per-character rows. Newlines are
-- excluded: Python's '.' never matches \\n, so a blank-line run must not
-- count (dropping the rows cannot merge runs of other chars — their i gaps
-- still break the islands)
chars AS (
  SELECT url, i, substring(text, i, 1) AS ch
  FROM docs, unnest(range(1, length(text) + 1)) AS t(i)
  WHERE substring(text, i, 1) <> chr(10)
),
islands AS (
  SELECT url, count(*) AS run_len
  FROM (SELECT url, ch, i,
               i - row_number() OVER (PARTITION BY url, ch ORDER BY i) AS grp
        FROM chars)
  GROUP BY url, ch, grp
),
rep AS (
  SELECT url, coalesce(sum(run_len) FILTER (WHERE run_len >= 4), 0) AS rep_chars
  FROM islands GROUP BY url
),
full_stats AS (
  SELECT s.url, s.text,
         (s.text IS NULL) AS is_empty,
         s.wc AS word_count,
         CASE WHEN s.wc > 0 THEN s.twc * 1.0 / s.wc ELSE 0.0 END AS mean_word_len,
         CASE WHEN s.wc > 0 THEN s.n_symbols * 1.0 / s.wc ELSE 0.0 END AS symbol_word_ratio,
         CASE WHEN s.twc > 0 THEN s.n_digits * 1.0 / s.twc ELSE 0.0 END AS digit_frac,
         CASE WHEN len(s.lines) > 0
              THEN 1.0 - len(list_distinct(s.lines)) * 1.0 / len(s.lines)
              ELSE 0.0 END AS dup_line_frac,
         CASE WHEN length(s.text) > 0
              THEN coalesce(r.rep_chars, 0) * 1.0 / length(s.text)
              ELSE 0.0 END AS repeated_char_frac,
         s.stop_count AS stopword_count,
         CASE WHEN len(s.lines) > 0
              THEN len(list_filter(s.lines, x -> regexp_matches(x, '{_BULLET_RE}'))) * 1.0 / len(s.lines)
              ELSE 0.0 END AS bullet_frac,
         CASE WHEN len(s.lines) > 0
              THEN len(list_filter(s.lines, x -> x LIKE '%...' OR x LIKE '%…')) * 1.0 / len(s.lines)
              ELSE 0.0 END AS ellipsis_frac
  FROM stats s LEFT JOIN rep r ON r.url = s.url
),
enriched AS (
  SELECT f.*,
         CASE WHEN f.text IS NULL OR f.text = '' THEN NULL
              ELSE p.lang END AS lang_pred,
         CASE WHEN f.text IS NULL OR f.text = '' THEN 0.0
              ELSE p.conf END AS lang_conf_raw
  FROM full_stats f LEFT JOIN pred p ON p.url = f.url
),
ruled AS (
  SELECT url, text, lang_pred, lang_conf_raw,
    concat_ws('|',
    {reason_cases}) AS drop_reasons
  FROM enriched
)
SELECT url,
       text AS extracted_text,
       {_scrub_sql('text')} AS scrubbed_text,
       lang_pred,
       round(lang_conf_raw, 6) AS lang_conf,
       CAST(NULL AS DOUBLE) AS ppl,
       (drop_reasons = '') AS keep,
       drop_reasons
FROM ruled
"""
