"""DuckDB oracle for the word_kn_ppl gate entry (order-2 modified KN).

The word-KN scorer (operators/perplexity.py:train_word_kn_spark +
oracle/kneser_ney.py:WordKNModel) encodes words to one symbol each and runs
the char-KN machinery, so at order 2 the whole model — bigram counts,
continuation unigrams, Chen-Goodman discounts, context stats, interpolated
backoff — is two chained aggregations plus scalar math over the SAME corpus
the documents are scored against. That makes the full train-AND-score loop
expressible as one SQL statement (the round-2 verdict's "order-2 KN backoff
IS expressible as chained CTEs" item): DuckDB re-trains from the documents
view and replays every probability, no model parameters are inlined.

Exactness notes (mirroring oracle/kneser_ney.py line for line):
- min_count=1 and MAX_WORD_VOCAB >> corpus vocab, and each doc is scored
  under its OWN language's model trained on the same rows — so no word is
  ever OOV and every scored context exists; the general coalesce/backoff
  branches are still written out.
- Python's scalar arithmetic is reproduced with the same association order
  (e.g. ``lam/(V+1)`` computes lam first; ``max(c-D,0)/total + lam*p1``),
  and log2/pow hit the same libm. Per-doc log-prob summation order differs
  (SQL SUM vs sequential Python) at ~1e-13 relative — absorbed by the 6-dp
  rounding both sides apply.
- BOS/EOS are chr(2)/chr(3), same as kneser_ney.py padding; whitespace
  tokenization uses the exact Python str.split() whitespace set as an RE2
  class (RE2 \\s is ASCII-only), empties dropped; casefold == lower on the
  ASCII corpus.
- Empty/whitespace-only texts: training still counts their (BOS, EOS)
  bigram (the encoder maps them to the empty symbol string); scoring maps
  NULL/'' to NULL ppl and whitespace-only to +inf, as the entry UDF does.
"""

from __future__ import annotations

from language_identification_spark.oracle.tokenize import (
    py_whitespace_re2_class,
)

# Python str.split()'s whitespace set as an RE2 class (RE2 \s is ASCII-only
# and misses \x0b, \x1c-\x1f, \x85, \xa0 and the Unicode spaces Python
# splits on) — single shared derivation, oracle/tokenize.py
_WS_SPLIT_RE2 = py_whitespace_re2_class() + "+"

# Chen-Goodman discounts with the degenerate fallback and MIN_DISCOUNT
# clamping of oracle/kneser_ney.py:_estimate_discounts. {t} is the
# counts-of-counts CTE alias.
_DISCOUNTS = """
  CASE WHEN {t}.n1 = 0 OR {t}.n2 = 0 THEN 0.5
       ELSE least(greatest(
         1.0 - 2.0*({t}.n1/({t}.n1 + 2.0*{t}.n2))*({t}.n2/{t}.n1),
         0.05), 1.0) END AS d1,
  CASE WHEN {t}.n1 = 0 OR {t}.n2 = 0 THEN 1.0
       WHEN {t}.n3 <> 0 THEN least(greatest(
         2.0 - 3.0*({t}.n1/({t}.n1 + 2.0*{t}.n2))*({t}.n3/{t}.n2),
         0.05), 2.0)
       ELSE 1.0 END AS d2,
  CASE WHEN {t}.n1 = 0 OR {t}.n2 = 0 THEN 1.5
       WHEN {t}.n3 <> 0 AND {t}.n4 <> 0 THEN least(greatest(
         3.0 - 4.0*({t}.n1/({t}.n1 + 2.0*{t}.n2))*({t}.n4/{t}.n3),
         0.05), 3.0)
       ELSE 1.5 END AS d3
"""

# the two unit prefixes share one scoring tail: words (str.split tokens)
# for word_kn_ppl, single casefolded characters for char_kn_ppl — the
# WordKNModel reduction in reverse (one symbol == one unit either way)
_WORD_PREFIX = f"""
WITH docs AS (
  SELECT doc_id, lang, text,
         list_transform(
           list_filter(regexp_split_to_array(coalesce(text, ''), '{_WS_SPLIT_RE2}'),
                       w -> w <> ''),
           w -> lower(w)) AS ws
  FROM documents
),
padded AS (
  SELECT doc_id, lang,
         list_concat(list_concat([chr(2)], ws), [chr(3)]) AS seq,
         len(ws) AS n_units, text
  FROM docs
),
pairs AS (
  SELECT doc_id, lang, i AS pos, seq[i] AS prev, seq[i+1] AS cur
  FROM padded, unnest(range(1, len(seq))) AS t(i)
),"""

# char unit: padded string chr(2)||lower(text)||chr(3); KNModel.padded_chars
# casefolds (== lower on this corpus) and appends ONE BOS at order 2.
# NULL-text docs contribute NO training pairs here: the Spark char trainer's
# _top_grams_udf returns [] for None (unlike the WORD trainer, whose encoder
# maps None to '' and so DOES count a (BOS, EOS) bigram — the word prefix
# mirrors that via coalesce).
_CHAR_PREFIX = """
WITH padded AS (
  SELECT doc_id, lang, text,
         chr(2) || lower(coalesce(text, '')) || chr(3) AS seq,
         length(coalesce(text, '')) AS n_units
  FROM documents
),
pairs AS (
  SELECT doc_id, lang, i AS pos,
         substring(seq, i, 1) AS prev, substring(seq, i + 1, 1) AS cur
  FROM padded, unnest(range(1, length(seq))) AS t(i)
  WHERE text IS NOT NULL
),"""

_SCORING_TAIL = f"""
-- training tables (word unit: every doc incl. empty/NULL contributes a
-- (BOS,EOS) bigram; char unit: NULL-text docs excluded upstream)
c2 AS (SELECT lang, prev, cur, count(*) AS c FROM pairs GROUP BY lang, prev, cur),
c1 AS (SELECT lang, cur, count(*) AS c FROM c2 GROUP BY lang, cur),
cc2 AS (
  SELECT lang,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c = 3) AS n3,
         count(*) FILTER (WHERE c = 4) AS n4
  FROM c2 GROUP BY lang
),
cc1 AS (
  SELECT lang,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c = 3) AS n3,
         count(*) FILTER (WHERE c = 4) AS n4
  FROM c1 GROUP BY lang
),
disc2 AS (SELECT lang, {_DISCOUNTS.format(t='cc2')} FROM cc2),
disc1 AS (SELECT lang, {_DISCOUNTS.format(t='cc1')} FROM cc1),
ctx2 AS (
  SELECT lang, prev, sum(c) AS total,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c2 GROUP BY lang, prev
),
uni AS (
  SELECT lang, sum(c) AS uni_total, count(*) AS vocab,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c1 GROUP BY lang
),
scored AS (
  SELECT p.doc_id, p.pos,
    -- p1(cur): unigram with uniform OOV backoff (kneser_ney.py prob, k=1)
    greatest(coalesce(w1.c, 0) -
             CASE coalesce(w1.c, 0) WHEN 0 THEN 0.0 WHEN 1 THEN k1.d1
                  WHEN 2 THEN k1.d2 ELSE k1.d3 END, 0.0) / u.uni_total
      + ((k1.d1*u.n1 + k1.d2*u.n2 + k1.d3*u.n3p) / u.uni_total)
        / (u.vocab + 1) AS p1,
    x2.total AS ctx_total, x2.n1 AS xn1, x2.n2 AS xn2, x2.n3p AS xn3p,
    coalesce(w2.c, 0) AS c2c,
    k2.d1 AS b1, k2.d2 AS b2, k2.d3 AS b3
  FROM pairs p
  JOIN uni u ON u.lang = p.lang
  JOIN disc1 k1 ON k1.lang = p.lang
  JOIN disc2 k2 ON k2.lang = p.lang
  LEFT JOIN c1 w1 ON w1.lang = p.lang AND w1.cur = p.cur
  LEFT JOIN ctx2 x2 ON x2.lang = p.lang AND x2.prev = p.prev
  LEFT JOIN c2 w2 ON w2.lang = p.lang AND w2.prev = p.prev AND w2.cur = p.cur
),
probs AS (
  SELECT doc_id, pos,
    CASE WHEN ctx_total IS NULL THEN p1
         ELSE greatest(c2c - CASE c2c WHEN 0 THEN 0.0 WHEN 1 THEN b1
                                      WHEN 2 THEN b2 ELSE b3 END, 0.0)
                / ctx_total
              + ((b1*xn1 + b2*xn2 + b3*xn3p) / ctx_total) * p1
         END AS p
  FROM scored
),
doc_ppl AS (
  SELECT doc_id, 2.0 ** (-(sum(log2(p)) / count(*))) AS ppl
  FROM probs GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CASE WHEN d.text IS NULL OR d.text = '' THEN NULL
            WHEN d.n_units = 0 THEN CAST('infinity' AS DOUBLE)
            ELSE round(pp.ppl, 6) END AS {{out_col}}
FROM padded d LEFT JOIN doc_ppl pp ON pp.doc_id = d.doc_id
"""

SQL_WORD_KN_PPL = _WORD_PREFIX + _SCORING_TAIL.format(out_col="word_ppl")
SQL_CHAR_KN_PPL = _CHAR_PREFIX + _SCORING_TAIL.format(out_col="char_ppl")


# ---------------------------------------------------------------------------
# ORDER-3 word gate (round-3 verdict item 6): the same chained-CTE trick
# extends one level — raw trigram counts, continuation bigrams/unigrams
# (distinct left-extensions, modified_kneser_ney.py:644-664), per-order
# Chen-Goodman discounts, and a two-stage interpolated backoff
# p3 = max(c3-D3,0)/ctx3 + lam3 * (max(c2-D2,0)/ctx2 + lam2 * p1),
# with each stage falling back to the next lower order when its context is
# absent (kneser_ney.py:prob recursion). Padding is TWO BOS symbols + EOS,
# so every doc (incl. empty) contributes n_units+1 scored positions.
# ---------------------------------------------------------------------------

_WORD_PREFIX_O3 = f"""
WITH docs AS (
  SELECT doc_id, lang, text,
         list_transform(
           list_filter(regexp_split_to_array(coalesce(text, ''), '{_WS_SPLIT_RE2}'),
                       w -> w <> ''),
           w -> lower(w)) AS ws
  FROM documents
),
padded AS (
  SELECT doc_id, lang,
         list_concat(list_concat([chr(2), chr(2)], ws), [chr(3)]) AS seq,
         len(ws) AS n_units, text
  FROM docs
),
triples AS (
  SELECT doc_id, lang, i AS pos,
         seq[i] AS p2, seq[i+1] AS p1, seq[i+2] AS cur
  FROM padded, unnest(range(1, len(seq) - 1)) AS t(i)
),"""

_SCORING_TAIL_O3 = f"""
c3 AS (SELECT lang, p2, p1, cur, count(*) AS c
       FROM triples GROUP BY lang, p2, p1, cur),
c2 AS (SELECT lang, p1, cur, count(*) AS c FROM c3 GROUP BY lang, p1, cur),
c1 AS (SELECT lang, cur, count(*) AS c FROM c2 GROUP BY lang, cur),
cc3 AS (
  SELECT lang,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c = 3) AS n3,
         count(*) FILTER (WHERE c = 4) AS n4
  FROM c3 GROUP BY lang
),
cc2 AS (
  SELECT lang,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c = 3) AS n3,
         count(*) FILTER (WHERE c = 4) AS n4
  FROM c2 GROUP BY lang
),
cc1 AS (
  SELECT lang,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c = 3) AS n3,
         count(*) FILTER (WHERE c = 4) AS n4
  FROM c1 GROUP BY lang
),
disc3 AS (SELECT lang, {_DISCOUNTS.format(t='cc3')} FROM cc3),
disc2 AS (SELECT lang, {_DISCOUNTS.format(t='cc2')} FROM cc2),
disc1 AS (SELECT lang, {_DISCOUNTS.format(t='cc1')} FROM cc1),
ctx3 AS (
  SELECT lang, p2, p1, sum(c) AS total,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c3 GROUP BY lang, p2, p1
),
ctx2 AS (
  SELECT lang, p1, sum(c) AS total,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c2 GROUP BY lang, p1
),
uni AS (
  SELECT lang, sum(c) AS uni_total, count(*) AS vocab,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c1 GROUP BY lang
),
scored AS (
  SELECT t.doc_id, t.pos,
    greatest(coalesce(w1.c, 0) -
             CASE coalesce(w1.c, 0) WHEN 0 THEN 0.0 WHEN 1 THEN k1.d1
                  WHEN 2 THEN k1.d2 ELSE k1.d3 END, 0.0) / u.uni_total
      + ((k1.d1*u.n1 + k1.d2*u.n2 + k1.d3*u.n3p) / u.uni_total)
        / (u.vocab + 1) AS p1v,
    x2.total AS t2, x2.n1 AS x2n1, x2.n2 AS x2n2, x2.n3p AS x2n3p,
    coalesce(w2.c, 0) AS c2c, k2.d1 AS e1, k2.d2 AS e2, k2.d3 AS e3,
    x3.total AS t3, x3.n1 AS x3n1, x3.n2 AS x3n2, x3.n3p AS x3n3p,
    coalesce(w3.c, 0) AS c3c, k3.d1 AS f1, k3.d2 AS f2, k3.d3 AS f3
  FROM triples t
  JOIN uni u ON u.lang = t.lang
  JOIN disc1 k1 ON k1.lang = t.lang
  JOIN disc2 k2 ON k2.lang = t.lang
  JOIN disc3 k3 ON k3.lang = t.lang
  LEFT JOIN c1 w1 ON w1.lang = t.lang AND w1.cur = t.cur
  LEFT JOIN ctx2 x2 ON x2.lang = t.lang AND x2.p1 = t.p1
  LEFT JOIN c2 w2 ON w2.lang = t.lang AND w2.p1 = t.p1 AND w2.cur = t.cur
  LEFT JOIN ctx3 x3 ON x3.lang = t.lang AND x3.p2 = t.p2 AND x3.p1 = t.p1
  LEFT JOIN c3 w3 ON w3.lang = t.lang AND w3.p2 = t.p2 AND w3.p1 = t.p1
                 AND w3.cur = t.cur
),
probs AS (
  SELECT doc_id, pos,
    CASE WHEN t3 IS NULL THEN p2v
         ELSE greatest(c3c - CASE c3c WHEN 0 THEN 0.0 WHEN 1 THEN f1
                                      WHEN 2 THEN f2 ELSE f3 END, 0.0)
                / t3
              + ((f1*x3n1 + f2*x3n2 + f3*x3n3p) / t3) * p2v
         END AS p
  FROM (
    SELECT *,
      CASE WHEN t2 IS NULL THEN p1v
           ELSE greatest(c2c - CASE c2c WHEN 0 THEN 0.0 WHEN 1 THEN e1
                                        WHEN 2 THEN e2 ELSE e3 END, 0.0)
                  / t2
                + ((e1*x2n1 + e2*x2n2 + e3*x2n3p) / t2) * p1v
           END AS p2v
    FROM scored)
),
doc_ppl AS (
  SELECT doc_id, 2.0 ** (-(sum(log2(p)) / count(*))) AS ppl
  FROM probs GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CASE WHEN d.text IS NULL OR d.text = '' THEN NULL
            WHEN d.n_units = 0 THEN CAST('infinity' AS DOUBLE)
            ELSE round(pp.ppl, 6) END AS word_ppl3
FROM padded d LEFT JOIN doc_ppl pp ON pp.doc_id = d.doc_id
"""

SQL_WORD_KN_PPL_O3 = _WORD_PREFIX_O3 + _SCORING_TAIL_O3


# ---------------------------------------------------------------------------
# ORDER-N generator (round-5, VERDICT r4 #6): the chained-CTE construction
# is mechanical at every order — raw N-gram counts, continuation rollups
# (each level's count over the distinct grams of the level above IS the
# distinct-left-extension count, modified_kneser_ney.py:644-664), per-order
# Chen-Goodman discounts, context stats, and an (N-1)-stage interpolated
# backoff where stage K falls back to stage K-1 whenever its context is
# unseen (kneser_ney.py:prob recursion). ``word_kn_ppl_sql(order)``
# generates it for ANY order; generating orders 2 and 3 reproduces the
# hand-written oracles above value-for-value (pinned by pytest), and the
# word_kn_ppl_o4 gate runs the generated order-4 SQL against the Spark
# trainer/scorer. Expression shapes (association order, CASE discount
# ladders) are copied from the hand-written forms so libm/fp behavior is
# identical.
# ---------------------------------------------------------------------------


def word_kn_ppl_sql(order: int, out_col: str | None = None) -> str:
    """Generate the full train-AND-score chained-CTE oracle for word-level
    modified Kneser-Ney at ``order`` (>= 2). Same exactness contract as
    the hand-written order-2/3 forms (module docstring)."""
    if order < 2:
        raise ValueError("KN backoff needs order >= 2")
    n = order
    out_col = out_col or f"word_ppl{n}"
    # context column names, nearest-first: p1 is the adjacent predecessor
    ctx_cols = [f"p{k}" for k in range(1, n)]  # p1..p{n-1}

    # tuples CTE: seq padded with (n-1) BOS + EOS; window of n symbols
    sel = ", ".join(
        f"seq[i+{j}] AS {name}"
        for j, name in enumerate([f"p{n - 1 - j}" for j in range(n - 1)])
    )
    rng_hi = "len(seq)" if n == 2 else f"len(seq) - {n - 2}"
    prefix = f"""
WITH docs AS (
  SELECT doc_id, lang, text,
         list_transform(
           list_filter(regexp_split_to_array(coalesce(text, ''), '{_WS_SPLIT_RE2}'),
                       w -> w <> ''),
           w -> lower(w)) AS ws
  FROM documents
),
padded AS (
  SELECT doc_id, lang,
         list_concat(list_concat([{", ".join(["chr(2)"] * (n - 1))}], ws), [chr(3)]) AS seq,
         len(ws) AS n_units, text
  FROM docs
),
tuples AS (
  SELECT doc_id, lang, i AS pos,
         {sel}, seq[i+{n - 1}] AS cur
  FROM padded, unnest(range(1, {rng_hi})) AS t(i)
),"""

    parts: list[str] = []
    # count tables cN..c1 (continuation rollups below the top)
    top_keys = ", ".join(ctx_cols[::-1] + ["cur"])  # p{n-1}..p1, cur
    parts.append(
        f"c{n} AS (SELECT lang, {top_keys}, count(*) AS c\n"
        f"       FROM tuples GROUP BY lang, {top_keys})"
    )
    for k in range(n - 1, 0, -1):
        keys = ", ".join([f"p{j}" for j in range(k - 1, 0, -1)] + ["cur"])
        parts.append(
            f"c{k} AS (SELECT lang, {keys}, count(*) AS c "
            f"FROM c{k + 1} GROUP BY lang, {keys})"
        )
    # counts-of-counts + discounts per order
    for k in range(n, 0, -1):
        parts.append(
            f"""cc{k} AS (
  SELECT lang,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c = 3) AS n3,
         count(*) FILTER (WHERE c = 4) AS n4
  FROM c{k} GROUP BY lang
)"""
        )
    for k in range(n, 0, -1):
        parts.append(
            f"disc{k} AS (SELECT lang, {_DISCOUNTS.format(t=f'cc{k}')} FROM cc{k})"
        )
    # context stats per order >= 2; unigram totals
    for k in range(n, 1, -1):
        keys = ", ".join(f"p{j}" for j in range(k - 1, 0, -1))
        parts.append(
            f"""ctx{k} AS (
  SELECT lang, {keys}, sum(c) AS total,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c{k} GROUP BY lang, {keys}
)"""
        )
    parts.append(
        """uni AS (
  SELECT lang, sum(c) AS uni_total, count(*) AS vocab,
         count(*) FILTER (WHERE c = 1) AS n1,
         count(*) FILTER (WHERE c = 2) AS n2,
         count(*) FILTER (WHERE c >= 3) AS n3p
  FROM c1 GROUP BY lang
)"""
    )
    # scored: every per-position quantity in one wide join
    sel_cols = [
        """greatest(coalesce(w1.c, 0) -
             CASE coalesce(w1.c, 0) WHEN 0 THEN 0.0 WHEN 1 THEN k1.d1
                  WHEN 2 THEN k1.d2 ELSE k1.d3 END, 0.0) / u.uni_total
      + ((k1.d1*u.n1 + k1.d2*u.n2 + k1.d3*u.n3p) / u.uni_total)
        / (u.vocab + 1) AS p1v"""
    ]
    joins = [
        "JOIN uni u ON u.lang = t.lang",
        "JOIN disc1 k1 ON k1.lang = t.lang",
        "LEFT JOIN c1 w1 ON w1.lang = t.lang AND w1.cur = t.cur",
    ]
    for k in range(2, n + 1):
        keys = [f"p{j}" for j in range(k - 1, 0, -1)]
        ctx_on = " AND ".join(f"x{k}.{p} = t.{p}" for p in keys)
        w_on = " AND ".join(f"w{k}.{p} = t.{p}" for p in keys)
        sel_cols.append(
            f"x{k}.total AS t{k}, x{k}.n1 AS x{k}n1, x{k}.n2 AS x{k}n2, "
            f"x{k}.n3p AS x{k}n3p,\n    coalesce(w{k}.c, 0) AS c{k}c, "
            f"k{k}.d1 AS d{k}_1, k{k}.d2 AS d{k}_2, k{k}.d3 AS d{k}_3"
        )
        joins.append(f"JOIN disc{k} k{k} ON k{k}.lang = t.lang")
        joins.append(f"LEFT JOIN ctx{k} x{k} ON x{k}.lang = t.lang AND {ctx_on}")
        joins.append(
            f"LEFT JOIN c{k} w{k} ON w{k}.lang = t.lang AND {w_on} "
            f"AND w{k}.cur = t.cur"
        )
    parts.append(
        "scored AS (\n  SELECT t.doc_id, t.pos,\n    "
        + ",\n    ".join(sel_cols)
        + "\n  FROM tuples t\n  "
        + "\n  ".join(joins)
        + "\n)"
    )
    # probs: nested (K-1)-stage interpolation, innermost first — identical
    # CASE shape to the hand-written order-3 form
    inner = "scored"
    for k in range(2, n):
        inner = f"""(
    SELECT *,
      CASE WHEN t{k} IS NULL THEN p{k - 1}v
           ELSE greatest(c{k}c - CASE c{k}c WHEN 0 THEN 0.0 WHEN 1 THEN d{k}_1
                                        WHEN 2 THEN d{k}_2 ELSE d{k}_3 END, 0.0)
                  / t{k}
                + ((d{k}_1*x{k}n1 + d{k}_2*x{k}n2 + d{k}_3*x{k}n3p) / t{k}) * p{k - 1}v
           END AS p{k}v
    FROM {inner})"""
    parts.append(
        f"""probs AS (
  SELECT doc_id, pos,
    CASE WHEN t{n} IS NULL THEN p{n - 1}v
         ELSE greatest(c{n}c - CASE c{n}c WHEN 0 THEN 0.0 WHEN 1 THEN d{n}_1
                                      WHEN 2 THEN d{n}_2 ELSE d{n}_3 END, 0.0)
                / t{n}
              + ((d{n}_1*x{n}n1 + d{n}_2*x{n}n2 + d{n}_3*x{n}n3p) / t{n}) * p{n - 1}v
         END AS p
  FROM {inner}
)"""
    )
    parts.append(
        """doc_ppl AS (
  SELECT doc_id, 2.0 ** (-(sum(log2(p)) / count(*))) AS ppl
  FROM probs GROUP BY doc_id
)"""
    )
    tail = f"""
SELECT d.doc_id, d.lang,
       CASE WHEN d.text IS NULL OR d.text = '' THEN NULL
            WHEN d.n_units = 0 THEN CAST('infinity' AS DOUBLE)
            ELSE round(pp.ppl, 6) END AS {out_col}
FROM padded d LEFT JOIN doc_ppl pp ON pp.doc_id = d.doc_id
"""
    return prefix + "\n" + ",\n".join(parts) + tail


SQL_WORD_KN_PPL_O4 = word_kn_ppl_sql(4)
