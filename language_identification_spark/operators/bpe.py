"""Distributed BPE tokenizer training (Sennrich et al. 2016, arXiv
1508.07909) — the tokenizer-construction half of a training-data pipeline,
built the way the corpus statistics demand:

- The corpus crosses the wire ONCE: a (word, count) aggregation (the same
  shape as the reference's GDELT word-count notebooks,
  datasets/common_words.ipynb cell 2). Everything after that runs on the
  bounded top-V word-frequency vocabulary, so per-round cost is independent
  of corpus size — exactly why production BPE trainers operate on the
  word-count table rather than raw text.
- Each merge round is one |V|-row pair-count aggregation plus an argmax
  picked with orderBy+limit(1) (TakeOrderedAndProject — never a global
  ranking window), then a merge application as a NATIVE ``F.aggregate``
  fold over the symbol array. Zero Python in any per-row path.
- Rounds are inherently sequential (merge r+1's pair statistics depend on
  merge r having been applied); each round's vocabulary is eagerly
  localCheckpoint-ed so lineage stays flat across rounds (the same
  truncate-per-round discipline as the connected-components loop,
  queries.py dedup_clusters). The checkpoint is |V|-row — bounded.
- The learned merge list itself is n_merges rows — bounded driver data,
  like the KN discount table (operators/perplexity.py).

Greedy semantics: BPE applies a merge left-to-right, non-overlapping
("a a a a" with merge (a,a) -> "aa aa", the odd trailing symbol survives).
The native fold reproduces this exactly: walk the symbol array, and when
the accumulated tail equals the merge's left and the incoming symbol equals
its right, replace the tail with the concatenation. Consecutive overlapping
match positions can only occur when left == right (a run of one symbol), in
which case greedy selects every second position of the run — the "run
parity" formulation the DuckDB oracle replays relationally
(queries.py:_sql_bpe_cte): match positions -> consecutive-run grouping ->
(i - run_start) % 2 = 0 filter -> rebuild. Two maximally different
formulations, one hash.

Tokenization contract (both engines, byte-identical): words are
``[a-z]+`` runs of the lowercased text; a word's initial symbol sequence is
its characters followed by the end-of-word marker ``</w>`` (Sennrich's
convention, so merges never cross word boundaries and suffixes like
"e s t </w>" can fuse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_PATTERN = "[a-z]+"
END_OF_WORD = "</w>"


def word_vocab(
    docs: DataFrame, text_col: str = "text", top_v: int = 20000
) -> DataFrame:
    """(word, cnt) table: the ONE corpus-scale exchange. top_v bounds every
    subsequent round (deterministic cap: count desc, word asc — the same
    limit-first tie-break discipline as the battery's other top-K cuts)."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(top_v)


def init_symbols(word_col: Column) -> Column:
    """Space-joined characters + ' </w>' — the round-0 symbol string."""
    return F.concat(
        F.array_join(
            F.regexp_extract_all(word_col, F.lit("."), F.lit(0)), " "
        ),
        F.lit(" " + END_OF_WORD),
    )


def pair_counts(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Adjacent-pair frequencies weighted by word count: (lft, rgt, c).
    A |V|-row explode + hash aggregate — map-side combined, tiny."""
    s = F.split(F.col(syms_col), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("lft"),
            F.element_at(s, i + 1).alias("rgt"),
        ),
    )
    return (
        vocab.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge(syms_col: Column, lft: str, rgt: str) -> Column:
    """Apply ONE merge greedily left-to-right as a native fold — the
    Sennrich replacement pass with zero Python. When the accumulator's
    last symbol is ``lft`` and the incoming symbol is ``rgt``, the pair
    fuses; a just-fused symbol participates as the new tail (which matters
    only for runs, where it correctly BLOCKS re-merging — greedy
    non-overlap)."""
    s = F.split(syms_col, " ")
    merged = F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lft))
            & (x == F.lit(rgt)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(lft + rgt)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.array_join(merged, " ")


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    top_v: int = 20000,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list [(rank, lft, rgt, pair_count)] (bounded driver data — one
    row per round) and the final symbolized vocabulary DataFrame."""
    vocab = (
        word_vocab(docs, text_col, top_v)
        .withColumn("syms", init_symbols(F.col("word")))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("c"), F.asc("lft"), F.asc("rgt"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b.lft, b.rgt, int(b.c)))
        vocab = vocab.withColumn(
            "syms", apply_merge(F.col("syms"), b.lft, b.rgt)
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility by language — the subword-token cost each
    language pays under a learned merge list (the multilingual-fairness
    audit run on every production tokenizer: a language whose words
    fragment into many subwords pays more sequence length per byte of
    content). Exact integer accounting: per language, total word
    occurrences and total subword tokens (occurrence-weighted); the
    fertility ratio is ONE exactly-rounded IEEE division of those two
    integers, so it hash-matches cross-engine without quantization.

    Scale shape: one (lang, word) corpus aggregation; merges applied once
    per DISTINCT word (word-dim table) and joined back broadcast-style —
    the corpus text never crosses the wire twice."""
    lwords = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
                )
            ).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = init_symbols(F.col("word"))
    for _rank, lft, rgt, _c in merges:
        syms = apply_merge(syms, lft, rgt)
    seg = (
        lwords.select("word")
        .distinct()
        .withColumn("n_tok", F.size(F.split(syms, " ")))
    )
    joined = lwords.join(seg, "word")
    return joined.groupBy("lang").agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_tok")).alias("n_tokens"),
        F.round(
            F.sum(F.col("cnt") * F.col("n_tok")).cast("double")
            / F.sum("cnt").cast("double"),
            6,
        ).alias("fertility"),
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list and return per-token
    totals (token, n_words, n_occurrences). A word's tokenization depends
    only on the word, so the merges are applied ONCE per distinct word (a
    word-dim table, the vocab_coverage scale shape) and occurrence counts
    ride the same aggregation — the corpus never crosses the wire twice."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    syms = init_symbols(F.col("word"))
    for _rank, lft, rgt, _c in merges:
        syms = apply_merge(syms, lft, rgt)
    tokenized = counts.withColumn("syms", syms)
    return (
        tokenized.select(
            F.explode(F.split(F.col("syms"), " ")).alias("token"),
            F.col("cnt"),
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("cnt").alias("n_occurrences"),
        )
    )
